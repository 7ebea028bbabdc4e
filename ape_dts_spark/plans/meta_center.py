"""DDL meta center — the shared schema-history store of the reference's
``[metacenter]`` config section (dt-common/src/config/meta_center_config.rs;
task_config.rs:1444 loads type=dbengine + url; suite
dt-tests/tests/mysql_to_mysql/cdc/ddl_meta_center_test): tasks record every
applied DDL into a central store so any consumer can reconstruct a table's
schema AS OF a replication position, instead of each pipeline privately
mutating its own view.

Spark mapping: the store is an append-only JSON-lines history (driver-side
metadata, like model/position.PositionLog — DDL volume is human-scale, not
data-scale) keyed by (schema, tb); ``schema_at`` replays recorded column
DDLs over the registered base schema up to a position. CdcPipeline appends
each applied split part when a center is attached, so the center sees
exactly the per-(schema, table)-routed statements the DDL barrier applied
(plans/ddl_parse.split_ddl parity with the reference's split_to_multi).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from ape_dts_spark.plans.ddl_parse import split_ddl


@dataclass
class MetaCenter:
    path: str
    _rows: list | None = field(default=None, repr=False)

    def _load(self) -> list:
        if self._rows is None:
            self._rows = []
            if os.path.exists(self.path):
                with open(self.path) as f:
                    self._rows = [json.loads(line) for line in f if line.strip()]
        return self._rows

    def _append(self, row: dict) -> None:
        self._load().append(row)
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        with open(self.path, "a") as f:
            f.write(json.dumps(row) + "\n")

    # -- writes -------------------------------------------------------------

    def register_base(self, schema: str, tb: str, columns: list, seq: int = 0) -> None:
        """Record a table's starting column list: [(name, type), ...]."""
        self._append({"kind": "base", "schema": schema, "tb": tb,
                      "columns": [list(c) for c in columns], "seq": seq})

    def record_ddl(self, schema: str, tb: str | None, ddl: str, seq: int) -> list:
        """Record one DDL statement (split per target like the reference's
        split_to_multi); returns the recorded parts."""
        parts = []
        for st in split_ddl(ddl):
            a = st.args
            column = new_name = col_type = None
            if st.kind in ("add_column", "modify_column"):
                column, col_type = (a + (None, None))[:2]
            elif st.kind == "drop_column":
                column = a[0] if a else None
            elif st.kind == "rename_column":
                column, new_name = (a + (None, None))[:2]
            elif st.kind == "rename_table":
                new_name = a[1] if len(a) > 1 else None
            row = {
                "kind": st.kind, "schema": st.schema or schema,
                "tb": st.table if st.table is not None else tb,
                "ddl": ddl, "seq": seq,
                "column": column, "new_name": new_name, "col_type": col_type,
            }
            self._append(row)
            parts.append(row)
        return parts

    # -- reads --------------------------------------------------------------

    def history(self, schema: str, tb: str) -> list:
        """All recorded rows for a table (renames followed forward: rows
        recorded under a table's former name are included)."""
        names = {tb}
        out = []
        for r in self._load():
            if r["schema"] != schema:
                continue
            if r["tb"] in names:
                out.append(r)
                if r["kind"] == "rename_table" and r.get("new_name"):
                    names.add(r["new_name"])
        return out

    def schema_at(self, schema: str, tb: str, seq: int | None = None) -> list | None:
        """Reconstruct the column list [(name, type), ...] as of ``seq``
        (None = latest). Returns None when the table is dropped at that
        position or never registered."""
        cols: list | None = None
        for r in self.history(schema, tb):
            if seq is not None and r["seq"] > seq:
                break
            k = r["kind"]
            if k == "base":
                cols = [tuple(c) for c in r["columns"]]
            elif cols is None:
                continue
            elif k == "add_column":
                cols = cols + [(r["column"], r.get("col_type") or "")]
            elif k == "drop_column":
                cols = [c for c in cols if c[0] != r["column"]]
            elif k in ("rename_column", "change_column"):
                cols = [
                    ((r.get("new_name") or c[0]), (r.get("col_type") or c[1]))
                    if c[0] == r["column"] else c
                    for c in cols
                ]
            elif k == "modify_column":
                cols = [
                    (c[0], r.get("col_type") or c[1]) if c[0] == r["column"] else c
                    for c in cols
                ]
            elif k == "drop_table":
                cols = None
        return cols
