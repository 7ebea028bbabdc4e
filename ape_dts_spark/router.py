"""Schema/table/column renaming + topic routing.

Re-implements the reference's ``RdbRouter`` (dt-connector/src/rdb_router.rs:24-122):
``schema_map`` (src_schema:dst_schema), ``tb_map`` (src.tb:dst.tb),
``col_map`` (per-table column renames), ``topic_map`` (per-table Kafka topic).
Reverse maps are auto-derived for two-way sync (rdb_router.rs:124-162).

In Spark the column rename is a zero-cost projection (Catalyst aliasing); table
routing resolves the *target table name*, not a data transform.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def _parse_map(spec: str) -> dict[str, str]:
    """``a:b,c:d`` -> {a: b, c: d}"""
    out: dict[str, str] = {}
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        src, dst = part.split(":", 1)
        out[src.strip()] = dst.strip()
    return out


@dataclass
class RdbRouter:
    schema_map: str = ""  # "src_db:dst_db,..."
    tb_map: str = ""  # "src_db.src_tb:dst_db.dst_tb,..."
    col_map: str = ""  # json: [{"db":..,"tb":..,"col_map":{src:dst}}]
    topic_map: str = ""  # "*.*:default_topic,db.tb:topic"
    _reverse: bool = field(default=False)

    def __post_init__(self) -> None:
        import json

        self._schema_map = _parse_map(self.schema_map)
        self._tb_map = {}
        for src, dst in _parse_map(self.tb_map).items():
            self._tb_map[tuple(src.split(".", 1))] = tuple(dst.split(".", 1))
        self._col_map: dict[tuple[str, str], dict[str, str]] = {}
        if self.col_map:
            for item in json.loads(self.col_map):
                self._col_map[(item["db"], item["tb"])] = dict(item["col_map"])
        self._topic_map = {}
        for src, topic in _parse_map(self.topic_map).items():
            self._topic_map[tuple(src.split(".", 1))] = topic

    # -- name resolution (plan-time) ---------------------------------------
    def route_table(self, schema: str, tb: str) -> tuple[str, str]:
        """Target (schema, tb) for a source table (rdb_router.rs:60-76)."""
        if (schema, tb) in self._tb_map:
            return self._tb_map[(schema, tb)]
        if schema in self._schema_map:
            return (self._schema_map[schema], tb)
        return (schema, tb)

    def route_topic(self, schema: str, tb: str, default: str | None = None) -> str | None:
        """Kafka topic for a table; '*.*' entry is the fallback (rdb_router.rs:96-98)."""
        if (schema, tb) in self._topic_map:
            return self._topic_map[(schema, tb)]
        if (schema, "*") in self._topic_map:
            return self._topic_map[(schema, "*")]
        if ("*", "*") in self._topic_map:
            return self._topic_map[("*", "*")]
        return default

    def col_renames(self, schema: str, tb: str) -> dict[str, str]:
        return self._col_map.get((schema, tb), {})

    # -- data transform -----------------------------------------------------
    def route_df(self, df: DataFrame, schema: str, tb: str) -> DataFrame:
        """Apply column renames to a row DataFrame (rdb_router.rs:247-260).

        Pure projection — Catalyst collapses it into adjacent stages; no copy.
        """
        renames = self.col_renames(schema, tb)
        if not renames:
            return df
        return df.withColumnsRenamed(renames)

    def reverse(self) -> "RdbRouter":
        """Derived reverse router for two-way sync (rdb_router.rs:124-162)."""
        inv_schema = ",".join(f"{v}:{k}" for k, v in self._schema_map.items())
        inv_tb = ",".join(f"{v[0]}.{v[1]}:{k[0]}.{k[1]}" for k, v in self._tb_map.items())
        import json

        inv_cols = [
            {"db": self.route_table(db, tb)[0], "tb": self.route_table(db, tb)[1], "col_map": {v: k for k, v in m.items()}}
            for (db, tb), m in self._col_map.items()
        ]
        return RdbRouter(
            schema_map=inv_schema,
            tb_map=inv_tb,
            col_map=json.dumps(inv_cols) if inv_cols else "",
            topic_map=self.topic_map,
        )
