"""Snapshot resume: high-watermark positions + tuple-keyset predicates.

Reference: every snapshot row carries a ``Position::RdbSnapshot {schema, tb,
order_key}`` checkpoint (dt-common/src/meta/position.rs:13-64); on restart the
extractor resumes with a tuple-keyset predicate ``(c1,c2) > (?,?)`` appended
to the scan SQL — never OFFSET (dt-connector/src/extractor/
rdb_snapshot_extract_statement.rs:242-308; resumer
dt-connector/src/extractor/resumer/, docs/en/snapshot/resume.md:1-30). Table
completion is recorded as ``RdbSnapshotFinished``.

Spark-native: the watermark lives in a small JSON store (a real deployment
uses a metastore/Delta table); resume = the same keyset predicate pushed into
the scan via ``df.filter`` — Catalyst turns the row-value comparison into
parquet/JDBC pushdown, so a resumed job re-reads only the remaining key range
(partition pruning + predicate pushdown do the skipping, no driver loop).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame


def _literal(v) -> str:
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return str(v)


def keyset_predicate(order_cols: list[str], position: tuple | list, strict: bool = True) -> str:
    """Row-value seek predicate ``(c1,c2,...) > (v1,v2,...)`` expanded to the
    portable OR-of-ANDs form (works on every engine, matches the reference's
    tuple predicates):

    (c1 > v1) OR (c1 = v1 AND c2 > v2) OR (c1 = v1 AND c2 = v2 AND c3 > v3)
    """
    assert len(order_cols) == len(position) and order_cols
    terms = []
    for i, col in enumerate(order_cols):
        eqs = [f"{order_cols[j]} = {_literal(position[j])}" for j in range(i)]
        # intermediate levels use strict > (equality falls through to the next
        # term); only the last column honors strict vs >=
        op = ">" if i < len(order_cols) - 1 else (">" if strict else ">=")
        terms.append(" AND ".join(eqs + [f"{col} {op} {_literal(position[i])}"]))
    return "(" + ") OR (".join(terms) + ")"


class SnapshotResumeStore:
    """Per-table snapshot watermarks (order-key position / finished flag).

    JSON-file backed here; the schema matches what a metastore table would
    hold: {schema.tb: {"position": [...], "finished": bool}}.
    """

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def _read(self) -> dict:
        if not os.path.exists(self.path):
            return {}
        with open(self.path) as f:
            return json.load(f)

    def position(self, schema: str, tb: str):
        e = self._read().get(f"{schema}.{tb}")
        return tuple(e["position"]) if e and e.get("position") else None

    def finished(self, schema: str, tb: str) -> bool:
        e = self._read().get(f"{schema}.{tb}")
        return bool(e and e.get("finished"))

    def save(self, schema: str, tb: str, position: tuple | list | None, finished: bool = False) -> None:
        data = self._read()
        data[f"{schema}.{tb}"] = {"position": list(position) if position else None, "finished": finished}
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(data, f)
        os.replace(tmp, self.path)


def resume_scan(df: DataFrame, order_cols: list[str], store: SnapshotResumeStore, schema: str, tb: str) -> DataFrame:
    """Apply the stored watermark: full scan on first run, keyset-filtered
    scan on resume, empty on finished tables."""
    if store.finished(schema, tb):
        return df.limit(0)
    pos = store.position(schema, tb)
    if pos is None:
        return df
    return df.filter(keyset_predicate(order_cols, pos))
