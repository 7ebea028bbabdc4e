"""Append-only upsert emulation for OLAP sinks (ClickHouse / StarRocks / Doris).

Reference: the ClickHouse sinker appends rows into
``ReplacingMergeTree(_ape_dts_timestamp)`` with an ``_ape_dts_is_deleted`` sign
column (dt-connector/src/sinker/clickhouse/clickhouse_sinker.rs:18-19,
docs/en/tutorial/mysql_to_clickhouse.md:73-76); StarRocks/Doris use the same
soft-delete columns via Stream Load headers
(starrocks_sinker.rs:28-29,149-153).

Spark-native: a pure projection change-events -> append rows. Deletes become
``is_deleted=1`` rows carrying the before-image key; inserts/updates carry the
after image. The target's merge-on-read (ReplacingMergeTree / primary-key
model) resolves the latest version by ``_ape_dts_timestamp`` = our ``seq``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ape_dts_spark.model.changes import ROW_TYPE_DELETE

IS_DELETED_COL = "_ape_dts_is_deleted"
VERSION_COL = "_ape_dts_timestamp"


def to_soft_delete_rows(df: DataFrame) -> DataFrame:
    """Change events -> append-only rows with soft-delete + version columns.
    (selectExpr-built: this is half the bench headline, where per-Column
    driver round trips were a measurable slice of each attempt.)"""
    return df.selectExpr(
        "schema",
        "tb",
        f"CASE WHEN row_type = '{ROW_TYPE_DELETE}' THEN before ELSE after END AS row",
        f"CASE WHEN row_type = '{ROW_TYPE_DELETE}' THEN 1 ELSE 0 END AS {IS_DELETED_COL}",
        f"seq AS {VERSION_COL}",
    ).select("schema", "tb", "row.*", IS_DELETED_COL, VERSION_COL)


def resolve_latest(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Merge-on-read emulation: latest non-deleted row per key (what the OLAP
    engine's ReplacingMergeTree final-merge computes). Uses max_by for map-side
    partial aggregation — one shuffle of ~|keys| rows."""
    value_cols = [c for c in df.columns if c not in key_cols]
    latest = df.groupBy(*key_cols).agg(
        F.expr(f"max_by(struct({', '.join(value_cols)}), {VERSION_COL})").alias("_v")
    )
    out = latest.select(*key_cols, "_v.*")
    return out.filter(f"{IS_DELETED_COL} = 0").drop(IS_DELETED_COL, VERSION_COL)
