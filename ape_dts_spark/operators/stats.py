"""Table/key statistics for chunk planning and cost estimates.

Reference: the snapshot extractor estimates row counts and key ranges from
information_schema + index dives before splitting a table into chunks
(dt-connector/src/extractor/mysql/mysql_snapshot_extractor.rs:1187-1275).
Spark-side, the same numbers come from one aggregate scan with map-side
partials (count/min/max fold per partition; COUNT(DISTINCT) is the only
shuffle) — and Catalyst's CBO/AQE already consume file-level statistics
internally, so this operator exists to surface planner-grade numbers to the
chunk splitter (sources/snapshot.chunk_bounds reuses min/max) and to task
reports.

At 100 TB prefer ``approx_count_distinct`` (HyperLogLog, no shuffle) for the
NDV column — exact distinct is kept as the default because it is
engine-portable for the correctness oracle; both are single-expression swaps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_stats(df: DataFrame, key_col: str, approx_ndv: bool = False) -> DataFrame:
    """(n_rows, k_min, k_max, n_distinct, n_nulls) for a candidate chunking
    key — everything the splitter's cost model needs in one scan."""
    ndv = (
        F.approx_count_distinct(key_col) if approx_ndv else F.count_distinct(F.col(key_col))
    ).alias("n_distinct")
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min(key_col).alias("k_min"),
        F.max(key_col).alias("k_max"),
        ndv,
        F.sum(F.when(F.col(key_col).isNull(), 1).otherwise(0)).cast("long").alias("n_nulls"),
    )
