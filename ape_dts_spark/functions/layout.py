"""Data-layout operators: Z-order (Morton) clustering for scan pruning.

At 100 TB the cheapest query is the one that never reads the file: parquet
row-group and file pruning work off per-file min/max statistics, and those
statistics are only tight when the writer CLUSTERS rows so each file covers
a small region of the filter space. For a single filter column,
``repartitionByRange(col)`` is enough; for multi-column filter workloads
the standard answer (Delta OPTIMIZE ZORDER BY, Iceberg sort orders,
Databricks/Snowflake clustering) is a space-filling curve: interleave the
bits of the dimensions into one Morton key, range-partition + sort on the
key, and every file's bounding box in EVERY dimension stays small.

This module implements the Morton key as a pure JVM-side integer
expression (shift/mask/or — whole-stage-codegen, no UDF) with an identical
ANSI-SQL twin so the key is bit-exact cross-engine, plus the layout
rewriter that applies it. Parity: the reference moves rows and leaves
layout to the target store (struct_migration.py:372 points MySQL indexes
at "Z-ORDER / clustering" on Spark targets); this is that pointer made
real. Z-order reference: Morton 1966; Delta Lake OPTIMIZE ZORDER BY uses
the same bit-interleaving construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _interleave_terms(cols: list[str], bits: int) -> list[str]:
    """One term per (column, bit): ((col >> i) & 1) << (i * n + j), j the
    column's position — the classic Morton bit spread, identical text for
    Spark SQL and DuckDB (both support >> << & | on BIGINT)."""
    n = len(cols)
    terms = []
    for j, c in enumerate(cols):
        for i in range(bits):
            terms.append(f"((({c} >> {i}) & 1) << {i * n + j})")
    return terms


def morton_key_sql(cols: list[str], bits: int = 16) -> str:
    """The Morton (Z-order) key of ``cols`` as one integer expression.

    Each column must already be a non-negative integer in [0, 2^bits);
    callers bucket real values first (e.g. ``value % 1024`` or a
    rank-quantile id). n * bits must fit a BIGINT (<= 62). The SAME string
    is valid Spark SQL and DuckDB SQL, so gates compare it bit-exact."""
    n = len(cols)
    if n < 2:
        raise ValueError("Morton key needs at least 2 columns")
    if n * bits > 62:
        raise ValueError(f"{n} cols x {bits} bits overflows BIGINT")
    return "(" + " | ".join(_interleave_terms(cols, bits)) + ")"


def with_morton_key(
    df: DataFrame, cols: list[str], bits: int = 16, out: str = "zkey"
) -> DataFrame:
    """Append the Morton key column (pure codegen expression, no UDF)."""
    return df.withColumn(out, F.expr(morton_key_sql(cols, bits)).cast("long"))


def with_rank_buckets(
    df: DataFrame, col: str, bits: int = 8, out: str | None = None,
    relative_error: float = 0.001,
) -> DataFrame:
    """Quantile-bucket a numeric column into [0, 2^bits) so it can feed the
    Morton key regardless of distribution or range. Real filter columns are
    skewed (ids cluster, timestamps trend); uniform binning would put most
    rows in few buckets and destroy the curve's locality. Boundaries come
    from one ``approxQuantile`` pass (Greenwald-Khanna, driver gets 2^bits
    scalars — tiny); the bucket id is ``cardinality(filter(boundaries,
    b -> b <= x))`` over the broadcast literal array — a vectorized
    higher-order function, pure JVM, no join and no extra shuffle. The
    filter is linear in 2^bits per row, so the default stays at 8 (256
    comparisons); layout keys rarely benefit from finer than 10. NULL
    values get a NULL bucket — filter them to a dedicated file instead of
    feeding them to the curve."""
    n_buckets = 1 << bits
    bounds = df.stat.approxQuantile(
        col, [i / n_buckets for i in range(1, n_buckets)], relative_error
    )
    lits = ", ".join(f"CAST({b!r} AS DOUBLE)" for b in bounds)
    expr = (
        f"CAST(cardinality(filter(array({lits}), b -> b <= CAST({col} AS DOUBLE)))"
        f" AS BIGINT)"
    )
    return df.withColumn(out or f"{col}_bucket", F.expr(expr))


def zorder_layout(
    df: DataFrame, cols: list[str], num_files: int = 8, bits: int = 16
) -> DataFrame:
    """Rewrite ``df`` into a Z-ordered layout: range-partition on the
    Morton key of ``cols`` and sort within partitions, so a subsequent
    parquet write produces ``num_files`` files whose per-file min/max
    statistics are tight in EVERY clustered dimension — the precondition
    for multi-column scan pruning. One shuffle (the range exchange), no
    driver data motion; the range boundaries come from Spark's built-in
    sampling. The helper key column is dropped before return, matching
    how OPTIMIZE ZORDER BY leaves the schema unchanged."""
    keyed = with_morton_key(df, cols, bits, "__zkey")
    return (
        keyed.repartitionByRange(num_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
    )
