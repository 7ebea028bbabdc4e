"""As-of join: for every probe row, the build row with the greatest event
time at-or-before the probe's, per key — the temporal join Spark lacks as a
built-in (attribution, point-in-time feature lookup, slowly-changing lookups).

Implemented as the classic union-merge, NOT a range join: tag both sides,
union, hash-shuffle on the key, sort each partition by (ts, side), and take a
running `last(build, ignorenulls=True)` — every probe row then carries the
latest build row at-or-before it. One shuffle + one in-partition sort,
regardless of how many build rows precede each probe (a range-predicate join
materializes that fan-out; at 100 TB this is the difference between |probe| +
|build| rows moved and |probe| x avg-preceding-builds).

Determinism: equal (key, ts) collisions between build rows are resolved by
the caller de-duplicating the build side (e.g. max id per (key, ts)) — same
convention a SQL ASOF JOIN needs; at equal probe/build ts the build row sorts
first, so the join is `build.ts <= probe.ts` (inclusive).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    keys: list[str],
    pt_col: str,
    start_col: str,
    end_col: str,
    bucket: int,
) -> DataFrame:
    """Range/interval join: point rows matched to every interval row of the
    same key with ``start <= pt < end`` — without the nested-loop plan a raw
    inequality join produces.

    Buckets both sides into fixed ``bucket``-width bins (intervals explode
    into every bin they cover), equi-joins on (keys, bin), then applies the
    exact containment filter. A (point, interval) match can only occur in
    the POINT's bin, so no post-join dedup is needed. Cost: one hash shuffle
    per side on (keys, bin) + interval fan-out proportional to interval
    length / bucket — choose bucket near the typical interval length so
    fan-out stays O(1) per interval. All columns from both sides survive.
    """
    p = points.withColumn("_bkt", F.expr(f"CAST({pt_col} div {bucket} AS LONG)"))
    iv = intervals.withColumn(
        "_bkt",
        F.explode(
            F.expr(
                f"sequence(CAST({start_col} div {bucket} AS LONG), "
                f"CAST(greatest({end_col} - 1, {start_col}) div {bucket} AS LONG))"
            )
        ),
    )
    return (
        p.join(iv, [*keys, "_bkt"])
        .filter((F.col(pt_col) >= F.col(start_col)) & (F.col(pt_col) < F.col(end_col)))
        .drop("_bkt")
    )


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    keys: list[str],
    ts_col: str,
    probe_cols: list[str],
    build_cols: list[str],
) -> DataFrame:
    """Left as-of join. Output: keys + ts_col + probe_cols + build_cols +
    ``build_ts`` (build columns NULL when no build row precedes the probe).

    probe_cols/build_cols name the payload columns carried from each side
    (exclusive of keys and ts_col).
    """
    p_struct = F.struct(*[F.col(c) for c in probe_cols]).alias("_p")
    b_struct = F.struct(
        F.col(ts_col).alias("_bts"), *[F.col(c) for c in build_cols]
    ).alias("_b")
    b_type = build.select(b_struct).schema["_b"].dataType
    p_type = probe.select(p_struct).schema["_p"].dataType

    pu = probe.select(
        *keys,
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_side"),
        p_struct,
        F.lit(None).cast(b_type).alias("_b"),
    )
    bu = build.select(
        *keys,
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(p_type).alias("_p"),
        b_struct,
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = (
        pu.unionByName(bu)
        .withColumn("_last_b", F.last("_b", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    return merged.select(
        *keys,
        F.col("_ts").alias(ts_col),
        *[F.col(f"_p.{c}").alias(c) for c in probe_cols],
        F.col("_last_b._bts").alias("build_ts"),
        *[F.col(f"_last_b.{c}").alias(c) for c in build_cols],
    )
