"""Mergeable sketches: HyperLogLog registers + estimator accuracy, the
sketch merge law, Count-Min one-sided error and planted heavy hitters."""

from __future__ import annotations

from pyspark.sql import functions as F

from ape_dts_spark.functions import sketches as sk


def test_hll_estimate_within_error_bound(spark):
    """Standard error at m=256 is ~6.5%; assert 3 sigma on a corpus with
    heavy duplication (true distinct = 5000 from 50000 rows)."""
    df = spark.range(50_000).select(
        F.concat(F.lit("item-"), (F.col("id") % 5000).cast("string")).alias("v")
    )
    regs = sk.hll_registers(df, "v")
    est = sk.hll_estimate(regs)
    assert abs(est - 5000) / 5000 < 0.20
    # registers are a pure function of the value set: dup-blind + partition-invariant
    regs2 = sk.hll_registers(df.repartition(13).distinct(), "v")
    assert sorted(map(tuple, regs.collect())) == sorted(map(tuple, regs2.collect()))


def test_hll_merge_law(spark):
    """sketch(A) + sketch(B) merged by per-register MAX equals
    sketch(A union B) exactly — the property that lets shard/day sketches
    combine without touching rows."""
    a = spark.range(0, 3000).select(F.col("id").cast("string").alias("v"))
    b = spark.range(2000, 6000).select(F.col("id").cast("string").alias("v"))
    merged = sk.hll_merge([sk.hll_registers(a, "v"), sk.hll_registers(b, "v")])
    direct = sk.hll_registers(a.unionByName(b), "v")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_hll_small_range_linear_counting(spark):
    """With distinct << m the raw estimator biases low; the linear-counting
    correction must bring a 30-distinct corpus within ~15%."""
    df = spark.range(30).select(F.concat(F.lit("x"), F.col("id").cast("string")).alias("v"))
    est = sk.hll_estimate(sk.hll_registers(df, "v"))
    assert abs(est - 30) / 30 < 0.15


def test_cms_one_sided_error_and_planted_heavy_hitter(spark):
    """CMS point estimates never undercount (Cormode & Muthukrishnan Thm 1);
    a planted heavy item is always reported at its true count or above, and
    light items can only FALSELY appear (never vanish)."""
    rows = [("whale",)] * 900 + [(f"minnow-{i}",) for i in range(2000)]
    df = spark.createDataFrame(rows, "item string")
    hh = {r["item"]: r["est_cnt"] for r in sk.cms_heavy_hitters(df, "item", 500).collect()}
    assert hh.get("whale", 0) >= 900
    true = {r["item"]: r["cnt"] for r in df.groupBy("item").agg(F.count("*").alias("cnt")).collect()}
    est_all = {
        r["item"]: r["est_cnt"]
        for r in sk.cms_heavy_hitters(df, "item", 1).collect()
    }
    assert all(est_all[i] >= c for i, c in true.items())


def test_cms_sketch_size_is_bounded(spark):
    """The dense sketch never exceeds depth x width cells no matter the
    corpus — the reason it ships between stages at 100 TB."""
    df = spark.range(20_000).select(F.col("id").cast("string").alias("v"))
    n = sk.cms_table(df, "v").count()
    assert n <= sk.CMS_DEPTH * sk.CMS_WIDTH


def test_kmv_estimate_and_merge_law(spark):
    """Bottom-k estimator within tolerance at k=128 (expected error
    ~1/sqrt(k) ~ 9%); exact below k; merge law = bottom-k of distinct union."""
    df = spark.range(40_000).select((F.col("id") % 4000).cast("string").alias("v"))
    est = sk.kmv_estimate(sk.kmv_sketch(df, "v", 128), 128)
    assert abs(est - 4000) / 4000 < 0.30
    small = spark.range(50).select(F.col("id").cast("string").alias("v"))
    assert sk.kmv_estimate(sk.kmv_sketch(small, "v", 128), 128) == 50.0
    a = spark.range(0, 2000).select(F.col("id").cast("string").alias("v"))
    b = spark.range(1500, 3500).select(F.col("id").cast("string").alias("v"))
    m = sk.kmv_merge([sk.kmv_sketch(a, "v", 128), sk.kmv_sketch(b, "v", 128)], 128)
    direct = sk.kmv_sketch(a.unionByName(b), "v", 128)
    assert sorted(r["hkey"] for r in m.collect()) == sorted(r["hkey"] for r in direct.collect())


def test_kmv_jaccard_accuracy(spark):
    """Planted overlap: |A|=3000, |B|=3000, |A intersect B|=1500 ->
    true J = 1500/4500 = 1/3; the bottom-k sample estimate at k=256 must
    land within ~3 sigma of it (sigma ~ sqrt(J(1-J)/k) ~ 0.03)."""
    a = spark.range(0, 3000).select(F.col("id").cast("string").alias("v"))
    b = spark.range(1500, 4500).select(F.col("id").cast("string").alias("v"))
    row = sk.kmv_jaccard(a, "v", b, "v", 256).collect()[0]
    assert row["k_used"] == 256
    assert abs(row["est_jaccard"] - 1 / 3) < 0.10
    # duplicates in the input must not change the sketch (distinct-based)
    row2 = sk.kmv_jaccard(a.unionByName(a), "v", b, "v", 256).collect()[0]
    assert row2["est_jaccard"] == row["est_jaccard"]


def test_hdr_quantile_error_bound_and_exact_small(spark):
    """HDR sketch: every quantile readout lands within 2^-SUB_BITS relative
    error of the exact percentile_disc value; values below 64 get singleton
    buckets so small-domain quantiles are EXACT; non-positive values clamp
    to bucket 0."""
    import math

    vals = [int(1.5 ** i) + j for i in range(2, 30) for j in range(3)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    sketch = sk.hdr_sketch(df, "v")
    got = {r["q"]: r for r in sk.hdr_quantiles(sketch, [0.1, 0.5, 0.9, 0.99]).collect()}
    svals = sorted(vals)
    for q, row in got.items():
        exact = svals[math.ceil(q * len(svals)) - 1]
        assert row["n"] == len(svals)
        assert abs(row["q_value"] - exact) <= exact * 2 ** -sk.HDR_SUB_BITS + 1, (q, row, exact)

    small = spark.createDataFrame([(v,) for v in range(1, 64)], "v long")
    s2 = sk.hdr_sketch(small, "v")
    med = sk.hdr_quantiles(s2, [0.5]).collect()[0]
    assert med["q_value"] == 32  # exact: singleton buckets below 2^6

    clamped = sk.hdr_sketch(
        spark.createDataFrame([(-5,), (0,), (7,)], "v long"), "v"
    ).collect()
    assert {(r["bucket"], r["cnt"]) for r in clamped} == {(0, 2), (7, 1)}


def test_hdr_merge_law_equals_direct_sketch(spark):
    """Sharded sketches merged by groupBy-SUM must equal the direct sketch
    of the whole relation, bit for bit — grouped variant included."""
    df = spark.range(1, 5000).select(
        (F.col("id") % 3).alias("g"), (F.col("id") * 37 % 100000 + 1).alias("v")
    )
    direct = sk.hdr_sketch(df, "v", by=["g"])
    shard_a = sk.hdr_sketch(df.filter("id % 2 = 0"), "v", by=["g"])
    shard_b = sk.hdr_sketch(df.filter("id % 2 = 1"), "v", by=["g"])
    merged = sk.hdr_merge([shard_a, shard_b])
    key = lambda r: (r["g"], r["bucket"])
    assert sorted(map(tuple, merged.collect()), key=str) == sorted(
        map(tuple, direct.collect()), key=str
    )
    # lo is functional in bucket: shift = bucket // 2^(SUB+1) (mantissa keeps
    # its leading bit, so it never wraps into the next shift band), and
    # lo = mantissa << shift reconstructs exactly
    for r in direct.collect():
        if r["bucket"] == 0:
            continue
        shift = r["bucket"] >> (sk.HDR_SUB_BITS + 1)
        mant = r["bucket"] - (shift << (sk.HDR_SUB_BITS + 1))
        assert r["lo"] == mant << shift, r
