from pyspark.sql import functions as F

from ape_dts_spark import demo
from ape_dts_spark.operators.stats import key_stats


def test_key_stats_matches_manual(spark, sf_dir):
    li = demo.load(spark, sf_dir, "lineitem")
    row = key_stats(li, "l_orderkey").collect()[0]
    n = li.count()
    assert row["n_rows"] == n
    assert row["n_nulls"] == 0
    assert row["k_min"] == li.agg(F.min("l_orderkey")).collect()[0][0]
    assert row["k_max"] == li.agg(F.max("l_orderkey")).collect()[0][0]
    assert row["n_distinct"] == li.select("l_orderkey").distinct().count()


def test_key_stats_nulls_and_approx(spark):
    df = spark.createDataFrame(
        [(1,), (1,), (2,), (None,), (None,)], "k int"
    )
    row = key_stats(df, "k").collect()[0]
    assert (row["n_rows"], row["n_distinct"], row["n_nulls"]) == (5, 2, 2)
    assert (row["k_min"], row["k_max"]) == (1, 2)

    approx = key_stats(df, "k", approx_ndv=True).collect()[0]
    # HLL on 2 distinct values is exact
    assert approx["n_distinct"] == 2


def test_key_stats_single_shuffle_plan(spark, sf_dir):
    """The only exchange should come from COUNT(DISTINCT); approx mode is
    a pure two-phase agg (map-side partials) with one exchange as well."""
    li = demo.load(spark, sf_dir, "lineitem")
    plan = key_stats(li, "l_orderkey", approx_ndv=True)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1, plan
