"""Checker semantics: miss/diff/extra classification, NaN handling, revise."""

import math

from pyspark.sql import Row

from ape_dts_spark.operators.checker import check_diff, check_summary, revise_rows


def test_classes(spark):
    src = spark.createDataFrame(
        [Row(id=1, a="x", b=1.0), Row(id=2, a="y", b=2.0), Row(id=3, a="z", b=3.0)]
    )
    dst = spark.createDataFrame(
        [Row(id=1, a="x", b=1.0), Row(id=2, a="CHANGED", b=2.0), Row(id=4, a="w", b=4.0)]
    )
    out = {r["id"]: r for r in check_diff(src, dst, ["id"], include_extra=True).collect()}
    assert set(out) == {2, 3, 4}
    assert out[3]["check_class"] == "miss"
    assert out[4]["check_class"] == "extra"
    assert out[2]["check_class"] == "diff" and out[2]["diff_cols"] == ["a"]


def test_nan_equals_nan(spark):
    # reference: NaN == NaN for check comparisons (col_value.rs:135-150)
    src = spark.createDataFrame([Row(id=1, b=float("nan"))])
    dst = spark.createDataFrame([Row(id=1, b=float("nan"))])
    assert check_diff(src, dst, ["id"]).count() == 0


def test_null_vs_value_is_diff(spark):
    src = spark.createDataFrame([Row(id=1, b=1.0)])
    dst = spark.createDataFrame([Row(id=1, b=None)], "id long, b double")
    out = check_diff(src, dst, ["id"]).collect()
    assert len(out) == 1 and out[0]["check_class"] == "diff" and out[0]["diff_cols"] == ["b"]


def test_summary_and_revise(spark):
    src = spark.createDataFrame([Row(id=i, v=float(i)) for i in range(10)])
    dst = spark.createDataFrame([Row(id=i, v=float(i) + (1 if i == 5 else 0)) for i in range(1, 10)])
    d = check_diff(src, dst, ["id"])
    summary = {r["check_class"]: r["n"] for r in check_summary(d).collect()}
    assert summary == {"miss": 1, "diff": 1}
    rev = revise_rows(d, src, ["id"]).collect()
    assert sorted(r["id"] for r in rev) == [0, 5]
    assert not math.isnan(rev[0]["v"])
