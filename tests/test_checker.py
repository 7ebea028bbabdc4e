"""Checker semantics: miss/diff/extra classification, NaN handling, revise."""

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

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


# ---------------------------------------------------------------------------
# Retry queue + persisted inconsistency ledger (base_checker.rs:631-760)
# ---------------------------------------------------------------------------


def _lagging_target(spark, src_rows, arrive_at, fix_at):
    """fetch_dst factory: key->attempt maps for transient miss/diff rows."""

    def fetch(attempt):
        rows = []
        for r in src_rows:
            if r["id"] in arrive_at and attempt < arrive_at[r["id"]]:
                continue  # not replicated yet
            v = r["v"]
            if r["id"] in fix_at and attempt < fix_at[r["id"]]:
                v = "STALE"
            rows.append(Row(id=r["id"], v=v))
        return spark.createDataFrame(rows, "id long, v string")

    return fetch


def test_retry_transients_converge(spark):
    from ape_dts_spark.operators.checker import check_with_retries

    src_rows = [Row(id=i, v=f"v{i}") for i in range(8)]
    src = spark.createDataFrame(src_rows, "id long, v string")
    # id=2 lands at attempt 1 (transient miss), id=5 repaired at attempt 2
    # (transient diff) -> with max_retries=2 the report must be EMPTY
    fetch = _lagging_target(spark, src_rows, arrive_at={2: 1}, fix_at={5: 2})
    assert check_with_retries(src, fetch, ["id"], max_retries=2).count() == 0


def test_retry_permanent_rows_still_classified(spark):
    from ape_dts_spark.operators.checker import check_with_retries

    src_rows = [Row(id=i, v=f"v{i}") for i in range(8)]
    src = spark.createDataFrame(src_rows, "id long, v string")
    # id=3 never arrives; id=6 stays stale beyond the retry budget
    fetch = _lagging_target(spark, src_rows, arrive_at={3: 99, 2: 1}, fix_at={6: 99})
    out = {r["id"]: r for r in check_with_retries(src, fetch, ["id"], max_retries=2).collect()}
    assert set(out) == {3, 6}
    assert out[3]["check_class"] == "miss"
    assert out[6]["check_class"] == "diff" and out[6]["diff_cols"] == ["v"]


def test_retry_zero_retries_is_plain_check(spark):
    from ape_dts_spark.operators.checker import check_with_retries

    src_rows = [Row(id=i, v=f"v{i}") for i in range(4)]
    src = spark.createDataFrame(src_rows, "id long, v string")
    fetch = _lagging_target(spark, src_rows, arrive_at={1: 1}, fix_at={})
    # max_retries=0 classifies the transient row immediately (reference with
    # retry disabled: check_rows classifies on first miss)
    out = check_with_retries(src, fetch, ["id"], max_retries=0).collect()
    assert len(out) == 1 and out[0]["id"] == 1 and out[0]["check_class"] == "miss"


def test_ledger_history_never_overwritten(spark, tmp_path):
    from ape_dts_spark.operators.checker import InconsistencyLedger, check_diff

    led = InconsistencyLedger(spark, str(tmp_path / "ledger"))
    src = spark.createDataFrame([Row(id=1, v="a"), Row(id=2, v="b")], "id long, v string")

    # run 1: id=1 missing, id=2 diff
    dst1 = spark.createDataFrame([Row(id=2, v="X")], "id long, v string")
    led.record(check_diff(src, dst1, ["id"]), ["id"], run_seq=1)
    cur = {r["id"]: r["check_class"] for r in led.current(["id"]).collect()}
    assert cur == {"1": "miss", "2": "diff"}

    # run 2: id=1 repaired, id=2 still diff -> id=1 gets a resolved tombstone,
    # but its run-1 miss row stays in history (state store keeps records)
    dst2 = spark.createDataFrame([Row(id=1, v="a"), Row(id=2, v="X")], "id long, v string")
    led.record(check_diff(src, dst2, ["id"]), ["id"], run_seq=2)
    cur = {r["id"]: r["check_class"] for r in led.current(["id"]).collect()}
    assert cur == {"2": "diff"}
    hist = led.history().collect()
    assert {(r["id"], r["run_seq"], r["check_class"]) for r in hist} == {
        ("1", 1, "miss"), ("2", 1, "diff"), ("1", 2, "resolved"), ("2", 2, "diff"),
    }

    # run 3: everything clean -> id=2 tombstoned, current() empty
    led.record(check_diff(src, dst2.withColumn("v", F.when(F.col("id") == 2, "b").otherwise(F.col("v"))), ["id"]), ["id"], run_seq=3)
    assert led.current(["id"]).count() == 0
    assert led.history().count() == 5


def test_retry_records_into_ledger(spark, tmp_path):
    from ape_dts_spark.operators.checker import InconsistencyLedger, check_with_retries

    led = InconsistencyLedger(spark, str(tmp_path / "ledger2"))
    src_rows = [Row(id=i, v=f"v{i}") for i in range(6)]
    src = spark.createDataFrame(src_rows, "id long, v string")
    fetch = _lagging_target(spark, src_rows, arrive_at={4: 99}, fix_at={1: 1})
    check_with_retries(src, fetch, ["id"], max_retries=1, ledger=led, run_seq=7)
    cur = {r["id"]: r["check_class"] for r in led.current(["id"]).collect()}
    assert cur == {"4": "miss"}  # transient diff converged, only the real miss persists
