"""Pull-based data subscription: ack-advanced positions + HTTP facade.

Reference parity: dt-pipeline/src/http_server_pipeline.rs:122-141,149-363
(/info, /fetch_new, /fetch_old, /ack with ack-based position advance).
"""

import json
import urllib.request

import pyspark.sql.types as T
from pyspark.sql import functions as F

from ape_dts_spark.sinks.parquet_table import ParquetTable
from ape_dts_spark.streaming.subscription import DataSubscription

PAYLOAD = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("bal", T.LongType())]
)


def _apply(spark, table, rows, seq0):
    compacted = spark.createDataFrame(
        [("db", "t", rid, "upsert", {"id": rid, "bal": bal}, seq0 + i)
         for i, (rid, bal) in enumerate(rows)],
        "schema string, tb string, id long, op string, "
        "after struct<id:long,bal:long>, seq long",
    )
    spill = spark.createDataFrame(
        [],
        "schema string, tb string, row_type string, "
        "before struct<id:long,bal:long>, after struct<id:long,bal:long>, seq long",
    )
    table.merge_apply(compacted, spill, ["id"])


def test_fetch_ack_cycle(spark, tmp_path):
    table = ParquetTable(spark, str(tmp_path / "tbl"), PAYLOAD)
    sub = DataSubscription(table, ["id"], str(tmp_path / "state"))
    assert sub.info() == {"acked": -1, "fetched": -1, "current": -1}

    _apply(spark, table, [(1, 10), (2, 20)], seq0=1)
    events, v = sub.fetch_new()
    got = {(r["row_type"], r["after"]["id"]) for r in events.collect()}
    assert got == {("insert", 1), ("insert", 2)}
    assert sub.info()["fetched"] == v == table.version()

    # crash before ack: fetch_old re-serves the same window
    old, _ = sub.fetch_old()
    assert {(r["row_type"], r["after"]["id"]) for r in old.collect()} == got
    sub.ack(v)
    assert sub.fetch_old()[0].count() == 0  # acked window is drained

    # next batch: an update and nothing else
    _apply(spark, table, [(1, 11)], seq0=10)
    events, v2 = sub.fetch_new()
    rows = events.collect()
    assert [(r["row_type"], r["before"]["bal"], r["after"]["bal"]) for r in rows] == [
        ("update", 10, 11)
    ]
    # ack ahead of fetched is rejected; stale re-ack is a no-op
    try:
        sub.ack(v2 + 5)
        raise AssertionError("ack ahead of fetched must fail")
    except ValueError:
        pass
    sub.ack(v)  # stale
    assert sub.info()["acked"] == v


def test_state_survives_new_instance(spark, tmp_path):
    table = ParquetTable(spark, str(tmp_path / "tbl"), PAYLOAD)
    _apply(spark, table, [(5, 50)], seq0=1)
    sub1 = DataSubscription(table, ["id"], str(tmp_path / "state"))
    _, v = sub1.fetch_new()
    # consumer restarts: positions come back from the state file
    sub2 = DataSubscription(table, ["id"], str(tmp_path / "state"))
    assert sub2.info()["fetched"] == v and sub2.info()["acked"] == -1
    assert sub2.fetch_old()[0].count() == 1


def test_http_facade(spark, tmp_path):
    table = ParquetTable(spark, str(tmp_path / "tbl"), PAYLOAD)
    _apply(spark, table, [(7, 70)], seq0=1)
    sub = DataSubscription(table, ["id"], str(tmp_path / "state"))
    server, port = sub.serve()
    try:
        base = f"http://127.0.0.1:{port}"
        info = json.load(urllib.request.urlopen(f"{base}/info"))
        assert info == {"acked": -1, "fetched": -1, "current": 0}
        new = json.load(urllib.request.urlopen(f"{base}/fetch_new"))
        assert new["version"] == 0
        assert [e["after"]["id"] for e in new["events"]] == [7]
        req = urllib.request.Request(
            f"{base}/ack", data=json.dumps({"version": 0}).encode(), method="POST"
        )
        assert json.load(urllib.request.urlopen(req)) == {"acked": 0}
        old = json.load(urllib.request.urlopen(f"{base}/fetch_old"))
        assert old["events"] == []
    finally:
        server.shutdown()
