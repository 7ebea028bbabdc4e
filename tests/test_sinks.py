"""SQL-file sink + soft-delete sink semantics."""

from pyspark.sql import Row
from pyspark.sql import types as T

from ape_dts_spark.model.changes import change_event_schema
from ape_dts_spark.sinks.soft_delete import resolve_latest, to_soft_delete_rows
from ape_dts_spark.sinks.sql_file import events_to_sql

PAYLOAD = T.StructType([T.StructField("id", T.LongType()), T.StructField("v", T.StringType())])


def make_stream(spark):
    rows = [
        Row(schema="s", tb="t", row_type="insert", before=None, after=Row(id=1, v="a'b"), seq=1),
        Row(schema="s", tb="t", row_type="update", before=Row(id=1, v="a'b"), after=Row(id=1, v="c"), seq=2),
        Row(schema="s", tb="t", row_type="delete", before=Row(id=1, v="c"), after=None, seq=3),
    ]
    return spark.createDataFrame(rows, change_event_schema(PAYLOAD))


def test_sql_generation(spark):
    out = {r["seq"]: r["sql"] for r in events_to_sql(make_stream(spark), ["id"]).collect()}
    assert out[1] == "INSERT INTO `s`.`t` (`id`, `v`) VALUES (1, 'a''b');"
    assert out[2] == "UPDATE `s`.`t` SET `id` = 1, `v` = 'c' WHERE `id` = 1;"
    assert out[3] == "DELETE FROM `s`.`t` WHERE `id` = 1;"


def test_undo_sql(spark):
    out = {r["seq"]: r["sql"] for r in events_to_sql(make_stream(spark), ["id"], reverse=True).collect()}
    # undo of insert = delete; undo of delete = re-insert; undo of update restores old value
    assert out[1].startswith("DELETE FROM")
    assert out[3].startswith("INSERT INTO")
    assert "SET `id` = 1, `v` = 'a''b'" in out[2]


def test_soft_delete_roundtrip(spark):
    rows = to_soft_delete_rows(make_stream(spark))
    assert rows.count() == 3
    final = resolve_latest(rows, ["schema", "tb", "id"])
    assert final.count() == 0  # last event deleted the row

    live = make_stream(spark).filter("seq < 3")
    final2 = resolve_latest(to_soft_delete_rows(live), ["schema", "tb", "id"]).collect()
    assert len(final2) == 1 and final2[0]["v"] == "c"


def test_origin_marker_write_and_echo_drop(spark):
    """Write path of the two-way-sync marker: node A stamps outgoing events;
    after the wire hop node B's ignore filter drops A's echoes but keeps
    third-node relays (preserve_existing)."""
    from pyspark.sql import functions as F

    from ape_dts_spark.sinks.wire_format import decode_events, encode_events, mark_origin

    stream = make_stream(spark).withColumn(
        "origin_node",
        F.when(F.col("seq") == 1, F.lit("node_c")).otherwise(F.lit(None).cast("string")),
    )
    outgoing = mark_origin(stream, "node_a")
    payload = stream.schema["after"].dataType
    arrived = decode_events(encode_events(outgoing), payload)
    origins = {r["seq"]: r["origin_node"] for r in arrived.collect()}
    assert origins[1] == "node_c"                       # relay preserved
    assert all(v == "node_a" for s, v in origins.items() if s != 1)
    kept = arrived.filter(
        F.col("origin_node").isNull() | ~F.col("origin_node").isin("node_a")
    )
    assert {r["seq"] for r in kept.collect()} == {1}    # echoes dropped at B


def test_charset_roundtrip_sql_and_wire(spark):
    """charset_test parity: non-ASCII values survive the SQL-file sink
    (literal escaping) and the wire-format encode/decode round trip."""
    from ape_dts_spark.sinks.sql_file import events_to_sql
    from ape_dts_spark.sinks.wire_format import decode_events, encode_events

    payload = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
    )
    val = "héllo 世界 😀 O'Brien \\ `tick`"
    df = spark.createDataFrame(
        [("db", "tb", "insert", None, {"id": 1, "name": val}, 1)],
        T.StructType(
            [
                T.StructField("schema", T.StringType()),
                T.StructField("tb", T.StringType()),
                T.StructField("row_type", T.StringType()),
                T.StructField("before", payload),
                T.StructField("after", payload),
                T.StructField("seq", T.LongType()),
            ]
        ),
    )
    sql = events_to_sql(df, ["id"]).collect()[0]["sql"]
    # backslash doubled, quote doubled, unicode verbatim
    assert "O''Brien" in sql and "\\\\" in sql and "世界" in sql and "😀" in sql
    back = decode_events(encode_events(df), payload).collect()[0]
    assert back["after"]["name"] == val


# -- Foxlake orc sequencer (orc_sequencer.rs, foxlake_pusher.rs push/merge)


def test_orc_sequencer_counter():
    from ape_dts_spark.sinks.orc_sequencer import _ROLLOVER, OrcSequencer

    sq = OrcSequencer(100, epoch=7)
    a, b = sq.get_sequence(), sq.get_sequence()
    assert (a.sequencer_id, a.push_epoch, a.push_sequence) == (100, 7, 0)
    assert (b.sequencer_id, b.push_sequence) == (100, 1)
    sq.update_epoch(9)
    assert sq.get_sequence().push_epoch == 9
    sq.sequence = _ROLLOVER
    c = sq.get_sequence()
    assert (c.sequencer_id, c.push_sequence) == (101, 0)  # fresh, larger id


def test_orc_push_merge_order_independent(spark, tmp_path):
    """Pushes replayed shuffled AND with duplicated sequence numbers merge
    to the identical state as ordered pushes: the idempotence/total-order
    property the reference's sequence-numbered meta files exist for."""
    from ape_dts_spark.sinks import orc_sequencer as oseq

    batches = [
        [(1, "a", 0), (2, "b", 0), (3, "c", 0)],          # inserts
        [(2, "b2", 1), (4, "d", 0)],                      # update 2, insert 4
        [(1, None, 2), (3, "c2", 1)],                     # delete 1, update 3
        [(5, "e", 0), (3, None, 2)],                      # insert 5, delete 3
    ]
    schema = "k long, v string, cdc_action int"
    expect = {2: "b2", 4: "d", 5: "e"}

    def push_all(root, order, dup=None, sequencer_id=500):
        sq = oseq.OrcSequencer(sequencer_id)
        infos = [sq.get_sequence() for _ in batches]
        metas = {}
        for i in order:
            metas[i] = oseq.push_batch(
                spark.createDataFrame(batches[i], schema),
                str(root), "db", "t", sq,
                push_uuid=f"u{i}", sequence_info=infos[i],
            )
        if dup is not None:
            # crash-retry: same sequence re-pushed under a NEW uuid
            oseq.push_batch(
                spark.createDataFrame(batches[dup], schema),
                str(root), "db", "t", sq,
                push_uuid=f"retry{dup}", sequence_info=infos[dup],
            )
        oseq.mark_finished(str(root), "db", "t")
        return metas

    ordered = tmp_path / "ordered"
    shuffled = tmp_path / "shuffled"
    push_all(ordered, [0, 1, 2, 3])
    metas = push_all(shuffled, [2, 0, 3, 1], dup=1)

    assert metas[0]["insert_only"] is True and metas[2]["insert_only"] is False

    got_o = {r["k"]: r["v"] for r in oseq.merge_pushes(spark, str(ordered), "db", "t", ["k"]).collect()}
    got_s = {r["k"]: r["v"] for r in oseq.merge_pushes(spark, str(shuffled), "db", "t", ["k"]).collect()}
    assert got_o == expect
    assert got_s == expect

    man = oseq.read_manifest(str(shuffled), "db", "t")
    assert [m["push_sequence"] for m in man] == [0, 1, 2, 3]  # dup deduped
