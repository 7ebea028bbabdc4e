"""pgoutput captured-stream parsing (sources/pgoutput_file.py).

Reference parity: dt-connector/src/extractor/pg/pg_cdc_extractor.rs —
dispatch loop 169-224, decode_update 354-393, decode_delete 395-426,
parse_row_data 483-524, DDL capture 428-480. Suites:
dt-tests/tests/pg_to_pg/cdc/basic_test.
"""

import os
import struct

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ape_dts_spark.model.position import PgCdcPosition
from ape_dts_spark.sources import pgoutput_file as pg

USERS = pg.PgTable(
    "public", "users",
    (("id", 20, True), ("name", 25, False), ("bal", 701, False)),
    rel_id=77, replident="d",
)
USERS_FULL = pg.PgTable(
    "public", "users_full",
    (("id", 20, True), ("name", 25, False), ("bal", 701, False)),
    rel_id=78, replident="f",
)
DDL_TB = pg.PgTable(
    "public", pg.DDL_META_TB,
    (("ddl_text", 25, False), ("id", 20, True), ("schema", 25, False)),
    rel_id=99, replident="d",
)
TABLES = {
    ("public", "users"): USERS,
    ("public", "users_full"): USERS_FULL,
    ("public", pg.DDL_META_TB): DDL_TB,
}
ROW1 = {"id": 1, "name": "ann", "bal": 10.5}


def _basic_txns():
    return [
        [(("public", "users"), "insert", None, ROW1),
         (("public", "users"), "insert", None, {"id": 2, "name": None, "bal": -3.25})],
        [(("public", "users"), "update", ROW1, dict(ROW1, name="bob"))],
        [(("public", "users"), "delete", {"id": 2, "name": None, "bal": -3.25}, None)],
    ]


def test_roundtrip_and_before_image_preference():
    """Replica identity 'd': an update without key change sends NO old tuple,
    so the parser projects the key cols from the new image (the reference's
    id_cols fallback, pg_cdc_extractor.rs:375-381); a key-changing update
    sends a 'K' tuple. Deletes send the key tuple with non-key cols NULL."""
    data, _ = pg.encode_segment(_basic_txns(), TABLES)
    rows = pg.parse_pgoutput_bytes(data, file_name="pgwal.000001")
    kinds = [r["row_type"] for r in rows]
    assert kinds == ["insert", "insert", "commit", "update", "commit", "delete", "commit"]
    ins1, ins2 = rows[0], rows[1]
    assert ins1["after"] == {"id": "1", "name": "ann", "bal": "10.5"}
    assert ins2["after"]["name"] is None
    upd = rows[3]
    assert upd["before"] == {"id": "1"}  # projected key, no old tuple on wire
    assert upd["after"]["name"] == "bob"
    dele = rows[5]
    assert dele["before"]["id"] == "2" and dele["before"]["name"] is None

    # key-changing update under 'd' -> real K tuple
    data2, _ = pg.encode_segment(
        [[(("public", "users"), "update", ROW1, dict(ROW1, id=9))]], TABLES
    )
    upd2 = [r for r in pg.parse_pgoutput_bytes(data2) if r["row_type"] == "update"][0]
    assert upd2["before"]["id"] == "1" and upd2["after"]["id"] == "9"


def test_replica_identity_full_sends_whole_old_row():
    txns = [[(("public", "users_full"), "update", ROW1, dict(ROW1, bal=99.0))],
            [(("public", "users_full"), "delete", ROW1, None)]]
    data, _ = pg.encode_segment(txns, TABLES)
    rows = pg.parse_pgoutput_bytes(data)
    upd = [r for r in rows if r["row_type"] == "update"][0]
    assert upd["before"] == {"id": "1", "name": "ann", "bal": "10.5"}
    dele = [r for r in rows if r["row_type"] == "delete"][0]
    assert dele["before"]["name"] == "ann"  # full old row, not just the key


def test_unchanged_toast_marker_kept():
    """TupleData 'u' -> explicit UnchangedToast marker, as the reference
    keeps (pg_cdc_extractor.rs:512-520) so the apply path can skip the
    column rather than null it."""
    txns = [[(("public", "users_full"), "update", ROW1,
              dict(ROW1, name=pg.UNCHANGED_TOAST, bal=1.0))]]
    data, _ = pg.encode_segment(txns, TABLES)
    upd = [r for r in pg.parse_pgoutput_bytes(data) if r["row_type"] == "update"][0]
    assert upd["after"]["name"] == pg.UNCHANGED_TOAST
    assert upd["after"]["bal"] == "1.0"


def test_ddl_capture_table_emits_ddl_rows():
    """Inserts into ape_dts_ddl_command re-emit as row_type 'ddl' with the
    statement and the event-trigger schema (pg_cdc_extractor.rs:428-459)."""
    txns = [[(("public", pg.DDL_META_TB), "insert", None,
              {"ddl_text": "ALTER TABLE public.users ADD COLUMN age int",
               "id": 1, "schema": "public"})]]
    data, _ = pg.encode_segment(txns, TABLES)
    rows = pg.parse_pgoutput_bytes(data)
    ddl = [r for r in rows if r["row_type"] == "ddl"]
    assert len(ddl) == 1
    assert ddl[0]["after"]["query"].startswith("ALTER TABLE")
    assert ddl[0]["schema"] == "public"
    assert not [r for r in rows if r["tb"] == pg.DDL_META_TB]


def test_truncate_origin_type_messages():
    """Truncate emits one row per relation; Origin/Type are consumed
    silently (the reference's loop ignores them, rs:199-203)."""
    txns = [[([("public", "users"), ("public", "users_full")], "truncate", None, None)]]
    data, _ = pg.encode_segment(txns, TABLES)
    # splice an Origin and a Type message in front (they are valid mid-stream)
    extra = pg._SegmentWriter(0x9_0000_0000, 0)
    extra.record(pg.encode_origin(1, "node_a"))
    extra.record(pg.encode_type(3802, "pg_catalog", "jsonb"))
    rows = pg.parse_pgoutput_bytes(bytes(extra.buf) + data)
    tr = [r for r in rows if r["row_type"] == "truncate"]
    assert [r["tb"] for r in tr] == ["users", "users_full"]


def test_unknown_message_rejected():
    w = pg._SegmentWriter(0, 0)
    w.record(b"Z" + b"\x00" * 4)
    with pytest.raises(ValueError, match="unknown pgoutput"):
        pg.parse_pgoutput_bytes(bytes(w.buf))


def test_segment_chain_and_global_order(spark, tmp_path):
    """Segments chain with continuous LSNs/xids; the distributed scan
    globalizes seq as (segment idx << 33) | in-segment seq, and ORDER BY seq
    agrees with PgCdcPosition.sort_key over the commit LSNs."""
    txns = [[(("public", "users"), "insert", None, dict(ROW1, id=i))]
            for i in range(1, 8)]
    out = str(tmp_path / "wal")
    os.makedirs(out)
    paths = pg.write_pgoutput_files(txns, TABLES, out, per_file=3)
    assert [os.path.basename(p) for p in paths] == [
        "pgwal.000001", "pgwal.000002", "pgwal.000003",
    ]
    rows = pg.read_pgoutput_files(spark, out).orderBy("seq").collect()
    ins = [r for r in rows if r["row_type"] == "insert"]
    assert [r["after"]["id"] for r in ins] == [str(i) for i in range(1, 8)]
    assert [r["xid"] for r in ins] == list(range(1000, 1007))
    commits = [r for r in rows if r["row_type"] == "commit"]
    keys = [PgCdcPosition(r["lsn"]).sort_key() for r in commits]
    assert keys == sorted(keys) and len(set(keys)) == len(keys)


def test_replay_equivalence_through_apply_path(spark, tmp_path):
    """pgoutput bytes -> distributed parse -> compact + MERGE apply lands
    the same target state as applying the source-of-truth changes directly
    (transport must not change state — the test_avro.py bridge pattern)."""
    from ape_dts_spark.operators.merge import compact_changes
    from ape_dts_spark.sinks.parquet_table import ParquetTable

    txns = []
    for i in range(1, 21):
        txns.append([(("public", "users"), "insert", None, dict(ROW1, id=i, name=f"u{i}"))])
    for i in range(2, 21, 2):
        before = dict(ROW1, id=i, name=f"u{i}")
        txns.append([(("public", "users"), "update", before, dict(before, bal=float(i)))])
    for i in range(5, 21, 5):
        txns.append([(("public", "users"), "delete", dict(ROW1, id=i), None)])
    out = str(tmp_path / "wal")
    os.makedirs(out)
    pg.write_pgoutput_files(txns, TABLES, out, per_file=10)

    payload = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("bal", T.DoubleType()),
    ])

    def typed(colname):
        s = F.struct(
            *[F.col(colname)[f.name].cast(f.dataType).alias(f.name) for f in payload.fields]
        )
        return F.when(F.col(colname).isNotNull(), s).alias(colname)

    ch = (
        pg.read_pgoutput_files(spark, out)
        .filter(F.col("row_type").isin("insert", "update", "delete"))
        .select("schema", "tb", "row_type", "seq", typed("before"), typed("after"))
    )
    compacted, spilled = compact_changes(ch, ["id"])
    table = ParquetTable(spark, str(tmp_path / "tgt"), payload)
    table.merge_apply(compacted, spilled, ["id"], stream_id="pgwal", batch_id=0)
    state = {r["id"]: (r["name"], r["bal"]) for r in table.current().collect()}
    expected = {}
    for i in range(1, 21):
        expected[i] = (f"u{i}", float(i) if i % 2 == 0 else 10.5)
    for i in range(5, 21, 5):
        del expected[i]
    assert state == expected


def test_resume_from_confirmed_flush_lsn(spark, tmp_path):
    """Confirmed-flush resume parity (keep_alive_ack feeds the committed
    LSN back, pg_cdc_extractor.rs:246-276): a scan resumed from a commit's
    LSN emits exactly the transactions after it, across the whole chain."""
    txns = [[(("public", "users"), "insert", None, dict(ROW1, id=i))]
            for i in range(1, 10)]
    out = str(tmp_path / "wal")
    os.makedirs(out)
    pg.write_pgoutput_files(txns, TABLES, out, per_file=3)

    full = pg.read_pgoutput_files(spark, out).collect()
    ckpt = next(r for r in sorted(full, key=lambda r: r["seq"])
                if r["row_type"] == "commit" and r["xid"] == 1004)
    resumed = pg.read_pgoutput_files(spark, out, start_lsn=ckpt["lsn"]).collect()
    ids = sorted(int(r["after"]["id"]) for r in resumed if r["row_type"] == "insert")
    assert ids == [6, 7, 8, 9]
    assert all(r["xid"] > 1004 for r in resumed)


def test_pg_text_rendering():
    assert pg._pg_text(True) == b"t" and pg._pg_text(False) == b"f"
    assert pg._pg_text(b"\x01\xff") == b"\\x01ff"
    assert float(pg._pg_text(0.1).decode()) == 0.1
    assert pg._pg_text(-7) == b"-7"


def test_streaming_tail_of_segment_dir(spark, tmp_path):
    """stream_pgoutput_files: a readStream tail of the segment directory
    drives CdcPipeline — segments present at start apply, segments arriving
    later apply from the SAME checkpoint without re-applying (the
    confirmed-flush cursor mapped onto the stream checkpoint)."""
    from ape_dts_spark.sinks.parquet_table import ParquetTable
    from ape_dts_spark.streaming.cdc import CdcPipeline

    out = str(tmp_path / "wal")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(out)
    txns1 = [[(("public", "users"), "insert", None, dict(ROW1, id=i))]
             for i in range(1, 6)]
    pg.write_pgoutput_files(txns1, TABLES, out, per_file=0)

    payload = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("bal", T.DoubleType()),
    ])

    def typed(colname):
        s = F.struct(
            *[F.col(colname)[f.name].cast(f.dataType).alias(f.name) for f in payload.fields]
        )
        return F.when(F.col(colname).isNotNull(), s).alias(colname)

    def changes():
        return (
            pg.stream_pgoutput_files(spark, out)
            .filter(F.col("row_type").isin("insert", "update", "delete"))
            .select(
                "schema", "tb", "row_type", "seq",
                F.timestamp_micros(F.col("ts")).alias("ts"),
                typed("before"), typed("after"),
            )
        )

    table = ParquetTable(spark, str(tmp_path / "tgt"), payload)
    pipe = CdcPipeline(spark, table, key_cols=["id"], stream_id="pg-tail")
    pipe.run(changes(), ckpt)
    assert sorted(r["id"] for r in table.current().collect()) == [1, 2, 3, 4, 5]

    # a later flush arrives (continuous LSNs): update id=2, delete id=4
    row2 = dict(ROW1, id=2)
    txns2 = [
        [(("public", "users"), "update", row2, dict(row2, name="late"))],
        [(("public", "users"), "delete", dict(ROW1, id=4), None)],
    ]
    data, _ = pg.encode_segment(txns2, TABLES, start_lsn=0x9_0000_0000, start_xid=2000)
    with open(os.path.join(out, "pgwal.000002"), "wb") as f:
        f.write(data)
    pipe.run(changes(), ckpt)
    state = {r["id"]: r["name"] for r in table.current().collect()}
    assert state[2] == "late" and 4 not in state and len(state) == 4


def test_multi_table_stream_fans_per_target(spark, tmp_path):
    """pgoutput is self-describing, so ONE segment stream carries many
    tables; MultiTableCdcPipeline fans the micro-batch per (schema, tb) and
    merge-applies each target independently (table_parallelizer.rs
    topology) — straight from real segment bytes."""
    from ape_dts_spark.sinks.parquet_table import ParquetTable
    from ape_dts_spark.streaming.cdc import MultiTableCdcPipeline

    out = str(tmp_path / "wal")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(out)
    txns = [
        [(("public", "users"), "insert", None, dict(ROW1, id=1))],
        [(("public", "users_full"), "insert", None, dict(ROW1, id=7, name="acct"))],
        [(("public", "users"), "update", dict(ROW1, id=1), dict(ROW1, id=1, bal=12.0))],
    ]
    pg.write_pgoutput_files(txns, TABLES, out, per_file=0)

    payload = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("bal", T.DoubleType()),
    ])

    def typed(colname):
        s = F.struct(
            *[F.col(colname)[f.name].cast(f.dataType).alias(f.name) for f in payload.fields]
        )
        return F.when(F.col(colname).isNotNull(), s).alias(colname)

    changes = (
        pg.stream_pgoutput_files(spark, out)
        .filter(F.col("row_type").isin("insert", "update", "delete"))
        .select(
            "schema", "tb", "row_type", "seq",
            F.timestamp_micros(F.col("ts")).alias("ts"),
            typed("before"), typed("after"),
        )
    )
    users = ParquetTable(spark, str(tmp_path / "users"), payload)
    accounts = ParquetTable(spark, str(tmp_path / "accounts"), payload)
    pipe = MultiTableCdcPipeline(
        spark,
        targets={"public.users": (users, ["id"]),
                 "public.users_full": (accounts, ["id"])},
    )
    pipe.run(changes, ckpt)
    assert {r["id"]: r["bal"] for r in users.current().collect()} == {1: 12.0}
    assert [r["name"] for r in accounts.current().collect()] == ["acct"]


def test_streamed_transactions_v2():
    """Protocol-v2 streamed in-progress transactions (PG 14+): interleaved
    StreamStart segments buffer per the leading per-message xid; a
    StreamCommit emits that transaction's rows in arrival order with the
    commit's xid/ts, a StreamAbort discards them entirely."""
    ops_a = [(("public", "users"), "insert", None, dict(ROW1, id=i))
             for i in (1, 2, 3)]
    ops_b = [(("public", "users"), "insert", None, dict(ROW1, id=i))
             for i in (10, 11)]
    data, _ = pg.encode_streamed_segment(
        [(900, ops_a, "commit"), (901, ops_b, "abort")],
        TABLES, interleave=True,
    )
    rows = pg.parse_pgoutput_bytes(data)
    ins = [r for r in rows if r["row_type"] == "insert"]
    # only the committed stream's rows, in their arrival order
    assert [r["after"]["id"] for r in ins] == ["1", "2", "3"]
    assert all(r["xid"] == 900 for r in ins)
    commits = [r for r in rows if r["row_type"] == "commit"]
    assert len(commits) == 1 and commits[0]["xid"] == 900
    # resume past the stream commit suppresses it
    from ape_dts_spark.model.position import PgCdcPosition

    cut = PgCdcPosition(commits[0]["lsn"]).lsn_value()
    assert pg.parse_pgoutput_bytes(data, start_lsn=cut) == []


def test_streamed_and_plain_transactions_interleave():
    """A plain Begin/Commit transaction between stream segments stays on the
    non-streamed path (no xid prefix) while the stream buffers around it."""
    plain, _ = pg.encode_segment(
        [[(("public", "users_full"), "insert", None, dict(ROW1, id=50))]], TABLES
    )
    streamed, _ = pg.encode_streamed_segment(
        [(902, [(("public", "users"), "insert", None, dict(ROW1, id=60))], "commit")],
        TABLES,
    )
    rows = pg.parse_pgoutput_bytes(streamed + plain)
    ids = [r["after"]["id"] for r in rows if r["row_type"] == "insert"]
    assert sorted(ids) == ["50", "60"]


def test_streamed_subtransactions_route_to_toplevel_xid():
    """Streamed row messages stamped with SUBtransaction xids (as PG emits
    when a streamed txn contains SAVEPOINTs) buffer under the open segment's
    top-level xid — no KeyError — and StreamAbort(xid, subxid) discards just
    that subtransaction's rows (ADVICE r7)."""
    ops = [
        (("public", "users"), "insert", None, dict(ROW1, id=1)),        # top xid
        (("public", "users"), "insert", None, dict(ROW1, id=2), 951),   # subxid 951
        (("public", "users"), "insert", None, dict(ROW1, id=3), 952),   # subxid 952
    ]
    data, _ = pg.encode_streamed_segment(
        [(950, ops, "commit", [952])], TABLES, interleave=False,
    )
    rows = pg.parse_pgoutput_bytes(data)
    ins = [r for r in rows if r["row_type"] == "insert"]
    # subxid 952's row aborted; the rest commit in arrival order under 950
    assert [r["after"]["id"] for r in ins] == ["1", "2"]
    assert all(r["xid"] == 950 for r in ins)
    assert all("_subxid" not in r for r in rows)
    # aborting the top-level xid itself discards everything
    data2, _ = pg.encode_streamed_segment(
        [(960, ops, "abort")], TABLES, interleave=False,
    )
    assert [r for r in pg.parse_pgoutput_bytes(data2) if r["row_type"] == "insert"] == []
