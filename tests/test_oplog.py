"""Mongo oplog dump parsing (sources/oplog_file.py + sources/bson_codec.py).

Reference parity: dt-connector/src/extractor/mongo/mongo_cdc_extractor.rs —
op dispatch 376-446, diff flattening 95-176, applyOps deleteMany 488-526,
ns split 530-535, ts resume filter 342-345. Suites:
dt-tests/tests/mongo_to_mongo/cdc.
"""

import json
import os

import pytest

from ape_dts_spark.sources import bson_codec as bc
from ape_dts_spark.sources import oplog_file as of

T = bc.Timestamp


def test_bson_roundtrip_all_types():
    doc = {
        "_id": bc.ObjectId(bytes(range(12))), "n": 1, "big": 1 << 40,
        "f": 2.5, "s": "héllo", "b": True, "z": None,
        "ts": T(100, 7), "dt": bc.DateTime(1_700_000_000_000),
        "bin": bc.Binary(b"\x01\x02", 4),
        "sub": {"a": [1, "x", {"y": False}]},
    }
    enc = bc.encode_document(doc)
    dec, n = bc.decode_document(enc)
    assert n == len(enc) and dec == doc
    # int32/int64 boundary picks the right wire type
    assert b"\x10" in bc.encode_document({"v": 7})
    assert b"\x12" == bc.encode_document({"v": 1 << 40})[4:5]


def test_bson_malformed_rejected():
    import struct

    good = bc.encode_document({"a": 1})
    with pytest.raises(ValueError, match="length mismatch"):
        bc.decode_document(struct.pack("<i", len(good) + 1) + good[4:] + b"\x00")
    with pytest.raises(ValueError, match="unsupported BSON element"):
        bc.decode_document(b"\x0b\x00\x00\x00\x7fa\x00\x00\x00\x00\x00")


def test_v2_delta_flattening_matches_reference():
    """$v:2 {diff:{u,i,d,s<nested>}} -> one flat dotted {$set,$unset}
    (flatten_oplog_diff, rs:95-135); 4.4 modifiers pass through; an update
    that is neither is dropped (rs:397-404)."""
    upd = of.build_update_doc({"$v": 2, "diff": {
        "u": {"a": 1}, "i": {"b": 2}, "d": {"c": False},
        "snest": {"u": {"x": 3}, "d": {"y": False},
                  "sdeeper": {"i": {"z": 4}}},
    }})
    assert upd == {
        "$set": {"a": 1, "b": 2, "nest.x": 3, "nest.deeper.z": 4},
        "$unset": {"c": 1, "nest.y": 1},
    }
    assert of.build_update_doc({"$set": {"k": 1}}) == {"$set": {"k": 1}}
    assert of.build_update_doc({"replace": "whole-doc"}) == {}


def test_oplog_dispatch_and_ns_split():
    entries = [
        of.entry_insert("db.users", {"_id": 1, "name": "a"}, T(10, 1)),
        of.entry_update_v2("db.users", 1, {"u": {"name": "aa"}}, T(11, 1)),
        of.entry_noop(T(12, 1)),
        of.entry_delete_many("db.users", [1, 7], T(13, 1)),
        of.entry_insert("db.order.items", {"_id": "k", "v": 5}, T(14, 1)),
    ]
    data = b"".join(bc.encode_document(e) for e in entries)
    rows = of.parse_oplog_bytes(data)
    kinds = [(r["row_type"], r["tb"]) for r in rows]
    assert kinds == [
        ("insert", "users"), ("update", "users"),
        ("delete", "users"), ("delete", "users"),  # applyOps expanded
        ("insert", "order.items"),  # tb keeps its inner dots (rs:530-535)
    ]
    assert [r["id"] for r in rows[2:4]] == ["1", "7"]


def test_resume_from_ts_checkpoint():
    entries = [of.entry_insert("d.t", {"_id": i}, T(10, i)) for i in range(1, 6)]
    data = b"".join(bc.encode_document(e) for e in entries)
    rows = of.parse_oplog_bytes(data, start_time=10, start_inc=3)
    assert [r["id"] for r in rows] == ["4", "5"]


def test_distributed_scan_and_fold(spark, tmp_path):
    """binaryFile scan over a dump chain + per-id state fold reproduces the
    direct Python replay — insert, both update encodings, unset, delete."""
    entries = [
        of.entry_insert("db.u", {"_id": 1, "a": 1, "nest": {"x": 1, "y": 2}}, T(1, 1)),
        of.entry_insert("db.u", {"_id": 2, "a": 2}, T(1, 2)),
        of.entry_insert("db.u", {"_id": 3, "a": 3}, T(1, 3)),
        of.entry_update_v2("db.u", 1, {"u": {"a": 10}, "snest": {"d": {"y": False}}}, T(2, 1)),
        of.entry_update_set("db.u", 2, {"b": 5}, None, T(2, 2)),
        of.entry_delete("db.u", 3, T(3, 1)),
    ]
    out = str(tmp_path / "dump")
    os.makedirs(out)
    paths = of.write_oplog_files(entries, out, per_file=2)
    assert len(paths) == 3
    changes = of.read_oplog_files(spark, out)
    state = {r["id"]: json.loads(r["doc"])
             for r in of.fold_oplog_state(changes).collect()}
    assert state == {
        "1": {"_id": 1, "a": 10, "nest": {"x": 1}},
        "2": {"_id": 2, "a": 2, "b": 5},
    }
    # global order: seq strictly increasing along (op_time, op_inc)
    rows = changes.orderBy("op_time", "op_inc").collect()
    assert [int(r["id"]) for r in rows] == [1, 2, 3, 1, 2, 3]


def test_streaming_tail_of_dump_dir(spark, tmp_path):
    """stream_oplog_files: a readStream tail of the dump directory — chunks
    present at start drain, chunks arriving later apply from the SAME
    checkpoint without re-emitting (the TailableAwait cursor analogue)."""
    out = str(tmp_path / "dump")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(out)
    of.write_oplog_files(
        [of.entry_insert("db.u", {"_id": i}, T(1, i)) for i in range(1, 4)],
        out, per_file=0,
    )
    seen = []

    def run():
        q = (
            of.stream_oplog_files(spark, out)
            .writeStream.foreachBatch(
                lambda b, _id: seen.extend(r["id"] for r in b.collect())
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    assert sorted(seen) == ["1", "2", "3"]
    # a later chunk arrives with its own file index
    with open(os.path.join(out, "oplog.000002.bson"), "wb") as f:
        f.write(bc.encode_document(of.entry_insert("db.u", {"_id": 9}, T(2, 1))))
    run()
    assert sorted(seen) == ["1", "2", "3", "9"]  # no re-emit of 1..3
