"""Adversarial robustness matrix for the at-rest source decoders: every
truncation point and flipped byte of a well-formed artifact must either
parse (flips can land in payload bytes) or raise ValueError /
NotImplementedError — never struct.error / IndexError / a hang. This is
the same contract tests/test_media_robustness.py pins for the media codec
family (r13), applied to the RDB/AOF/RESP/Kafka source family (r14; the
RDB matrix itself lives in test_redis.py next to its fixtures)."""

import pytest

ALLOWED = (ValueError, NotImplementedError)


def _fuzz(parse, blob: bytes, flip_stride: int = 1):
    for n in range(len(blob)):
        try:
            parse(blob[:n])
        except ALLOWED:
            pass
    for i in range(0, len(blob), flip_stride):
        for x in (0x01, 0xFF):
            mutated = bytearray(blob)
            mutated[i] ^= x
            try:
                parse(bytes(mutated))
            except ALLOWED:
                pass


@pytest.mark.parametrize("codec", ["none", "gzip", "snappy", "lz4", "zstd"])
def test_kafka_segment_fuzz(codec):
    from ape_dts_spark.sources import kafka_segment as ks

    msgs = [
        (f"k{k}".encode(), f"v{k}!".encode() * 3, {"h": b"x", "n": None})
        for k in range(8)
    ]
    blob = ks.encode_batch(msgs, 0, 1_700_000_000_000, compression=codec)
    blob += ks.encode_batch(msgs[:3], 8, 1_700_000_000_100, compression=codec)
    _fuzz(lambda b: ks.parse_segment_bytes(b, "t", 0), blob)
    # seek-path variant shares the decode but skips below the checkpoint
    _fuzz(lambda b: ks.parse_segment_bytes(b, "t", 0, start_offset=5), blob)


def test_kafka_segment_crc_and_length_guards():
    import struct

    from ape_dts_spark.sources import kafka_segment as ks

    blob = ks.encode_batch([(b"k", b"v", {})], 0, 1_700_000_000_000)
    # corrupt the batch length to a non-advancing value: must error, not hang
    bad = bytearray(blob)
    struct.pack_into(">i", bad, 8, -12)
    with pytest.raises(ValueError, match="batch length"):
        ks.parse_segment_bytes(bytes(bad))
    # flip one payload byte: CRC32C catches it
    bad = bytearray(blob)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="CRC32C"):
        ks.parse_segment_bytes(bytes(bad))
    # verify_crc=False still confines the damage to ValueError
    try:
        ks.parse_segment_bytes(bytes(bad), verify_crc=False)
    except ALLOWED:
        pass


def test_resp_stream_fuzz():
    from ape_dts_spark.sources.aof_manifest import encode_resp
    from ape_dts_spark.sources.redis import parse_resp_bytes

    blob = b"".join(
        encode_resp([c, f"key:{i}", "v" * (i % 5 + 1)])
        for i, c in enumerate(["SET", "HSET", "RPUSH", "DEL"] * 4)
    ) + b"PING\r\nSET inline value\r\n"
    _fuzz(parse_resp_bytes, blob)


def test_resp_negative_bulk_lengths():
    from ape_dts_spark.sources.redis import parse_resp_bytes

    # $-1 null bulk is legal and must not hang or crash
    assert parse_resp_bytes(b"*2\r\n$3\r\nGET\r\n$-1\r\n") == [["GET", ""]]
    with pytest.raises(ValueError, match="bulk length"):
        parse_resp_bytes(b"*1\r\n$-7\r\nxxxxxxx\r\n")


def test_aof_manifest_fuzz():
    from ape_dts_spark.sources.aof_manifest import parse_manifest

    text = (
        "file base.rdb seq 1 type b\n"
        "file incr_1.aof seq 1 type i\n"
        "file incr_2.aof seq 2 type i\n"
    )
    blob = text.encode()
    ok = parse_manifest(text)
    assert [t for _, _, t in ok] == ["b", "i", "i"]
    _fuzz(lambda b: parse_manifest(b.decode("utf-8", errors="replace")), blob)


def test_binlog_fuzz():
    """Binlog v4 files: truncation + flips confined to ValueError (CRC32
    catches most flips; header/length corruption must not escape as
    struct.error or hang)."""
    from ape_dts_spark.sources import binlog_file as bf

    t = bf.BinlogTable(
        "db", "t",
        (("id", bf.MYSQL_TYPE_LONG, 0), ("v", bf.MYSQL_TYPE_VARCHAR, 255),
         ("d", bf.MYSQL_TYPE_JSON, 4)),
        table_id=55,
    )
    tables = {("db", "t"): t}
    txns = [[
        (("db", "t"), "insert", None, {"id": 1, "v": "a", "d": '{"x":1}'}),
        (("db", "t"), "partial_update", {"id": 1, "v": "a", "d": '{"x":1}'},
         {"id": 1, "v": "b", "d": bf.JsonDiffs([(bf.DIFF_REPLACE, "$.x", 2)])}),
        (("db", "t"), "delete", {"id": 1, "v": "b", "d": '{"x":2}'}, None),
    ]]
    for wrap in (False, "zstd"):
        blob = bf.encode_binlog_file(txns, tables, "bin.000001", payload_wrap=wrap)
        _fuzz(lambda b: bf.parse_binlog_bytes(b, tables), blob, flip_stride=2)


def test_pgoutput_fuzz():
    from ape_dts_spark.sources import pgoutput_file as pg

    t = pg.PgTable("public", "t", (("id", 23, True), ("v", 25, False)), 16384)
    blob, _ = pg.encode_segment(
        [[
            (("public", "t"), "insert", None, {"id": "1", "v": "a"}),
            (("public", "t"), "update", {"id": "1", "v": "a"}, {"id": "1", "v": "b"}),
            (("public", "t"), "delete", {"id": "1", "v": "b"}, None),
        ]],
        {("public", "t"): t},
    )
    _fuzz(pg.parse_pgoutput_bytes, blob, flip_stride=2)


def test_oplog_fuzz():
    from ape_dts_spark.sources import bson_codec as bc
    from ape_dts_spark.sources import oplog_file as of

    entries = [
        {"ts": bc.Timestamp(1700000000, 1), "op": "i", "ns": "db.c",
         "o": {"_id": 1, "v": "a"}},
        {"ts": bc.Timestamp(1700000000, 2), "op": "u", "ns": "db.c",
         "o": {"$v": 2, "diff": {"u": {"v": "b"}}}, "o2": {"_id": 1}},
        {"ts": bc.Timestamp(1700000000, 3), "op": "d", "ns": "db.c",
         "o": {"_id": 1}},
    ]
    blob = b"".join(bc.encode_document(e) for e in entries)
    _fuzz(of.parse_oplog_bytes, blob, flip_stride=2)


def test_dump_payload_fuzz():
    """RESTORE/DUMP payloads (r15): truncations shift the CRC footer and
    byte flips break it or land inside the checked region — every mutation
    is confined to ValueError by the CRC/version/decoder guards."""
    from ape_dts_spark.sources import redis_rdb as rdb

    rows = [
        {"db_id": 0, "key": "h", "entry_type": "hash", "member": f"f{i}",
         "value": f"v{i}", "ord": i, "expire_ms": None}
        for i in range(4)
    ]
    _fuzz(lambda b: rdb.parse_dump_payload("h", b), rdb.dump_value(rows))


def test_orc_manifest_robustness(tmp_path):
    """orc_sequencer meta-dir damage matrix: corrupt/truncated JSON, missing
    fields, filename/body sequence disagreement, path-escaping or
    non-conforming data_file_name, missing data files, and a missing
    finished marker are all confined to ValueError naming the problem;
    non-conforming filenames and .tmp leftovers are skipped as non-commits
    — the merge never silently produces a wrong table."""
    import json
    import shutil

    import pytest

    from ape_dts_spark.sinks import orc_sequencer as oseq

    def fresh(name):
        root = tmp_path / name
        meta = root / "db" / "t" / "meta"
        meta.mkdir(parents=True)
        body = {
            "sequencer_id": 5, "push_epoch": 5, "push_sequence": 0,
            "schema": "db", "tb": "t",
            "data_file_name": "log_dml_0_0_u0.orc", "insert_only": True,
        }
        (meta / "0000000005_0000000000_log_dml_0_0_u0.json").write_text(
            json.dumps(body)
        )
        return root, meta, body

    # baseline parses
    root, meta, body = fresh("ok")
    assert len(oseq.read_manifest(str(root), "db", "t")) == 1

    # skipped non-commits: finished marker, crashed-rename .tmp, droppings
    (meta / "finished").write_text("")
    (meta / "0000000005_0000000001_log_dml_x.json.tmp").write_text("{")
    (meta / ".DS_Store").write_text("junk")
    assert len(oseq.read_manifest(str(root), "db", "t")) == 1
    assert len(oseq.read_manifest(str(root), "db", "t", require_finished=True)) == 1

    # missing finished marker with require_finished
    (meta / "finished").unlink()
    with pytest.raises(ValueError, match="finished"):
        oseq.read_manifest(str(root), "db", "t", require_finished=True)

    def expect(name, content, match):
        root, meta, _ = fresh(name)
        (meta / "0000000005_0000000001_log_dml_0_0_u1.json").write_text(content)
        with pytest.raises(ValueError, match=match):
            oseq.read_manifest(str(root), "db", "t")

    good = dict(body, push_sequence=1, data_file_name="log_dml_0_0_u1.orc")
    expect("trunc", json.dumps(good)[:20], "corrupt push meta")
    expect("notjson", "\xff\xfe not json", "corrupt push meta")
    expect("missing", json.dumps({"sequencer_id": 5}), "missing fields")
    expect("notdict", json.dumps([1, 2]), "missing fields")
    expect("strseq", json.dumps(dict(good, push_sequence="1")),
           "non-integer sequence")
    expect("disagree", json.dumps(dict(good, push_sequence=7)), "disagrees")
    expect("escape", json.dumps(dict(good, data_file_name="../../evil.orc")),
           "bad data_file_name")
    expect("notorc", json.dumps(dict(good, data_file_name="log_dml_0_0_u1.txt")),
           "bad data_file_name")
    expect("notpush", json.dumps(dict(good, data_file_name="other_u1.orc")),
           "bad data_file_name")

    # manifest names a data file that was never written -> merge refuses
    root, meta, _ = fresh("nodata")
    with pytest.raises(ValueError, match="missing push data"):
        from ape_dts_spark.session import get_spark

        oseq.merge_pushes(get_spark("t"), str(root), "db", "t", ["k"])

    # empty meta dir
    root = tmp_path / "empty"
    (root / "db" / "t" / "meta").mkdir(parents=True)
    with pytest.raises(ValueError, match="no pushed files"):
        from ape_dts_spark.session import get_spark

        oseq.merge_pushes(get_spark("t"), str(root), "db", "t", ["k"])
    shutil.rmtree(tmp_path, ignore_errors=True)
