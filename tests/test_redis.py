"""Redis key/value change model: command-stream parse -> typed entries ->
key-state compaction -> command rewrite + RESP encode + slot partitioning —
the reference's PSYNC/RDB extract, RdbMerger-on-k/v, entry_rewriter and
reshard semantics (redis_psync_extractor.rs, entry_rewriter.rs:272-368,
cmd_encoder.rs:25-54, key_parser.rs:164-212) with zero wire code."""

from pyspark.sql import functions as F

from ape_dts_spark.sinks.redis import big_key_stats, resp_encode_col, state_to_commands
from ape_dts_spark.sources.redis import (
    SLOTS,
    commands_from_lines,
    commands_to_entries,
    compact_entries,
    key_slot,
    key_slot_col,
    parse_resp_bytes,
    partition_by_slot,
    read_resp_files,
)


def lines_df(spark, lines):
    return spark.createDataFrame(
        [(i, ln) for i, ln in enumerate(lines)], "seq long, line string"
    )


def state_of(spark, lines, **kw):
    entries = commands_to_entries(commands_from_lines(lines_df(spark, lines)), **kw)
    return compact_entries(entries)


def rows_set(df, *cols):
    return {tuple(r[c] for c in cols) for r in df.collect()}


# ---------------------------------------------------------------- slots ----


def test_key_slot_reference_vectors():
    # the reference's own CLUSTER KEYSLOT test vectors (key_parser.rs:223-234),
    # including multibyte keys (hashed as UTF-8 bytes)
    vectors = {
        "somekey": 11058,
        "中文": 13257,
        "foo{hash_tag}": 2515,
        "bar{hash_tag}": 2515,
        "aaaaa{hash_tag}aaaaa": 2515,
        "中文{hash_tag}set_key_3_  😀": 2515,
    }
    for key, slot in vectors.items():
        assert key_slot(key) == slot, key
    # empty hash tag falls back to the whole key (key_parser.rs:197-201)
    assert key_slot("a{}{b}") == key_slot("a{}{b}".encode())


def test_key_slot_col_matches_python(spark):
    keys = ["somekey", "foo{hash_tag}", "bar{hash_tag}", "a{}{b}", "user:123", "x"]
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    got = {r["key"]: r["slot"] for r in df.select("key", key_slot_col(F.col("key")).alias("slot")).collect()}
    assert got == {k: key_slot(k) for k in keys}


def test_partition_by_slot(spark):
    df = spark.createDataFrame([(f"user:{i}",) for i in range(200)], "key string")
    out = partition_by_slot(df, n_nodes=4)
    assert out.rdd.getNumPartitions() == 4
    rows = out.collect()
    assert len(rows) == 200
    for r in rows:
        assert r["node"] == r["slot"] * 4 // SLOTS


# ----------------------------------------------------------- RESP parse ----


def test_parse_resp_roundtrip_and_inline():
    buf = (
        b"*3\r\n$3\r\nSET\r\n$5\r\nk{a}1\r\n$2\r\nv1\r\n"
        b"PING\r\n"  # inline command between arrays
        b"*2\r\n$3\r\nDEL\r\n$4\r\nkey2\r\n"
    )
    assert parse_resp_bytes(buf) == [["SET", "k{a}1", "v1"], ["PING"], ["DEL", "key2"]]


def test_read_resp_files(spark, tmp_path):
    p = tmp_path / "a.aof"
    p.write_bytes(b"*3\r\n$3\r\nSET\r\n$2\r\nk1\r\n$2\r\nv1\r\n*2\r\n$3\r\nDEL\r\n$2\r\nk1\r\n")
    df = read_resp_files(spark, str(tmp_path))
    rows = sorted((r["seq"], list(r["argv"])) for r in df.collect())
    assert rows == [(0, ["SET", "k1", "v1"]), (1, ["DEL", "k1"])]


# ------------------------------------------------- entries + compaction ----


def test_select_db_tracking(spark):
    lines = ["SET a 1", "SELECT 3", "SET b 2", "SELECT 0", "SET c 3"]
    entries = commands_to_entries(commands_from_lines(lines_df(spark, lines)), track_select=True)
    got = {r["key"]: r["db_id"] for r in entries.collect()}
    assert got == {"a": 0, "b": 3, "c": 0}


def test_variadic_shapes(spark):
    lines = ["DEL a b c", "HSET h f1 1 f2 2", "ZADD z 1.5 m1 2.5 m2", "LPUSH l x y"]
    entries = commands_to_entries(commands_from_lines(lines_df(spark, lines)))
    dels = rows_set(entries.filter(F.col("rtype") == "del"), "key")
    assert dels == {("a",), ("b",), ("c",)}
    hset = rows_set(entries.filter(F.col("entry_type") == "hash"), "member", "value")
    assert hset == {("f1", "1"), ("f2", "2")}
    zadd = rows_set(entries.filter(F.col("entry_type") == "zset"), "member", "value")
    assert zadd == {("m1", "1.5"), ("m2", "2.5")}
    lpush = rows_set(entries.filter(F.col("entry_type") == "list"), "value", "pos")
    assert lpush == {("x", -1), ("y", -2)}


def test_compact_key_lifecycle(spark):
    state = state_of(
        spark,
        [
            "SET a 1", "DEL a", "SET a 2",          # del then revive
            "SET b 1", "DEL b",                      # stays dead
            "HSET h f1 1 f2 2", "HDEL h f1",         # member delete
            "SADD s m1 m2", "SREM s m1",
        ],
    )
    got = rows_set(state, "key", "entry_type", "member", "value")
    assert got == {
        ("a", "string", None, "2"),
        ("h", "hash", "f2", "2"),
        ("s", "set", "m2", None),
    }


def test_set_clears_ttl_and_del_overwrites_containers(spark):
    state = state_of(
        spark,
        [
            "SET a 1", "PEXPIRE a 5000", "SET a 2",   # SET after expire clears TTL
            "SET b 1", "PEXPIRE b 9000",              # TTL survives
            "HSET h f 1", "DEL h", "SET h now-string",  # container -> DEL -> string
        ],
    )
    rows = {r["key"]: r for r in state.collect()}
    assert rows["a"]["expire"] is None
    assert rows["b"]["expire"] == "PEXPIRE:9000"
    assert rows["h"]["entry_type"] == "string" and rows["h"]["value"] == "now-string"


def test_flushdb_tombstone(spark):
    state = state_of(spark, ["SET a 1", "HSET h f 1", "FLUSHDB", "SET b 2"])
    assert rows_set(state, "key", "value") == {("b", "2")}


def test_list_order_reconstruction(spark):
    # LPUSH a; RPUSH b; LPUSH c  ->  c a b (each LPUSH lands further left)
    state = state_of(spark, ["LPUSH l a", "RPUSH l b", "LPUSH l c"])
    ordered = [r["value"] for r in state.orderBy("ord").collect()]
    assert ordered == ["c", "a", "b"]


# ----------------------------------------------------------- rewriting ----


def test_state_to_commands_and_resp(spark):
    state = state_of(spark, ["SET k1 v1", "PEXPIRE k1 6000", "ZADD z 1.5 m"])
    cmds = state_to_commands(state)
    by_inline = {r["inline"]: r for r in cmds.collect()}
    assert set(by_inline) == {"SET k1 v1", "PEXPIRE k1 6000", "ZADD z 1.5 m"}
    assert by_inline["SET k1 v1"]["resp"] == "*3\r\n$3\r\nSET\r\n$2\r\nk1\r\n$2\r\nv1\r\n"
    # PEXPIRE ordered after its key's data row
    assert by_inline["PEXPIRE k1 6000"]["ord"] > by_inline["SET k1 v1"]["ord"]
    # RESP output re-parses to the original argv (encoder/parser roundtrip)
    for r in by_inline.values():
        assert parse_resp_bytes(r["resp"].encode()) == [list(r["cmd"])]


def test_resp_encode_col_matches_parser(spark):
    df = spark.createDataFrame([(["HSET", "h{tag}", "f", "v"],)], "argv array<string>")
    resp = df.select(resp_encode_col(F.col("argv")).alias("r")).collect()[0]["r"]
    assert parse_resp_bytes(resp.encode()) == [["HSET", "h{tag}", "f", "v"]]


def test_big_key_stats(spark):
    state = state_of(spark, ["SET small 1", "HSET big f1 aaaaaaaaaa f2 bbbbbbbbbb"])
    top = big_key_stats(state, top_n=1).collect()
    assert len(top) == 1 and top[0]["key"] == "big" and top[0]["n_members"] == 2
    assert top[0]["est_bytes"] == len("big") + 2 * (2 + 10)


# ---------------------------------------------------------------------------
# RDB binary dump parsing (sources/redis_rdb.py)
# ---------------------------------------------------------------------------


def _rt(entries):
    from ape_dts_spark.sources import redis_rdb as rdb

    parsed = rdb.parse_rdb_bytes(rdb.encode_rdb(entries))
    key = lambda e: (e["db_id"], e["key"], e["entry_type"], e["member"], e["value"], e["ord"])  # noqa: E731
    return sorted(map(key, parsed)), sorted(map(key, entries))


def test_rdb_round_trip_every_family():
    def e(key, etype, member=None, value=None, ord_=0, db=0, exp=None):
        return {"db_id": db, "key": key, "entry_type": etype, "member": member,
                "value": value, "ord": ord_, "expire_ms": exp}

    entries = [
        e("s1", "string", value="60.00", exp=1_700_000_060_000),
        e("s2", "string", value="-42"),  # int-encoded string
        e("h2", "hash", "c0", "1.50"),   # ziplist hash (<=2 fields)
        e("h2", "hash", "c1", "7"),
    ]
    entries += [e("h4", "hash", f"f{i}", str(i * 1000)) for i in range(2)]
    entries += [e("h4", "hash", f"g{i}", "x" * 70) for i in range(3)]  # plain hash, 14-bit len
    entries += [e("L", "list", value=f"e{i}", ord_=i) for i in range(9)]  # 3 listpack nodes
    entries += [e("z2", "zset", "u1", "9.75")]  # zset listpack
    entries += [e("z3", "zset", f"m{i}", f"{i}.5") for i in range(3)]  # ascii-score plain zset
    entries += [e("ints", "set", str(v)) for v in (-70000, -5, 0, 12, 40000)]  # intset -> int32
    entries += [e("mixed", "set", m, db=1) for m in ("abc", "007", "15")]  # '007' stays text
    got, want = _rt(entries)
    assert got == want


def test_rdb_expire_round_trip_and_reset():
    from ape_dts_spark.sources import redis_rdb as rdb

    entries = [
        {"db_id": 0, "key": "a", "entry_type": "string", "member": None, "value": "1", "ord": 0, "expire_ms": 1_700_000_060_000},
        {"db_id": 0, "key": "b", "entry_type": "string", "member": None, "value": "2", "ord": 0, "expire_ms": None},
    ]
    parsed = {e["key"]: e["expire_ms"] for e in rdb.parse_rdb_bytes(rdb.encode_rdb(entries))}
    assert parsed == {"a": 1_700_000_060_000, "b": None}  # expiry must not leak to b


def test_rdb_parser_only_paths():
    """Paths real Redis emits that our writer doesn't: LZF strings, legacy
    plain/ziplist containers, quicklist(14), plain quicklist2 nodes, 0xFD
    second-resolution expiry."""
    import struct

    from ape_dts_spark.sources import redis_rdb as rdb

    payload = b"ab" * 40  # compressible
    comp = bytearray()
    # hand-rolled LZF: literal 'ab' then a max-offset back-reference run
    comp += bytes([1]) + b"ab"  # ctrl<32: literal of 2 bytes
    # back-ref: length 78 -> ctrl len bits 7 + ext (78-2-7)=69, offset 1
    comp += bytes([(7 << 5) | 0, 78 - 2 - 7, 1])
    assert rdb._lzf_decompress(bytes(comp), 80) == payload

    out = bytearray(rdb.RDB_HEADER)
    out += bytes([rdb.OP_SELECTDB, 0])
    # LZF-encoded string value: special len 3, clen, ulen
    out += bytes([rdb.T_STRING]) + rdb._enc_string(b"lzf")
    out += bytes([0xC3]) + rdb._enc_len(len(comp)) + rdb._enc_len(80) + bytes(comp)
    # 0xFD expiry (seconds) on a legacy plain list (type 1)
    out += bytes([rdb.OP_EXPIRETIME]) + struct.pack("<I", 1_700_000_000)
    out += bytes([rdb.T_LIST]) + rdb._enc_string(b"plainlist") + rdb._enc_len(2)
    out += rdb._enc_string(b"x") + rdb._enc_string(b"y")
    # list as ziplist (type 10) with int24 + immediate entries
    zl = rdb._enc_ziplist([b"5", b"100000"])
    out += bytes([rdb.T_LIST_ZIPLIST]) + rdb._enc_string(b"zlist") + rdb._enc_string(zl)
    # quicklist (type 14): one ziplist node
    out += bytes([rdb.T_LIST_QUICKLIST]) + rdb._enc_string(b"ql") + rdb._enc_len(1)
    out += rdb._enc_string(rdb._enc_ziplist([b"a", b"b"]))
    # quicklist2 with a PLAIN node (container=1)
    out += bytes([rdb.T_LIST_QUICKLIST2]) + rdb._enc_string(b"ql2") + rdb._enc_len(1)
    out += rdb._enc_len(1) + rdb._enc_string(b"solo")
    # zset ziplist (type 12)
    out += bytes([rdb.T_ZSET_ZIPLIST]) + rdb._enc_string(b"zz") + rdb._enc_string(
        rdb._enc_ziplist([b"m1", b"3.5"])
    )
    out += bytes([rdb.OP_EOF]) + b"\x00" * 8

    got = {
        (e["key"], e["entry_type"], e["member"], e["value"], e["ord"], e["expire_ms"])
        for e in rdb.parse_rdb_bytes(bytes(out))
    }
    assert got == {
        ("lzf", "string", None, payload.decode(), 0, None),
        ("plainlist", "list", None, "x", 0, 1_700_000_000_000),
        ("plainlist", "list", None, "y", 1, 1_700_000_000_000),
        ("zlist", "list", None, "5", 0, None),
        ("zlist", "list", None, "100000", 1, None),
        ("ql", "list", None, "a", 0, None),
        ("ql", "list", None, "b", 1, None),
        ("ql2", "list", None, "solo", 0, None),
        ("zz", "zset", "m1", "3.5", 0, None),
    }


def test_rdb_distributed_read(spark, tmp_path):
    from ape_dts_spark.sources import redis_rdb as rdb

    for node in range(2):
        rdb.write_rdb_file(
            [{"db_id": 0, "key": f"n{node}", "entry_type": "string", "member": None,
              "value": str(node), "ord": 0, "expire_ms": None}],
            str(tmp_path / f"node{node}.rdb"),
        )
    got = {(r["key"], r["value"]) for r in rdb.read_rdb_files(spark, str(tmp_path)).collect()}
    assert got == {("n0", "0"), ("n1", "1")}


def test_rdb_idle_freq_hints_skipped():
    import struct

    from ape_dts_spark.sources import redis_rdb as rdb

    out = bytearray(rdb.RDB_HEADER)
    out += bytes([rdb.OP_SELECTDB, 0])
    out += bytes([rdb.OP_IDLE]) + rdb._enc_len(12345)  # LRU hint before the key
    out += bytes([rdb.T_STRING]) + rdb._enc_string(b"a") + rdb._enc_string(b"1")
    out += bytes([rdb.OP_FREQ, 42])  # LFU hint
    out += bytes([rdb.OP_EXPIRETIME_MS]) + struct.pack("<Q", 5_000)
    out += bytes([rdb.T_STRING]) + rdb._enc_string(b"b") + rdb._enc_string(b"2")
    out += bytes([rdb.OP_EOF]) + b"\x00" * 8
    got = {(e["key"], e["value"], e["expire_ms"]) for e in rdb.parse_rdb_bytes(bytes(out))}
    assert got == {("a", "1", None), ("b", "2", 5_000)}


def test_rdb_round_trip_large_values():
    """>=16 KiB strings exercise the 4-byte ziplist length form and the
    multi-chunk listpack back-length; binary payloads must not crash the
    parse (degraded to replacement chars, not an exception)."""
    from ape_dts_spark.sources import redis_rdb as rdb

    big = "x" * 20_000
    entries = [
        {"db_id": 0, "key": "h", "entry_type": "hash", "member": "f",
         "value": big, "ord": 0, "expire_ms": None},
        {"db_id": 0, "key": "l", "entry_type": "list", "member": None,
         "value": "y" * 300, "ord": 0, "expire_ms": None},
        {"db_id": 0, "key": "s", "entry_type": "string", "member": None,
         "value": big * 3, "ord": 0, "expire_ms": None},
    ]
    parsed = {e["key"]: e["value"] for e in rdb.parse_rdb_bytes(rdb.encode_rdb(entries))}
    assert parsed["h"] == big
    assert parsed["l"] == "y" * 300
    assert parsed["s"] == big * 3


def test_rdb_listpack_backlen_is_chunked():
    """The written back-length must be the real lpEncodeBacklen form (7-bit
    chunks, continuation bits on the low chunks) — real Redis validates it
    on load even though our parser only skips by size."""
    from ape_dts_spark.sources import redis_rdb as rdb

    assert rdb._lp_backlen_bytes(5) == bytes([5])
    assert rdb._lp_backlen_bytes(202) == bytes([202 >> 7, (202 & 127) | 128])
    assert rdb._lp_backlen_bytes(20000) == bytes(
        [20000 >> 14, ((20000 >> 7) & 127) | 128, (20000 & 127) | 128]
    )


def test_rdb_invalid_length_byte_raises():
    from ape_dts_spark.sources import redis_rdb as rdb
    import pytest as _pytest

    with _pytest.raises(ValueError, match="length encoding"):
        rdb._read_len(bytes([0x83, 0, 0]), 0)


# -- Redis Stream + Module2 RDB objects (stream_parser.rs, module2_parser.rs)


def _stream_fixture_rows(n_streams=2, n_entries=8):
    """Deterministic stream keyspace: multi-listpack chunking, samefields
    and per-entry-fields branches, planted XDELed entries, XSETID last-id,
    one consumer group with two consumers' PELs."""
    rows = []
    for s in range(n_streams):
        key = f"stream:{s}"
        for j in range(n_entries):
            ms = 1_700_000_000_000 + s * 1000 + j * 13
            sid = f"{ms}-{j % 4}"
            et = "stream_deleted" if j % 5 == 4 else "stream"
            fields = ["a", "b", "c"] if j % 7 == 3 else ["a", "b"]
            for k, f in enumerate(fields):
                rows.append({"db_id": 0, "key": key, "entry_type": et,
                             "member": f"{sid}:{f}", "value": f"{s}.{j}.{k}",
                             "ord": k, "expire_ms": None})
        last = f"{1_700_000_000_000 + s * 1000 + (n_entries - 1) * 13}-{(n_entries - 1) % 4}"
        rows.append({"db_id": 0, "key": key, "entry_type": "stream_meta",
                     "member": "last_id", "value": last, "ord": 0, "expire_ms": None})
        rows.append({"db_id": 0, "key": key, "entry_type": "stream_group",
                     "member": "g0", "value": f"{1_700_000_000_000 + s * 1000 + 3 * 13}-3",
                     "ord": 0, "expire_ms": None})
        for k, j in enumerate((5, 6)):
            ms = 1_700_000_000_000 + s * 1000 + j * 13
            rows.append({"db_id": 0, "key": key, "entry_type": "stream_pel",
                         "member": "g0:c0", "value": f"{ms}-{j % 4}@{1_700_000_000_000 + j}/{1 + j % 3}",
                         "ord": k, "expire_ms": None})
        ms2 = 1_700_000_000_000 + s * 1000 + 2 * 13
        rows.append({"db_id": 0, "key": key, "entry_type": "stream_pel",
                     "member": "g0:c1", "value": f"{ms2}-2@1700000000002/2",
                     "ord": 0, "expire_ms": None})
    return rows


def _visible(rows):
    return sorted(
        (r["key"], r["entry_type"], r["member"], r["value"], r["ord"])
        for r in rows if r["entry_type"] != "stream_deleted"
    )


def test_rdb_stream_round_trip_all_versions():
    """Stream objects survive encode->parse under all three RDB stream
    framings (RDB_TYPE_STREAM_LISTPACKS 15/19/21); XDELed entries are
    serialized but never replayed (stream_parser.rs:83-89)."""
    from ape_dts_spark.sources import redis_rdb as rdb

    rows = _stream_fixture_rows()
    for ver in (1, 2, 3):
        back = rdb.parse_rdb_bytes(rdb.encode_rdb(rows, stream_version=ver))
        assert _visible(back) == _visible(rows), f"stream v{ver} mismatch"


def test_rdb_stream_empty():
    """An empty stream is just its last-id (the reference's XADD-MAXLEN-0 +
    XSETID pair collapses to the stream_meta row in the state model)."""
    from ape_dts_spark.sources import redis_rdb as rdb

    rows = [{"db_id": 0, "key": "es", "entry_type": "stream_meta",
             "member": "last_id", "value": "1700000000123-7", "ord": 0, "expire_ms": None}]
    back = rdb.parse_rdb_bytes(rdb.encode_rdb(rows))
    assert back == [{"db_id": 0, "key": "es", "entry_type": "stream_meta",
                     "member": "last_id", "value": "1700000000123-7", "ord": 0,
                     "expire_ms": None}]


def test_rdb_stream_hand_built_listpack():
    """Parser-only path: a hand-assembled v2 stream with a samefields entry,
    a per-entry-fields entry and a deleted entry in ONE listpack — the exact
    element walk stream_parser.rs:36-90 performs."""
    import struct

    from ape_dts_spark.sources import redis_rdb as rdb

    m_ms, m_seq = 1_600_000_000_000, 5
    elements = [
        b"2", b"1", b"2", b"f1", b"f2", b"0",          # master: count deleted nfields fields 0
        b"2", b"0", b"0", b"va", b"vb", b"5",          # samefields live entry @ (m_ms, m_seq)
        b"1", b"10", b"-3", b"1", b"fx", b"vx", b"6",  # deleted entry @ (+10, -3)
        b"0", b"20", b"1", b"1", b"g", b"h", b"7",     # per-entry-fields live @ (+20, +1)
    ]
    out = bytearray(rdb.RDB_HEADER)
    out += bytes([rdb.OP_SELECTDB, 0])
    out += bytes([rdb.T_STREAM_LISTPACKS_2]) + rdb._enc_string(b"hs")
    out += rdb._enc_len(1)  # one listpack
    out += rdb._enc_string(struct.pack(">qq", m_ms, m_seq))
    out += rdb._enc_string(rdb._enc_listpack(elements))
    out += rdb._enc_len(2)  # total live
    out += rdb._enc_len(m_ms + 20) + rdb._enc_len(m_seq + 1)  # last id
    for _ in range(5):  # first ms/seq, max-deleted ms/seq, entries-added
        out += rdb._enc_len(0)
    out += rdb._enc_len(0)  # no groups
    out += bytes([rdb.OP_EOF]) + b"\x00" * 8

    back = rdb.parse_rdb_bytes(bytes(out))
    sid0 = f"{m_ms}-{m_seq}"
    sid2 = f"{m_ms + 20}-{m_seq + 1}"
    assert [(r["entry_type"], r["member"], r["value"], r["ord"]) for r in back] == [
        ("stream", f"{sid0}:f1", "va", 0),
        ("stream", f"{sid0}:f2", "vb", 1),
        ("stream", f"{sid2}:g", "h", 0),
        ("stream_meta", "last_id", sid2, 0),
    ]


def test_rdb_module2_and_aux_skip():
    """Module2 values skip via the self-describing opcode walk and keep a
    named audit row; keyless module-aux sections likewise; module v1 bails
    exactly like module2_parser.rs:19-24."""
    from ape_dts_spark.sources import redis_rdb as rdb

    rows = [
        {"db_id": 0, "key": "mod:1", "entry_type": "module_skipped",
         "member": "Tst-Modu1", "value": None, "ord": 0, "expire_ms": None},
        {"db_id": 0, "key": "k1", "entry_type": "string", "member": None,
         "value": "v1", "ord": 0, "expire_ms": None},
    ]
    back = rdb.parse_rdb_bytes(rdb.encode_rdb(rows, module_aux=["AuxModNam"]))
    kinds = {(r["entry_type"], r["member"]) for r in back}
    assert ("module_skipped", "Tst-Modu1") in kinds
    assert ("module_aux_skipped", "AuxModNam") in kinds
    assert ("string", None) in kinds

    import pytest as _pytest

    v1 = (rdb.RDB_HEADER + bytes([rdb.OP_SELECTDB, 0])
          + bytes([rdb.T_MODULE]) + rdb._enc_string(b"m1")
          + bytes([rdb.OP_EOF]) + b"\x00" * 8)
    with _pytest.raises(ValueError, match="module type v1"):
        rdb.parse_rdb_bytes(v1)


def test_rdb_module_name_id_roundtrip():
    from ape_dts_spark.sources import redis_rdb as rdb

    for name in ("Tst-Modu1", "AAAAAAAAA", "zzzzzzzz_", "9-_abcXYZ"):
        assert rdb._module_name(rdb._module_id(name, version=2)) == name


def test_rdb_slot_info_opcode_skipped():
    """Redis 7.4 RDB_OPCODE_SLOT_INFO (0xF4) carries 3 lengths and no key
    (rdb_parser.rs:60-64)."""
    from ape_dts_spark.sources import redis_rdb as rdb

    out = bytearray(rdb.RDB_HEADER)
    out += bytes([rdb.OP_SELECTDB, 0])
    out += bytes([rdb.OP_SLOT_INFO]) + rdb._enc_len(100) + rdb._enc_len(5) + rdb._enc_len(0)
    out += bytes([rdb.T_STRING]) + rdb._enc_string(b"k") + rdb._enc_string(b"v")
    out += bytes([rdb.OP_EOF]) + b"\x00" * 8
    back = rdb.parse_rdb_bytes(bytes(out))
    assert [(r["key"], r["value"]) for r in back] == [("k", "v")]


def test_rdb_stream_corruption_confined_to_valueerror():
    """Every truncation point and every flipped byte of a stream+module dump
    must either parse or raise ValueError — never IndexError/struct.error
    (the media-codec robustness contract applied to the RDB family)."""
    from ape_dts_spark.sources import redis_rdb as rdb

    rows = _stream_fixture_rows(n_streams=1, n_entries=6)
    rows.append({"db_id": 0, "key": "mod:1", "entry_type": "module_skipped",
                 "member": "Tst-Modu1", "value": None, "ord": 0, "expire_ms": None})
    blob = rdb.encode_rdb(rows, module_aux=["AuxModNam"])
    for n in range(len(blob)):
        try:
            rdb.parse_rdb_bytes(blob[:n])
        except ValueError:
            pass
    for i in range(len(blob)):
        mutated = bytearray(blob)
        mutated[i] ^= 0x01
        try:
            rdb.parse_rdb_bytes(bytes(mutated))
        except ValueError:
            pass


def test_stream_state_to_commands(spark):
    """Stream state rows rewrite to the reference's exact replay commands
    (XADD with ord-ordered field pairs, XSETID, XGROUP CREATE, XCLAIM ...
    JUSTID FORCE) — and a replay sorted by ord is valid: adds, then setid,
    then groups, then claims."""
    from ape_dts_spark.sinks.redis import state_to_commands

    rows = [
        (0, "st", "stream", "100-1:b", "vb", 1, None),
        (0, "st", "stream", "100-1:a", "va", 0, None),
        (0, "st", "stream", "90-0:a", "x", 0, None),
        (0, "st", "stream_meta", "last_id", "120-0", 0, None),
        (0, "st", "stream_group", "g0", "100-1", 0, None),
        (0, "st", "stream_pel", "g0:c0", "100-1@1234/5", 0, None),
        (0, "k", "string", None, "v", 0, None),
    ]
    state = spark.createDataFrame(
        rows, "db_id long, key string, entry_type string, member string, "
              "value string, ord long, expire string"
    )
    got = {r["ord"]: r["inline"] for r in state_to_commands(state).filter(
        F.col("key") == "st").collect()}
    assert got == {
        0: "XADD st 90-0 a x",
        1: "XADD st 100-1 a va b vb",
        2_000_000: "XSETID st 120-0",
        2_000_001: "XGROUP CREATE st g0 100-1",
        3_001_000: "XCLAIM st g0 c0 0 100-1 TIME 1234 RETRYCOUNT 5 JUSTID FORCE",
    }
    plain = [r["inline"] for r in state_to_commands(state).filter(
        F.col("key") == "k").collect()]
    assert plain == ["SET k v"]


def test_rdb_hash_field_ttl_all_formats():
    """Redis 7.4 per-field hash TTLs (HEXPIRE; RDB types 22-25 — breadth
    past the reference, whose decoder stops at 21): all four wire formats
    round-trip to identical 'hash_ex' rows with absolute field expiries;
    GA metadata delta-encodes against minExpire, listpack-ex stores
    (field, value, ttl) triples."""
    from ape_dts_spark.sources import redis_rdb as rdb

    base = 1_700_000_000_000
    rows = [
        {"db_id": 0, "key": "hx", "entry_type": "hash_ex", "member": f"f{f}",
         "value": f"v{f}", "ord": 0,
         "expire_ms": None if f % 2 else base + f * 1000}
        for f in range(5)
    ]
    want = sorted((r["member"], r["value"], r["expire_ms"]) for r in rows)
    for fmt in ("listpackex", "metadata", "listpackex_pre_ga", "metadata_pre_ga"):
        back = rdb.parse_rdb_bytes(rdb.encode_rdb(rows, hash_field_ttl=fmt))
        got = sorted((r["member"], r["value"], r["expire_ms"]) for r in back)
        assert got == want, fmt
        assert all(r["entry_type"] == "hash_ex" for r in back)
    # no key-level 0xFC is written for hash_ex (TTLs are per field)
    blob = rdb.encode_rdb(rows, hash_field_ttl="metadata")
    assert rdb.OP_EXPIRETIME_MS not in blob[: blob.index(b"hx")]
    # corruption fuzz: same ValueError confinement as every other type
    for n in range(len(blob)):
        try:
            rdb.parse_rdb_bytes(blob[:n])
        except ValueError:
            pass
    for i in range(len(blob)):
        m = bytearray(blob)
        m[i] ^= 0x01
        try:
            rdb.parse_rdb_bytes(bytes(m))
        except ValueError:
            pass


def test_hash_ex_state_to_commands(spark):
    """Redis 7.4 field TTLs replay as HSET + HPEXPIRE ... FIELDS 1 <f>
    (never a key-level PEXPIRE)."""
    from ape_dts_spark.sinks.redis import state_to_commands

    rows = [
        (0, "hx", "hash_ex", "f0", "v0", 0, "PEXPIRE:5000"),
        (0, "hx", "hash_ex", "f1", "v1", 0, None),
    ]
    state = spark.createDataFrame(
        rows, "db_id long, key string, entry_type string, member string, "
              "value string, ord long, expire string"
    )
    got = sorted(r["inline"] for r in state_to_commands(state).collect())
    assert got == [
        "HPEXPIRE hx 5000 FIELDS 1 f0",
        "HSET hx f0 v0",
        "HSET hx f1 v1",
    ]


def test_xadd_xsetid_command_path(spark):
    """Streams in the command/AOF path: XADD rows land in the same
    (stream, 'id:field') / (stream_meta, 'last_id') families the RDB
    decoder emits; MAXLEN/NOMKSTREAM arguments are skipped to the explicit
    id; '*' auto-ids surface as precheck 'unknown' rows; XSETID is
    last-writer; DEL tombstones the stream; the sinker round-trips the
    compacted state back to XADD/XSETID."""
    from ape_dts_spark.sinks.redis import state_to_commands

    lines = [
        "XADD st 100-1 a va b vb",
        "XADD st MAXLEN ~ 1000 101-0 a x",
        "XADD st 101-0 a y",            # same id+field: last-writer wins
        "XSETID st 99-9",
        "XSETID st 200-0",               # last XSETID wins
        "XADD auto * f v",               # server-assigned id: not replayable
        "XADD gone 5-5 k v",
        "DEL gone",
    ]
    state = state_of(spark, lines)
    rows = {(r["entry_type"], r["member"]): r["value"] for r in state.collect()}
    assert rows == {
        ("stream", "100-1:a"): "va",
        ("stream", "100-1:b"): "vb",
        ("stream", "101-0:a"): "y",
        ("stream_meta", "last_id"): "200-0",
    }
    cmds = sorted(
        r["inline"]
        for r in state_to_commands(
            spark.createDataFrame(
                [(0, "st", e, m, v, 0, None) for (e, m), v in rows.items()],
                "db_id long, key string, entry_type string, member string, "
                "value string, ord long, expire string",
            )
        ).collect()
    )
    assert cmds == [
        "XADD st 100-1 a va b vb",
        "XADD st 101-0 a y",
        "XSETID st 200-0",
    ]
    # the '*' XADD surfaced for precheck instead of silently vanishing
    entries = commands_to_entries(commands_from_lines(lines_df(spark, lines)))
    unk = entries.filter(F.col("rtype") == "unknown").collect()
    assert [(r["key"], r["member"]) for r in unk] == [("auto", "XADD")]


def test_xdel_command_path(spark):
    """XDEL tombstones every field of the named entry ids without knowing
    the fields; an XADD re-adding a deleted id survives (Redis replay
    order); XSETID and other entries are untouched."""
    lines = [
        "XADD st 100-1 a va b vb",
        "XADD st 101-0 a x",
        "XDEL st 100-1 555-5",
        "XADD st 100-1 a re",       # re-added after the delete: survives
        "XADD st 102-0 c z",
        "XDEL st 102-0",
        "XSETID st 102-0",
    ]
    rows = {
        (r["entry_type"], r["member"]): r["value"]
        for r in state_of(spark, lines).collect()
    }
    assert rows == {
        ("stream", "100-1:a"): "re",
        ("stream", "101-0:a"): "x",
        ("stream_meta", "last_id"): "102-0",
    }


# ---------------------------------------------------------------------------
# DUMP / RESTORE mode (entry_rewriter.rs:347-396, redis_sinker.rs:143-147)
# ---------------------------------------------------------------------------


def test_crc64_jones_vectors():
    """Table generated from the reflected Jones polynomial must match the
    published check value and an independent bitwise implementation."""
    from ape_dts_spark.sources.redis_rdb import crc64_jones

    assert crc64_jones(b"") == 0
    assert crc64_jones(b"123456789") == 0xE9C6D914C4B8D9CA  # CRC-64/Jones check

    def bitwise(data: bytes) -> int:  # no table: fold one bit at a time
        crc = 0
        for b in data:
            crc ^= b
            for _ in range(8):
                crc = (crc >> 1) ^ (0x95AC9329AC4BC9B5 if crc & 1 else 0)
        return crc

    for v in (b"abc", b"\x00" * 16, bytes(range(256)), b"redis DUMP"):
        assert crc64_jones(v) == bitwise(v)
    # streaming: crc(a+b) == crc(b, seeded with crc(a))
    assert crc64_jones(b"world", crc64_jones(b"hello ")) == crc64_jones(b"hello world")


def test_dump_value_round_trip_every_family():
    from ape_dts_spark.sources import redis_rdb as rdb

    def e(key, etype, member=None, value=None, ord_=0, exp=None):
        return {"db_id": 0, "key": key, "entry_type": etype, "member": member,
                "value": value, "ord": ord_, "expire_ms": exp}

    cases = {
        "s": [e("s", "string", value="hello")],
        "h": [e("h", "hash", f"f{i}", f"v{i}") for i in range(3)],
        "z": [e("z", "zset", f"m{i}", f"{i}.5") for i in range(3)],
        "L": [e("L", "list", value=f"x{i}", ord_=i) for i in range(6)],
        "si": [e("si", "set", str(v)) for v in (1, 2, 300000)],
        "hx": [e("hx", "hash_ex", "f0", "v0", exp=1_700_000_001_000),
               e("hx", "hash_ex", "f1", "v1")],
        "mod": [e("mod", "module_skipped", "RefModNam")],
    }
    # a stream with two fields per entry and an XDELed one
    st = []
    for j in range(5):
        sid = f"{1_700_000_000_000 + j * 13}-{j % 2}"
        et = "stream_deleted" if j == 3 else "stream"
        for k, fld in enumerate("ab"):
            st.append(e("st", et, f"{sid}:{fld}", f"v{j}.{k}", ord_=k))
    st.append(e("st", "stream_meta", "last_id", f"{1_700_000_000_000 + 4 * 13}-0"))
    cases["st"] = st

    for key, rows in cases.items():
        payload = rdb.dump_value(rows)
        # footer: LE u16 RDB version 6, LE u64 CRC-64/Jones of the prefix
        assert payload[-10:-8] == b"\x06\x00"
        assert int.from_bytes(payload[-8:], "little") == rdb.crc64_jones(payload[:-8])
        back = rdb.parse_dump_payload(key, payload)
        got = sorted((r["key"], r["entry_type"], r["member"], r["value"], r["ord"],
                      r["expire_ms"]) for r in back)
        # XDELed stream entries are serialized but never replayed; module2
        # values come back as the skip-audit row
        want = sorted((r["key"], r["entry_type"], r["member"], r["value"], r["ord"],
                       r["expire_ms"]) for r in rows
                      if r["entry_type"] not in ("module_skipped", "stream_deleted"))
        if key == "mod":  # module2 values come back as the skip-audit row
            assert [(r["key"], r["entry_type"]) for r in back] == [("mod", "module_skipped")]
        else:
            assert got == want, key


def test_dump_payload_rejects_corruption():
    import pytest

    from ape_dts_spark.sources import redis_rdb as rdb

    rows = [{"db_id": 0, "key": "k", "entry_type": "string", "member": None,
             "value": "abc", "ord": 0, "expire_ms": None}]
    payload = rdb.dump_value(rows)
    # golden bytes, hand-derivable: 00=T_STRING, 03+"abc", 0600=version, CRC
    assert payload.hex() == "000361626306004f4158bdb4279e71"
    with pytest.raises(ValueError, match="CRC"):
        rdb.parse_dump_payload("k", payload[:-1] + bytes([payload[-1] ^ 0xFF]))
    with pytest.raises(ValueError, match="CRC"):  # truncation shifts the footer
        rdb.parse_dump_payload("k", payload[:-1])
    with pytest.raises(ValueError, match="too short"):
        rdb.parse_dump_payload("k", payload[:8])
    # future RDB version: CRC fixed up, version check must still refuse
    body = payload[:-10] + (99).to_bytes(2, "little")
    bad = body + rdb.crc64_jones(body).to_bytes(8, "little")
    with pytest.raises(ValueError, match="version"):
        rdb.parse_dump_payload("k", bad)


def test_state_to_restore_commands(spark):
    from ape_dts_spark.sinks.redis import state_to_restore_commands
    from ape_dts_spark.sources import redis_rdb as rdb
    from ape_dts_spark.sources.redis import parse_resp_bytes

    rows = [
        (0, "s:1", "string", None, "hello", 0, None),
        (0, "s:2", "string", None, "42", 0, "PEXPIRE:60000"),
        (0, "h:1", "hash", "f0", "v0", 0, None),
        (0, "h:1", "hash", "f1", "v1", 1, None),
        (0, "h:1", "hash", "f2", "v2", 2, None),
        (1, "L:1", "list", None, "a", 0, None),
        (1, "L:1", "list", None, "b", 1, None),
        (0, "hx:1", "hash_ex", "f0", "v0", 0, "HPEXPIRE:1700000001000"),
    ]
    df = spark.createDataFrame(
        rows,
        "db_id long, key string, entry_type string, member string, "
        "value string, ord long, expire string",
    )
    out = {r["key"]: r for r in state_to_restore_commands(df).collect()}
    assert len(out) == 5
    # one RESTORE per key; TTL arg mirrors the entry's expire ms, 0 if none
    assert out["s:2"]["ttl_ms"] == 60000 and out["s:1"]["ttl_ms"] == 0
    assert out["hx:1"]["ttl_ms"] == 0  # hash_ex TTLs ride inside the payload
    for key, r in out.items():
        assert r["cmd"][0] == "RESTORE" and r["cmd"][-1] == "REPLACE"
        assert r["payload_len"] == len(r["payload_hex"]) // 2
        back = rdb.parse_dump_payload(key, bytes.fromhex(r["payload_hex"]),
                                      db_id=r["db_id"])
        want = sorted((w[2], w[3], w[4]) for w in rows if w[1] == key)
        assert sorted((b["entry_type"], b["member"], b["value"]) for b in back) == want
        # RESP rendering parses back to the same argv
        parsed = parse_resp_bytes(r["resp"].encode())
        assert parsed == [list(r["cmd"])]
    # hash_ex field TTL survives the payload
    hx = rdb.parse_dump_payload("hx:1", bytes.fromhex(out["hx:1"]["payload_hex"]))
    assert {b["member"]: b["expire_ms"] for b in hx} == {"f0": 1_700_000_001_000}
    # version < 3.0 drops REPLACE
    old = state_to_restore_commands(df, redis_version=2.8).collect()
    assert all(r["cmd"][-1] != "REPLACE" for r in old)


def test_restore_round_trip_through_rdb_file(tmp_path):
    """A whole RDB file's keyspace, re-serialized as DUMP payloads, decodes
    back to the file parser's own rows — the two serialization paths
    (file writer, RESTORE sinker) agree via encode_value."""
    from ape_dts_spark.sources import redis_rdb as rdb

    entries = [
        {"db_id": 0, "key": "a", "entry_type": "string", "member": None,
         "value": "60.00", "ord": 0, "expire_ms": 1_700_000_060_000},
        {"db_id": 0, "key": "b", "entry_type": "set", "member": "x", "value": None,
         "ord": 0, "expire_ms": None},
        {"db_id": 0, "key": "b", "entry_type": "set", "member": "y", "value": None,
         "ord": 0, "expire_ms": None},
    ]
    parsed = rdb.parse_rdb_bytes(rdb.encode_rdb(entries))
    by_key: dict[str, list[dict]] = {}
    for r in parsed:
        by_key.setdefault(r["key"], []).append(r)
    for key, rows in by_key.items():
        back = rdb.parse_dump_payload(key, rdb.dump_value(rows))
        strip = lambda r: {k: v for k, v in r.items() if k != "expire_ms"}  # noqa: E731
        assert sorted(map(str, map(strip, back))) == sorted(map(str, map(strip, rows)))


def test_rdb_file_checksum():
    """encode_rdb writes a real CRC-64/Jones footer (r15); the parser
    verifies non-zero footers, accepts the legal all-zero 'disabled' form,
    and reports a mismatch as ValueError."""
    import pytest

    from ape_dts_spark.sources import redis_rdb as rdb

    entries = [
        {"db_id": 0, "key": "k", "entry_type": "string", "member": None,
         "value": "v1", "ord": 0, "expire_ms": None},
        {"db_id": 0, "key": "h", "entry_type": "hash", "member": "f",
         "value": "w", "ord": 0, "expire_ms": None},
    ]
    blob = rdb.encode_rdb(entries)
    assert blob[-8:] != b"\x00" * 8
    assert int.from_bytes(blob[-8:], "little") == rdb.crc64_jones(blob[:-8])
    assert len(rdb.parse_rdb_bytes(blob)) == 2

    legacy = rdb.encode_rdb(entries, checksum=False)
    assert legacy[-8:] == b"\x00" * 8
    assert rdb.parse_rdb_bytes(legacy) == rdb.parse_rdb_bytes(blob)

    # flip a payload byte: the checksum catches what the decoder might not
    mut = bytearray(blob)
    mut[15] ^= 0x01
    with pytest.raises(ValueError):
        rdb.parse_rdb_bytes(bytes(mut))
