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
