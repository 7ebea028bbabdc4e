"""Redis 7 multi-part AOF directory (sources/aof_manifest.py): base RDB +
incr RESP compose to the same final state as replaying the full command
stream — the at-rest analogue of the reference's PSYNC full-resync shape
(RDB payload then command stream, redis_psync_extractor.rs).
"""

import os

import pytest
from pyspark.sql import functions as F

from ape_dts_spark.sources import aof_manifest as am
from ape_dts_spark.sources.redis import commands_to_entries, compact_entries


def test_encode_resp_and_manifest_parse():
    assert am.encode_resp(["SET", "k", "v1"]) == b"*3\r\n$3\r\nSET\r\n$1\r\nk\r\n$2\r\nv1\r\n"
    listing = am.parse_manifest(
        "file appendonly.aof.1.base.rdb seq 1 type b\n"
        "file appendonly.aof.1.incr.aof seq 1 type i\n"
        "file appendonly.aof.2.incr.aof seq 2 type i\n"
    )
    assert listing == [
        ("appendonly.aof.1.base.rdb", 1, "b"),
        ("appendonly.aof.1.incr.aof", 1, "i"),
        ("appendonly.aof.2.incr.aof", 2, "i"),
    ]


def test_manifest_missing_or_ambiguous(spark, tmp_path):
    with pytest.raises(ValueError, match="exactly one"):
        am.read_aof_manifest(spark, str(tmp_path))


def _final_state(df):
    rows = compact_entries(df).collect()
    out = {}
    for r in rows:
        k = (r["db_id"], r["key"])
        if r["entry_type"] == "string":
            out[k] = ("string", r["value"], r["expire"])
        elif r["entry_type"] == "list":
            cur = out.get(k, ("list", [], r["expire"]))
            out[k] = ("list", sorted(cur[1] + [(r["ord"], r["value"])]), r["expire"])
        else:
            cur = out.get(k, (r["entry_type"], {}, r["expire"]))
            cur[1][r["member"]] = r["value"]
            out[k] = (r["entry_type"], cur[1], r["expire"])
    # strip list ranks: final order only
    return {
        k: (t, [x[1] for x in v] if t == "list" else v, e)
        for k, (t, v, e) in out.items()
    }


def test_base_plus_incr_equals_full_replay(spark, tmp_path):
    """The composition law the format exists for: state(base ⊕ incr) ==
    state(full stream) — across strings, hash/set/zset members, list push
    order (LPUSH left of base, RPUSH right), DEL tombstones, TTL reset by
    SET, and a second incr chunk."""
    base_entries = [
        {"db_id": 0, "key": "s1", "entry_type": "string", "member": None,
         "value": "old", "ord": 0, "expire_ms": None},
        {"db_id": 0, "key": "s2", "entry_type": "string", "member": None,
         "value": "keep", "ord": 0, "expire_ms": 1_700_000_099_000},
        {"db_id": 0, "key": "h", "entry_type": "hash", "member": "f1",
         "value": "a", "ord": 0, "expire_ms": None},
        {"db_id": 0, "key": "h", "entry_type": "hash", "member": "f2",
         "value": "b", "ord": 0, "expire_ms": None},
        {"db_id": 0, "key": "L", "entry_type": "list", "member": None,
         "value": "m1", "ord": 0, "expire_ms": None},
        {"db_id": 0, "key": "L", "entry_type": "list", "member": None,
         "value": "m2", "ord": 1, "expire_ms": None},
        {"db_id": 0, "key": "gone", "entry_type": "string", "member": None,
         "value": "x", "ord": 0, "expire_ms": None},
    ]
    incr1 = [
        ["SET", "s1", "new"],          # overwrite base string (and reset TTL)
        ["HSET", "h", "f2", "B", "f3", "c"],  # member update + add
        ["LPUSH", "L", "m0"],          # left of base elements
        ["RPUSH", "L", "m3"],          # right of base elements
        ["DEL", "gone"],
    ]
    incr2 = [
        ["SADD", "tags", "x", "y"],
        ["PEXPIRE", "s1", "5000"],
    ]
    out = str(tmp_path / "appendonlydir")
    am.write_manifest_dir(base_entries, [incr1, incr2], out)
    assert sorted(os.listdir(out)) == [
        "appendonly.aof.1.base.rdb", "appendonly.aof.1.incr.aof",
        "appendonly.aof.2.incr.aof", "appendonly.aof.manifest",
    ]
    got = _final_state(am.read_aof_manifest(spark, out))

    # oracle: the same history as ONE flat command stream
    full = (
        [["SET", "s1", "old"],
         ["SET", "s2", "keep"], ["PEXPIREAT", "s2", "1700000099000"],
         ["HSET", "h", "f1", "a", "f2", "b"],
         ["RPUSH", "L", "m1", "m2"],
         ["SET", "gone", "x"]]
        + incr1 + incr2
    )
    lines = spark.createDataFrame(
        [(i, am.encode_resp(c).decode()) for i, c in enumerate(full)], "seq long, line string"
    )
    from ape_dts_spark.sources.redis import parse_resp_bytes

    cmds = spark.createDataFrame(
        [(i, parse_resp_bytes(am.encode_resp(c))[0]) for i, c in enumerate(full)],
        "seq long, argv array<string>",
    )
    want = _final_state(commands_to_entries(cmds))
    assert got == want
    assert got[(0, "L")][1] == ["m0", "m1", "m2", "m3"]
    assert got[(0, "s1")][2] == "PEXPIRE:5000"  # TTL reset by SET, re-set in incr2
    assert (0, "gone") not in got
    assert got[(0, "s2")][2] == "PEXPIREAT:1700000099000"  # base TTL survives


def test_expire_base_rendering(spark, tmp_path):
    base_entries = [{"db_id": 0, "key": "k", "entry_type": "string", "member": None,
                     "value": "v", "ord": 0, "expire_ms": 1_700_000_000_123}]
    out = str(tmp_path / "aofdir")
    am.write_manifest_dir(base_entries, [], out)
    ent = am.read_aof_manifest(spark, out, expire_base_ms=1_700_000_000_000)
    exp = [r for r in ent.collect() if r["rtype"] == "expire"]
    assert exp[0]["member"] == "PEXPIRE" and exp[0]["value"] == "123"
