"""Redis RDB dump parsing (at rest) + a deterministic writer.

Parses the binary RDB file format into the same typed entry rows the
RESP/AOF command path produces (sources/redis.py commands_to_entries ->
compact_entries): ``(db_id, key, entry_type, member, value, ord,
expire_ms)`` — completing the snapshot story next to the command-stream
path. The writer emits spec-conformant dumps (used as the fixture generator
for the gate and as a dump sink), exercising the compact encodings: int
strings, ziplist hashes, listpack/quicklist2 lists, ascii-score zsets,
intsets.

Scale shape: an RDB file is one node's serialized keyspace — an inherently
sequential byte stream — so the unit of parallelism is the FILE: one dump
per shard/node at scale, scanned with ``binaryFile`` and decoded inside an
Arrow-batched ``mapInPandas`` (each task parses whole files; no driver-side
byte handling).

Reference parity: dt-connector/src/extractor/redis/redis_psync_extractor.rs
streams this same format over PSYNC; the object decoders mirror
dt-connector/src/extractor/redis/rdb/** (ziplist/listpack/intset/quicklist
readers). Wire format per the public RDB specification.
"""

from __future__ import annotations

import os
import struct

from pyspark.sql import DataFrame, SparkSession

RDB_HEADER = b"REDIS0011"

# value-type ids (public RDB spec)
T_STRING = 0
T_LIST = 1
T_SET = 2
T_ZSET = 3
T_HASH = 4
T_HASH_ZIPMAP = 9
T_LIST_ZIPLIST = 10
T_SET_INTSET = 11
T_ZSET_ZIPLIST = 12
T_HASH_ZIPLIST = 13
T_LIST_QUICKLIST = 14
T_HASH_LISTPACK = 16
T_ZSET_LISTPACK = 17
T_LIST_QUICKLIST2 = 18
T_SET_LISTPACK = 20

OP_MODULE_AUX = 0xF7  # unsupported (module payloads are opaque) -> error
OP_IDLE = 0xF8  # LRU idle hint: length-encoded, skipped
OP_FREQ = 0xF9  # LFU frequency hint: 1 byte, skipped
OP_AUX = 0xFA
OP_RESIZEDB = 0xFB
OP_EXPIRETIME_MS = 0xFC
OP_EXPIRETIME = 0xFD
OP_SELECTDB = 0xFE
OP_EOF = 0xFF

ENTRY_SCHEMA = (
    "db_id long, key string, entry_type string, member string, value string, "
    "ord long, expire_ms long"
)


# ---------------------------------------------------------------------------
# primitive decoders
# ---------------------------------------------------------------------------


def _read_len(b: bytes, i: int) -> tuple[int, bool, int]:
    """Length encoding -> (value, is_special, next_i). Special = the 2 MSBs
    are 11: value is then the special-string-encoding id (int8/16/32/LZF)."""
    first = b[i]
    kind = first >> 6
    if kind == 0:
        return first & 0x3F, False, i + 1
    if kind == 1:
        return ((first & 0x3F) << 8) | b[i + 1], False, i + 2
    if first == 0x80:
        return struct.unpack_from(">I", b, i + 1)[0], False, i + 5
    if first == 0x81:
        return struct.unpack_from(">Q", b, i + 1)[0], False, i + 9
    if kind == 2:  # 0x82-0xBF: reserved — fail at the corruption point
        raise ValueError(f"unknown RDB length encoding byte 0x{first:02x}")
    return first & 0x3F, True, i + 1


def _lzf_decompress(data: bytes, expected: int) -> bytes:
    """LZF block decode (the only compression RDB string encoding uses)."""
    out = bytearray()
    i = 0
    while i < len(data):
        ctrl = data[i]
        i += 1
        if ctrl < 32:  # literal run of ctrl+1 bytes
            out += data[i : i + ctrl + 1]
            i += ctrl + 1
        else:  # back-reference
            length = ctrl >> 5
            if length == 7:
                length += data[i]
                i += 1
            ref = len(out) - ((ctrl & 0x1F) << 8) - data[i] - 1
            i += 1
            for _ in range(length + 2):
                out.append(out[ref])
                ref += 1
    if len(out) != expected:
        raise ValueError(f"LZF length mismatch: {len(out)} != {expected}")
    return bytes(out)


def _read_string(b: bytes, i: int) -> tuple[bytes, int]:
    n, special, i = _read_len(b, i)
    if not special:
        return b[i : i + n], i + n
    if n == 0:  # int8
        return str(struct.unpack_from("<b", b, i)[0]).encode(), i + 1
    if n == 1:  # int16
        return str(struct.unpack_from("<h", b, i)[0]).encode(), i + 2
    if n == 2:  # int32
        return str(struct.unpack_from("<i", b, i)[0]).encode(), i + 4
    if n == 3:  # LZF-compressed
        clen, _, i = _read_len(b, i)
        ulen, _, i = _read_len(b, i)
        return _lzf_decompress(b[i : i + clen], ulen), i + clen
    raise ValueError(f"unknown string special encoding {n}")


def _parse_ziplist(b: bytes) -> list[bytes]:
    """ziplist payload -> entries (each bytes). Layout: zlbytes(4LE)
    zltail(4LE) zllen(2LE) entries... 0xFF; entry = prevlen(1|5) enc data."""
    out: list[bytes] = []
    i = 10
    while i < len(b) and b[i] != 0xFF:
        i += 5 if b[i] == 0xFE else 1  # prevlen
        enc = b[i]
        top = enc >> 6
        if top == 0:
            n = enc & 0x3F
            out.append(b[i + 1 : i + 1 + n])
            i += 1 + n
        elif top == 1:
            n = ((enc & 0x3F) << 8) | b[i + 1]
            out.append(b[i + 2 : i + 2 + n])
            i += 2 + n
        elif top == 2:
            n = struct.unpack_from(">I", b, i + 1)[0]
            out.append(b[i + 5 : i + 5 + n])
            i += 5 + n
        elif enc == 0xC0:
            out.append(str(struct.unpack_from("<h", b, i + 1)[0]).encode())
            i += 3
        elif enc == 0xD0:
            out.append(str(struct.unpack_from("<i", b, i + 1)[0]).encode())
            i += 5
        elif enc == 0xE0:
            out.append(str(struct.unpack_from("<q", b, i + 1)[0]).encode())
            i += 9
        elif enc == 0xF0:  # int24 LE
            v = int.from_bytes(b[i + 1 : i + 4], "little", signed=True)
            out.append(str(v).encode())
            i += 4
        elif enc == 0xFE:  # int8
            out.append(str(struct.unpack_from("<b", b, i + 1)[0]).encode())
            i += 2
        elif 0xF1 <= enc <= 0xFD:  # immediate 0..12
            out.append(str((enc & 0x0F) - 1).encode())
            i += 1
        else:
            raise ValueError(f"bad ziplist encoding {enc:#x}")
    return out


def _lp_backlen_size(entry_len: int) -> int:
    for size, limit in ((1, 1 << 7), (2, 1 << 14), (3, 1 << 21), (4, 1 << 28)):
        if entry_len < limit:
            return size
    return 5


def _lp_backlen_bytes(used: int) -> bytes:
    """lpEncodeBacklen: 7-bit chunks, MSB chunk first (no flag), lower
    chunks carry the continuation bit — read right-to-left by Redis."""
    chunks = [used & 127]
    used >>= 7
    while used:
        chunks.append(used & 127)
        used >>= 7
    return bytes([chunks[-1], *[c | 128 for c in reversed(chunks[:-1])]])


def _parse_listpack(b: bytes) -> list[bytes]:
    """listpack payload -> entries. Layout: total(4LE) count(2LE) entries...
    0xFF; each entry is followed by its back-length bytes."""
    out: list[bytes] = []
    i = 6
    while i < len(b) and b[i] != 0xFF:
        e = b[i]
        if e < 0x80:  # 7-bit uint
            out.append(str(e).encode())
            used = 1
        elif e >> 6 == 0b10:  # 6-bit string length
            n = e & 0x3F
            out.append(b[i + 1 : i + 1 + n])
            used = 1 + n
        elif e >> 5 == 0b110:  # 13-bit signed int
            v = ((e & 0x1F) << 8) | b[i + 1]
            if v >= 1 << 12:
                v -= 1 << 13
            out.append(str(v).encode())
            used = 2
        elif e >> 4 == 0b1110:  # 12-bit string length
            n = ((e & 0x0F) << 8) | b[i + 1]
            out.append(b[i + 2 : i + 2 + n])
            used = 2 + n
        elif e == 0xF0:  # 32-bit string length
            n = struct.unpack_from("<I", b, i + 1)[0]
            out.append(b[i + 5 : i + 5 + n])
            used = 5 + n
        elif e == 0xF1:
            out.append(str(struct.unpack_from("<h", b, i + 1)[0]).encode())
            used = 3
        elif e == 0xF2:
            v = int.from_bytes(b[i + 1 : i + 4], "little", signed=True)
            out.append(str(v).encode())
            used = 4
        elif e == 0xF3:
            out.append(str(struct.unpack_from("<i", b, i + 1)[0]).encode())
            used = 5
        elif e == 0xF4:
            out.append(str(struct.unpack_from("<q", b, i + 1)[0]).encode())
            used = 9
        else:
            raise ValueError(f"bad listpack encoding {e:#x}")
        i += used + _lp_backlen_size(used)
    return out


def _parse_intset(b: bytes) -> list[bytes]:
    enc, n = struct.unpack_from("<II", b, 0)
    fmt = {2: "<h", 4: "<i", 8: "<q"}[enc]
    return [
        str(struct.unpack_from(fmt, b, 8 + k * enc)[0]).encode() for k in range(n)
    ]


def _read_ascii_double(b: bytes, i: int) -> tuple[str, int]:
    """ZSET (type 3) score: 1-byte length + ascii, with inf/nan specials."""
    n = b[i]
    if n == 255:
        return "-inf", i + 1
    if n == 254:
        return "inf", i + 1
    if n == 253:
        return "nan", i + 1
    return b[i + 1 : i + 1 + n].decode(), i + 1 + n


# ---------------------------------------------------------------------------
# object -> entry rows
# ---------------------------------------------------------------------------


def _pairs(flat: list[bytes]) -> list[tuple[bytes, bytes]]:
    return list(zip(flat[0::2], flat[1::2]))


def parse_rdb_bytes(data: bytes) -> list[dict]:
    """One RDB dump -> typed entry dicts ``(db_id, key, entry_type, member,
    value, ord, expire_ms)``; ord orders list elements, 0 elsewhere."""
    if data[:5] != b"REDIS":
        raise ValueError("not an RDB dump (missing REDIS header)")
    i = 9
    db_id = 0
    expire_ms: int | None = None
    out: list[dict] = []

    def emit(key: bytes, etype: str, member: bytes | None, value: bytes | None, ord_: int):
        # Redis keys/values are arbitrary byte strings; one binary (non-UTF-8)
        # value must not crash the whole distributed scan. errors='replace'
        # keeps valid UTF-8 text exact and degrades binary payloads to
        # U+FFFD markers (surrogateescape would be lossless but lone
        # surrogates are rejected by Arrow's string conversion in the
        # mapInPandas path); a fully binary-clean pipeline would switch
        # ENTRY_SCHEMA's key/member/value to BINARY columns
        d = lambda s: s.decode("utf-8", errors="replace")  # noqa: E731
        out.append(
            {
                "db_id": db_id,
                "key": d(key),
                "entry_type": etype,
                "member": None if member is None else d(member),
                "value": None if value is None else d(value),
                "ord": ord_,
                "expire_ms": expire_ms,
            }
        )

    while i < len(data):
        op = data[i]
        if op == OP_EOF:
            break
        if op == OP_SELECTDB:
            db_id, _, i = _read_len(data, i + 1)
            continue
        if op == OP_RESIZEDB:
            _, _, i = _read_len(data, i + 1)
            _, _, i = _read_len(data, i)
            continue
        if op == OP_AUX:
            _, i = _read_string(data, i + 1)
            _, i = _read_string(data, i)
            continue
        if op == OP_EXPIRETIME_MS:
            expire_ms = struct.unpack_from("<Q", data, i + 1)[0]
            i += 9
            continue
        if op == OP_EXPIRETIME:
            expire_ms = struct.unpack_from("<I", data, i + 1)[0] * 1000
            i += 5
            continue
        if op == OP_IDLE:
            _, _, i = _read_len(data, i + 1)
            continue
        if op == OP_FREQ:
            i += 2
            continue

        vtype = op
        key, i = _read_string(data, i + 1)
        if vtype == T_STRING:
            v, i = _read_string(data, i)
            emit(key, "string", None, v, 0)
        elif vtype in (T_LIST, T_SET):
            n, _, i = _read_len(data, i)
            etype = "list" if vtype == T_LIST else "set"
            for k in range(n):
                v, i = _read_string(data, i)
                if etype == "set":
                    emit(key, "set", v, None, 0)
                else:
                    emit(key, "list", None, v, k)
        elif vtype == T_ZSET:
            n, _, i = _read_len(data, i)
            for _ in range(n):
                member, i = _read_string(data, i)
                score, i = _read_ascii_double(data, i)
                emit(key, "zset", member, score.encode(), 0)
        elif vtype == T_HASH:
            n, _, i = _read_len(data, i)
            for _ in range(n):
                f_, i = _read_string(data, i)
                v, i = _read_string(data, i)
                emit(key, "hash", f_, v, 0)
        elif vtype in (T_LIST_ZIPLIST, T_HASH_ZIPLIST, T_ZSET_ZIPLIST):
            payload, i = _read_string(data, i)
            flat = _parse_ziplist(payload)
            if vtype == T_LIST_ZIPLIST:
                for k, v in enumerate(flat):
                    emit(key, "list", None, v, k)
            elif vtype == T_HASH_ZIPLIST:
                for f_, v in _pairs(flat):
                    emit(key, "hash", f_, v, 0)
            else:
                for m, s in _pairs(flat):
                    emit(key, "zset", m, s, 0)
        elif vtype in (T_HASH_LISTPACK, T_ZSET_LISTPACK, T_SET_LISTPACK):
            payload, i = _read_string(data, i)
            flat = _parse_listpack(payload)
            if vtype == T_HASH_LISTPACK:
                for f_, v in _pairs(flat):
                    emit(key, "hash", f_, v, 0)
            elif vtype == T_ZSET_LISTPACK:
                for m, s in _pairs(flat):
                    emit(key, "zset", m, s, 0)
            else:
                for m in flat:
                    emit(key, "set", m, None, 0)
        elif vtype == T_SET_INTSET:
            payload, i = _read_string(data, i)
            for m in _parse_intset(payload):
                emit(key, "set", m, None, 0)
        elif vtype in (T_LIST_QUICKLIST, T_LIST_QUICKLIST2):
            n_nodes, _, i = _read_len(data, i)
            k = 0
            for _ in range(n_nodes):
                if vtype == T_LIST_QUICKLIST2:
                    container, _, i = _read_len(data, i)
                else:
                    container = 2
                payload, i = _read_string(data, i)
                if container == 1:  # plain: the payload is one element
                    emit(key, "list", None, payload, k)
                    k += 1
                    continue
                # packed: ziplist (quicklist) or listpack (quicklist2)
                flat = (
                    _parse_listpack(payload)
                    if vtype == T_LIST_QUICKLIST2
                    else _parse_ziplist(payload)
                )
                for v in flat:
                    emit(key, "list", None, v, k)
                    k += 1
        else:
            raise ValueError(f"unsupported RDB value type {vtype}")
        expire_ms = None  # expiry applies to exactly one following key
    return out


# ---------------------------------------------------------------------------
# writer (fixture generator + dump sink)
# ---------------------------------------------------------------------------


def _enc_len(n: int) -> bytes:
    if n < 1 << 6:
        return bytes([n])
    if n < 1 << 14:
        return bytes([0x40 | (n >> 8), n & 0xFF])
    if n < 1 << 32:
        return b"\x80" + struct.pack(">I", n)
    return b"\x81" + struct.pack(">Q", n)


def _int_form(s: bytes) -> int | None:
    """The integer an RDB int encoding would round-trip to this exact text,
    or None (guards leading zeros / '-0' / non-digits)."""
    try:
        v = int(s)
    except ValueError:
        return None
    return v if str(v).encode() == s else None


def _enc_string(s: bytes) -> bytes:
    v = _int_form(s)
    if v is not None:
        if -(1 << 7) <= v < 1 << 7:
            return bytes([0xC0]) + struct.pack("<b", v)
        if -(1 << 15) <= v < 1 << 15:
            return bytes([0xC1]) + struct.pack("<h", v)
        if -(1 << 31) <= v < 1 << 31:
            return bytes([0xC2]) + struct.pack("<i", v)
    return _enc_len(len(s)) + s


def _enc_listpack(items: list[bytes]) -> bytes:
    body = bytearray()
    for s in items:
        v = _int_form(s)
        if v is not None and 0 <= v < 128:
            ent = bytes([v])
        elif v is not None and -(1 << 12) <= v < 1 << 12:
            u = v & 0x1FFF
            ent = bytes([0xC0 | (u >> 8), u & 0xFF])
        elif v is not None and -(1 << 15) <= v < 1 << 15:
            ent = b"\xf1" + struct.pack("<h", v)
        elif v is not None and -(1 << 63) <= v < 1 << 63:
            ent = b"\xf4" + struct.pack("<q", v)
        elif len(s) < 1 << 6:
            ent = bytes([0x80 | len(s)]) + s
        elif len(s) < 1 << 12:
            ent = bytes([0xE0 | (len(s) >> 8), len(s) & 0xFF]) + s
        else:
            ent = b"\xf0" + struct.pack("<I", len(s)) + s
        used = len(ent)
        # back-length in the real listpack form (lpEncodeBacklen): 7-bit
        # chunks, most-significant chunk first without the continuation bit,
        # lower chunks with bit 7 set, readable right-to-left — our parser
        # only skips by size, but real Redis' backward traversal validates
        # the chunk flags on load, so a dump sink must emit the real form
        body += ent + _lp_backlen_bytes(used)
    total = 6 + len(body) + 1
    return struct.pack("<IH", total, min(len(items), 0xFFFF)) + bytes(body) + b"\xff"


def _enc_ziplist(items: list[bytes]) -> bytes:
    body = bytearray()
    prevlen = 0
    for s in items:
        entry = bytearray()
        entry += bytes([prevlen]) if prevlen < 254 else b"\xfe" + struct.pack("<I", prevlen)
        v = _int_form(s)
        if v is not None and 0 <= v <= 12:
            entry += bytes([0xF1 + v])
        elif v is not None and -(1 << 7) <= v < 1 << 7:
            entry += b"\xfe" + struct.pack("<b", v)
        elif v is not None and -(1 << 15) <= v < 1 << 15:
            entry += b"\xc0" + struct.pack("<h", v)
        elif v is not None and -(1 << 31) <= v < 1 << 31:
            entry += b"\xd0" + struct.pack("<i", v)
        elif v is not None:
            entry += b"\xe0" + struct.pack("<q", v)
        elif len(s) < 1 << 6:
            entry += bytes([len(s)]) + s
        elif len(s) < 1 << 14:
            entry += bytes([0x40 | (len(s) >> 8), len(s) & 0xFF]) + s
        else:  # 32-bit form: 0x80 marker + 4-byte big-endian length
            entry += b"\x80" + struct.pack(">I", len(s)) + s
        prevlen = len(entry)
        body += entry
    zlbytes = 10 + len(body) + 1
    return struct.pack("<IIH", zlbytes, zlbytes - 1, min(len(items), 0xFFFF)) + bytes(body) + b"\xff"


def _enc_intset(values: list[int]) -> bytes:
    width = 8 if any(not -(1 << 31) <= v < 1 << 31 for v in values) else (
        4 if any(not -(1 << 15) <= v < 1 << 15 for v in values) else 2
    )
    fmt = {2: "<h", 4: "<i", 8: "<q"}[width]
    out = struct.pack("<II", width, len(values))
    for v in sorted(values):  # intsets are stored sorted
        out += struct.pack(fmt, v)
    return out


def encode_rdb(entries: list[dict]) -> bytes:
    """Entry rows (same shape parse_rdb_bytes emits) -> one RDB dump.

    Encoding choices mirror Redis' own thresholds in spirit (small containers
    -> compact encodings) while staying deterministic: hashes with <= 2
    fields become ziplists, zsets with <= 2 members become listpacks (else
    ascii-score T_ZSET), lists become quicklist2 with 4-element listpack
    nodes, all-integer sets become intsets (else set listpacks). Trailing
    checksum is written as 8 zero bytes ("no checksum", legal per spec)."""
    by_db: dict[int, dict[str, list[dict]]] = {}
    for e in entries:
        by_db.setdefault(int(e.get("db_id") or 0), {}).setdefault(e["key"], []).append(e)

    out = bytearray(RDB_HEADER)
    out += bytes([OP_AUX]) + _enc_string(b"redis-ver") + _enc_string(b"7.4.0")
    for db_id in sorted(by_db):
        keys = by_db[db_id]
        out += bytes([OP_SELECTDB]) + _enc_len(db_id)
        n_exp = sum(1 for rows in keys.values() if rows[0].get("expire_ms") is not None)
        out += bytes([OP_RESIZEDB]) + _enc_len(len(keys)) + _enc_len(n_exp)
        for key in sorted(keys):
            rows = keys[key]
            etype = rows[0]["entry_type"]
            exp = rows[0].get("expire_ms")
            if exp is not None:
                out += bytes([OP_EXPIRETIME_MS]) + struct.pack("<Q", int(exp))
            kb = key.encode()
            if etype == "string":
                out += bytes([T_STRING]) + _enc_string(kb) + _enc_string(rows[0]["value"].encode())
            elif etype == "hash":
                pairs = sorted((r["member"].encode(), r["value"].encode()) for r in rows)
                if len(pairs) <= 2:
                    flat = [x for p in pairs for x in p]
                    out += bytes([T_HASH_ZIPLIST]) + _enc_string(kb) + _enc_string(
                        _enc_ziplist(flat)
                    )
                else:
                    out += bytes([T_HASH]) + _enc_string(kb) + _enc_len(len(pairs))
                    for f_, v in pairs:
                        out += _enc_string(f_) + _enc_string(v)
            elif etype == "zset":
                pairs = sorted((r["member"].encode(), r["value"].encode()) for r in rows)
                if len(pairs) <= 2:
                    flat = [x for p in pairs for x in p]
                    out += bytes([T_ZSET_LISTPACK]) + _enc_string(kb) + _enc_string(
                        _enc_listpack(flat)
                    )
                else:
                    out += bytes([T_ZSET]) + _enc_string(kb) + _enc_len(len(pairs))
                    for m, s in pairs:
                        if len(s) > 252:  # 253/254/255 are the nan/inf markers
                            raise ValueError(f"zset score too long for ascii encoding: {len(s)}B")
                        out += _enc_string(m) + bytes([len(s)]) + s
            elif etype == "list":
                members = [r["value"].encode() for r in sorted(rows, key=lambda r: r["ord"])]
                nodes = [members[k : k + 4] for k in range(0, len(members), 4)]
                out += bytes([T_LIST_QUICKLIST2]) + _enc_string(kb) + _enc_len(len(nodes))
                for node in nodes:
                    out += _enc_len(2) + _enc_string(_enc_listpack(node))
                continue
            elif etype == "set":
                members = sorted(r["member"].encode() for r in rows)
                ints = [_int_form(m) for m in members]
                if all(v is not None for v in ints):
                    out += bytes([T_SET_INTSET]) + _enc_string(kb) + _enc_string(
                        _enc_intset([v for v in ints if v is not None])
                    )
                else:
                    out += bytes([T_SET_LISTPACK]) + _enc_string(kb) + _enc_string(
                        _enc_listpack(members)
                    )
                continue
            else:
                raise ValueError(f"unsupported entry_type {etype!r}")
    out += bytes([OP_EOF]) + b"\x00" * 8
    return bytes(out)


def read_rdb_files(spark: SparkSession, path: str) -> DataFrame:
    """Distributed RDB scan: ``binaryFile`` over a directory of dumps, one
    Arrow task per file (the per-node dump layout at scale)."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("content")

    def _parse(batches):
        for pdf in batches:
            for blob in pdf["content"]:
                rows = parse_rdb_bytes(bytes(blob))
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "db_id", "key", "entry_type", "member", "value", "ord", "expire_ms",
                    ],
                )

    return files.mapInPandas(_parse, schema=ENTRY_SCHEMA)


def write_rdb_file(entries: list[dict], path: str) -> str:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(encode_rdb(entries))
    os.replace(tmp, path)
    return path
