"""Minimal BSON encoder/decoder (the public BSON spec, bsonspec.org).

Covers the element types Mongo oplog entries actually use: double, string,
embedded document, array, binary, ObjectId, bool, UTC datetime, null,
int32, timestamp (Mongo's internal u32-increment/u32-seconds pair), int64.
Dict order is preserved both ways (BSON documents are ordered). Python
mapping:

===========  =============================================
BSON         Python
===========  =============================================
double 0x01  float
string 0x02  str
doc 0x03     dict
array 0x04   list
binary 0x05  Binary(bytes, subtype)
oid 0x07     ObjectId(12 bytes)
bool 0x08    bool
datetime     DateTime(ms since epoch)
null 0x0A    None
int32 0x10   int in [-2^31, 2^31)   (encode picks int32 when it fits)
ts 0x11      Timestamp(time, inc)
int64 0x12   int otherwise
===========  =============================================

Used by sources/oplog_file.py to read/write mongodump-style ``.bson`` files
(concatenated BSON documents — the public dump format). The reference
consumes the same documents through the mongodb driver
(dt-connector/src/extractor/mongo/mongo_cdc_extractor.rs:341-446).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass


@dataclass(frozen=True)
class Timestamp:
    """Mongo internal timestamp: (seconds, increment) — ordering key of the
    oplog (``ts`` field)."""

    time: int
    inc: int

    def sort_key(self) -> tuple:
        return (self.time, self.inc)


@dataclass(frozen=True)
class ObjectId:
    raw: bytes

    def __post_init__(self):
        if len(self.raw) != 12:
            raise ValueError("ObjectId must be 12 bytes")

    def hex(self) -> str:
        return self.raw.hex()


@dataclass(frozen=True)
class Binary:
    data: bytes
    subtype: int = 0


@dataclass(frozen=True)
class DateTime:
    """UTC datetime as ms since the Unix epoch (BSON 0x09)."""

    ms: int


@dataclass(frozen=True)
class Int64:
    """Forced int64 (BSON 0x12) even when the value fits int32 — the wire
    protocol requires 64-bit cursor ids in getMore/killCursors regardless of
    magnitude; plain ints keep the fits-int32 heuristic."""

    value: int


def _enc_element(name: str, v) -> bytes:
    key = name.encode() + b"\x00"
    if v is None:
        return b"\x0a" + key
    if isinstance(v, bool):  # before int (bool is an int subclass)
        return b"\x08" + key + (b"\x01" if v else b"\x00")
    if isinstance(v, float):
        return b"\x01" + key + struct.pack("<d", v)
    if isinstance(v, str):
        s = v.encode()
        return b"\x02" + key + struct.pack("<i", len(s) + 1) + s + b"\x00"
    if isinstance(v, dict):
        return b"\x03" + key + encode_document(v)
    if isinstance(v, list):
        return b"\x04" + key + encode_document({str(i): x for i, x in enumerate(v)})
    if isinstance(v, Binary):
        return b"\x05" + key + struct.pack("<iB", len(v.data), v.subtype) + v.data
    if isinstance(v, ObjectId):
        return b"\x07" + key + v.raw
    if isinstance(v, DateTime):
        return b"\x09" + key + struct.pack("<q", v.ms)
    if isinstance(v, Timestamp):
        return b"\x11" + key + struct.pack("<II", v.inc, v.time)
    if isinstance(v, Int64):
        return b"\x12" + key + struct.pack("<q", v.value)
    if isinstance(v, int):
        if -(1 << 31) <= v < (1 << 31):
            return b"\x10" + key + struct.pack("<i", v)
        return b"\x12" + key + struct.pack("<q", v)
    raise TypeError(f"unsupported BSON value type {type(v).__name__}")


def encode_document(doc: dict) -> bytes:
    body = b"".join(_enc_element(k, v) for k, v in doc.items())
    return struct.pack("<i", len(body) + 5) + body + b"\x00"


def _dec_element(b: bytes, i: int) -> tuple[str, object, int]:
    t = b[i]
    i += 1
    j = b.index(0, i)
    name = b[i:j].decode()
    i = j + 1
    if t == 0x01:
        return name, struct.unpack_from("<d", b, i)[0], i + 8
    if t == 0x02:
        (ln,) = struct.unpack_from("<i", b, i)
        return name, b[i + 4 : i + 3 + ln].decode(), i + 4 + ln
    if t == 0x03:
        doc, i2 = _dec_document(b, i)
        return name, doc, i2
    if t == 0x04:
        doc, i2 = _dec_document(b, i)
        return name, list(doc.values()), i2
    if t == 0x05:
        ln, sub = struct.unpack_from("<iB", b, i)
        return name, Binary(b[i + 5 : i + 5 + ln], sub), i + 5 + ln
    if t == 0x07:
        return name, ObjectId(b[i : i + 12]), i + 12
    if t == 0x08:
        return name, b[i] != 0, i + 1
    if t == 0x09:
        return name, DateTime(struct.unpack_from("<q", b, i)[0]), i + 8
    if t == 0x0A:
        return name, None, i
    if t == 0x10:
        return name, struct.unpack_from("<i", b, i)[0], i + 4
    if t == 0x11:
        inc, time = struct.unpack_from("<II", b, i)
        return name, Timestamp(time, inc), i + 8
    if t == 0x12:
        return name, struct.unpack_from("<q", b, i)[0], i + 8
    raise ValueError(f"unsupported BSON element type 0x{t:02x}")


def _dec_document(b: bytes, i: int) -> tuple[dict, int]:
    (total,) = struct.unpack_from("<i", b, i)
    end = i + total
    i += 4
    out: dict = {}
    while b[i] != 0:
        name, v, i = _dec_element(b, i)
        out[name] = v
    if i + 1 != end:
        raise ValueError("BSON document length mismatch")
    return out, end


def decode_document(b: bytes, i: int = 0) -> tuple[dict, int]:
    """Decode one document starting at offset ``i``; returns (doc, next_i)."""
    return _dec_document(b, i)


def iter_documents(b: bytes):
    """Iterate concatenated BSON documents (the mongodump ``.bson`` framing)."""
    i = 0
    while i < len(b):
        doc, i = _dec_document(b, i)
        yield doc


def to_jsonable(v):
    """BSON value -> JSON-compatible value (Timestamp -> {t, i}, ObjectId ->
    {'$oid': hex}, DateTime -> {'$date': ms}, Binary -> {'$binary': hex} —
    the extended-JSON-style renderings the existing mongo change model's
    string documents use)."""
    if isinstance(v, Timestamp):
        return {"t": v.time, "i": v.inc}
    if isinstance(v, ObjectId):
        return {"$oid": v.hex()}
    if isinstance(v, DateTime):
        return {"$date": v.ms}
    if isinstance(v, Binary):
        return {"$binary": v.data.hex(), "$type": v.subtype}
    if isinstance(v, dict):
        return {k: to_jsonable(x) for k, x in v.items()}
    if isinstance(v, list):
        return [to_jsonable(x) for x in v]
    return v
