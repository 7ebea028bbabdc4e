"""Avro BINARY wire format for change events — no jar required.

Reference: the Kafka sinker/extractor speak Avro binary with a fixed envelope
schema (dt-common/src/meta/avro/avro_converter_schema.rs:129-141, encode
avro_converter.rs:56-181, decode :183-236). The spark-avro package (to_avro/
from_avro) is the idiomatic JVM path but its jar cannot be fetched in this
offline container, so this module implements the Avro 1.x binary encoding
itself (spec: zigzag-varint longs, length-prefixed utf8 strings, union index
prefix, record = fields in order, double = 8-byte LE IEEE) and runs it as an
Arrow-batched ``mapInPandas`` kernel.

Envelope record (a faithful re-shape of the reference's):
  { schema: string, tb: string, operation: string,
    before: union(null, Payload), after: union(null, Payload),
    seq: long, ts_ms: union(null, long), origin_node: union(null, string),
    ddl: union(null, string) }
Payload is a record derived from the Spark payload StructType; every field is
union(null, T). Supported primitives: long/int, double/float, string,
boolean, bytes; timestamps ride as micros-since-epoch longs (Avro
timestamp-micros logical type), decimals as strings (exact, portable).

Scale note: a per-row Python codec is the slow path relative to JVM to_avro —
but it is Arrow-batched (no row-at-a-time Python UDF), partition-local (no
shuffle), and drop-in replaceable by to_avro/from_avro where the jar exists.

Known coercion: NaN double values decode as NULL — pandas uses NaN as its
missing-value sentinel, so the Python->Arrow hop on the decode side cannot
represent a non-null NaN (the JVM to_avro/from_avro path preserves NaN).
"""

from __future__ import annotations

import struct as _struct
from collections.abc import Iterator
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# -- schema mapping ---------------------------------------------------------


def _avro_primitive(dt: T.DataType) -> str:
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return "long"
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return "double"
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, T.BinaryType):
        return "bytes"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"  # long micros on the wire
    if isinstance(dt, T.DecimalType):
        return "decimal"  # string on the wire (exact)
    if isinstance(dt, T.StringType):
        return "string"
    raise ValueError(f"unsupported payload type for avro wire: {dt.simpleString()}")


def payload_avro_fields(payload: T.StructType) -> list[tuple[str, str]]:
    return [(f.name, _avro_primitive(f.dataType)) for f in payload.fields]


# -- primitive writers/readers (Avro spec binary encoding) ------------------


def _w_long(buf: bytearray, n: int) -> None:
    # zigzag then 7-bit little-endian varint (Avro spec)
    z = ((n << 1) ^ (n >> 63)) & ((1 << 64) - 1)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


def _r_long(mv: memoryview, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = mv[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    # undo zigzag
    return (acc >> 1) ^ -(acc & 1), pos


def _w_bytes(buf: bytearray, b: bytes) -> None:
    _w_long(buf, len(b))
    buf.extend(b)


def _r_bytes(mv: memoryview, pos: int) -> tuple[bytes, int]:
    n, pos = _r_long(mv, pos)
    return bytes(mv[pos : pos + n]), pos + n


def _w_str(buf: bytearray, s: str) -> None:
    _w_bytes(buf, s.encode("utf-8"))


def _r_str(mv: memoryview, pos: int) -> tuple[str, int]:
    b, pos = _r_bytes(mv, pos)
    return b.decode("utf-8"), pos


def _w_double(buf: bytearray, x: float) -> None:
    buf.extend(_struct.pack("<d", x))


def _r_double(mv: memoryview, pos: int) -> tuple[float, int]:
    return _struct.unpack_from("<d", mv, pos)[0], pos + 8


def _w_value(buf: bytearray, kind: str, v) -> None:
    # timestamps/decimals were converted JVM-side (unix_micros / cast string)
    # BEFORE reaching this kernel — Python never interprets timezone or scale
    if kind in ("long", "timestamp"):
        _w_long(buf, int(v))
    elif kind == "double":
        _w_double(buf, float(v))
    elif kind == "boolean":
        buf.append(1 if v else 0)
    elif kind == "bytes":
        _w_bytes(buf, bytes(v))
    else:  # string / decimal-as-string
        _w_str(buf, str(v))


def _r_value(mv: memoryview, pos: int, kind: str):
    if kind in ("long", "timestamp"):
        return _r_long(mv, pos)
    if kind == "double":
        return _r_double(mv, pos)
    if kind == "boolean":
        return bool(mv[pos]), pos + 1
    if kind == "bytes":
        return _r_bytes(mv, pos)
    return _r_str(mv, pos)


def _w_nullable(buf: bytearray, kind: str, v) -> None:
    """union [null, T]: branch index then value."""
    if v is None or (isinstance(v, float) and v != v and kind != "double"):
        _w_long(buf, 0)
    else:
        _w_long(buf, 1)
        _w_value(buf, kind, v)


def _r_nullable(mv: memoryview, pos: int, kind: str):
    idx, pos = _r_long(mv, pos)
    if idx == 0:
        return None, pos
    return _r_value(mv, pos, kind)


# -- envelope encode/decode -------------------------------------------------


def _encode_row(row: dict, fields: list[tuple[str, str]]) -> bytes:
    buf = bytearray()
    _w_str(buf, row["schema"] or "")
    _w_str(buf, row["tb"] or "")
    _w_str(buf, row["row_type"] or "")
    for image in ("before", "after"):
        img = row.get(image)
        if img is None:
            _w_long(buf, 0)
        else:
            _w_long(buf, 1)
            for name, kind in fields:
                _w_nullable(buf, kind, img.get(name))
    _w_long(buf, int(row["seq"]))
    _w_nullable(buf, "timestamp", row.get("ts_us"))
    _w_nullable(buf, "string", row.get("origin_node"))
    _w_nullable(buf, "string", row.get("ddl"))
    return bytes(buf)


def _decode_row(b: bytes, fields: list[tuple[str, str]]) -> dict:
    mv = memoryview(b)
    pos = 0
    out: dict = {}
    out["schema"], pos = _r_str(mv, pos)
    out["tb"], pos = _r_str(mv, pos)
    out["row_type"], pos = _r_str(mv, pos)
    for image in ("before", "after"):
        idx, pos = _r_long(mv, pos)
        if idx == 0:
            out[image] = None
        else:
            img = {}
            for name, kind in fields:
                img[name], pos = _r_nullable(mv, pos, kind)
            out[image] = img
    out["seq"], pos = _r_long(mv, pos)
    out["ts_us"], pos = _r_nullable(mv, pos, "timestamp")
    out["origin_node"], pos = _r_nullable(mv, pos, "string")
    out["ddl"], pos = _r_nullable(mv, pos, "string")
    return out


def _wire_struct_type(payload: T.StructType) -> T.StructType:
    """Payload type as carried on the wire (timestamps as micros longs,
    decimals as strings) — converted back after decode."""
    fields = []
    for f in payload.fields:
        kind = _avro_primitive(f.dataType)
        if kind == "timestamp":
            dt: T.DataType = T.LongType()
        elif kind == "decimal":
            dt = T.StringType()
        elif kind == "long":
            dt = T.LongType()
        elif kind == "double":
            dt = T.DoubleType()
        elif kind == "boolean":
            dt = T.BooleanType()
        elif kind == "bytes":
            dt = T.BinaryType()
        else:
            dt = T.StringType()
        fields.append(T.StructField(f.name, dt))
    return T.StructType(fields)


def envelope_avro_schema_json(payload: T.StructType) -> str:
    """The Avro schema (JSON) this module's binary wire format implements —
    THE swap contract with the JVM path: ``to_avro(struct(*wire_projection
    (df)), envelope_avro_schema_json(payload))`` must produce byte-identical
    values to ``encode_events_avro`` (same field order, same [null, T] union
    branch order, zigzag varints / utf8 / LE doubles per the Avro spec), and
    ``from_avro`` with the same schema reads this module's bytes. Verified by
    the jar-gated test in tests/test_avro.py where spark-avro is present."""
    import json

    prim = {"timestamp": "long", "decimal": "string"}
    payload_fields = [
        {"name": name, "type": ["null", prim.get(kind, kind)]}
        for name, kind in payload_avro_fields(payload)
    ]
    record = {
        "type": "record",
        "name": "ChangeEvent",
        "fields": [
            {"name": "schema", "type": "string"},
            {"name": "tb", "type": "string"},
            {"name": "row_type", "type": "string"},
            {
                "name": "before",
                "type": ["null", {"type": "record", "name": "Payload", "fields": payload_fields}],
            },
            {"name": "after", "type": ["null", "Payload"]},
            {"name": "seq", "type": "long"},
            {"name": "ts_us", "type": ["null", "long"]},
            {"name": "origin_node", "type": ["null", "string"]},
            {"name": "ddl", "type": ["null", "string"]},
        ],
    }
    return json.dumps(record)


def wire_projection(df: DataFrame) -> list:
    """The envelope's wire columns in schema order (timestamps as unix
    micros, decimals as canonical strings, JVM-side) — shared by the Python
    codec and the to_avro swap path."""
    payload: T.StructType = df.schema["after"].dataType  # type: ignore[assignment]
    fields = payload_avro_fields(payload)

    def img(image: str):
        parts = []
        for name, kind in fields:
            src = F.col(f"{image}.{name}")
            if kind == "timestamp":
                src = F.unix_micros(src)
            elif kind == "decimal":
                src = src.cast("string")
            parts.append(src.alias(name))
        return F.when(F.col(image).isNotNull(), F.struct(*parts)).alias(image)

    return [
        F.col("schema"), F.col("tb"), F.col("row_type"),
        img("before"), img("after"), F.col("seq"),
        (F.unix_micros(F.col("ts")) if "ts" in df.columns else F.lit(None).cast("long")).alias("ts_us"),
        (F.col("origin_node") if "origin_node" in df.columns else F.lit(None).cast("string")).alias("origin_node"),
        (F.col("ddl") if "ddl" in df.columns else F.lit(None).cast("string")).alias("ddl"),
    ]


def encode_events_avro(df: DataFrame) -> DataFrame:
    """Change events -> (key string, value binary) rows in Avro binary.
    Column contract matches wire_format.encode_events (minus topic routing —
    compose with topic_for upstream if needed). Timestamps/decimals are
    converted to their wire types (unix micros / canonical string) JVM-side
    so the Python kernel handles only timezone-free primitives."""
    payload: T.StructType = df.schema["after"].dataType  # type: ignore[assignment]
    fields = payload_avro_fields(payload)
    wire_cols = wire_projection(df)

    def _enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys, vals = [], []
            for row in pdf.to_dict("records"):
                for image in ("before", "after"):
                    img_v = row.get(image)
                    if img_v is not None and not isinstance(img_v, dict):
                        # pandas renders a missing struct as None/NaN
                        row[image] = None if isinstance(img_v, float) else dict(img_v)
                keys.append(f"{row['schema']}.{row['tb']}")
                vals.append(_encode_row(row, fields))
            yield pd.DataFrame({"key": keys, "value": vals})

    return df.select(*wire_cols).mapInPandas(_enc, schema="key string, value binary")


def decode_events_avro(df: DataFrame, payload: T.StructType, value_col: str = "value") -> DataFrame:
    """Avro binary rows -> canonical change DataFrame (the extractor's round
    trip). Timestamps/decimals are rebuilt from their wire encodings."""
    fields = payload_avro_fields(payload)
    wire_t = _wire_struct_type(payload)
    out_schema = T.StructType(
        [
            T.StructField("schema", T.StringType()),
            T.StructField("tb", T.StringType()),
            T.StructField("row_type", T.StringType()),
            T.StructField("before", wire_t),
            T.StructField("after", wire_t),
            T.StructField("seq", T.LongType()),
            T.StructField("ts_us", T.LongType()),
            T.StructField("origin_node", T.StringType()),
            T.StructField("ddl", T.StringType()),
        ]
    )

    def _dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_decode_row(b, fields) for b in pdf[value_col]]
            yield pd.DataFrame(rows)

    decoded = df.select(value_col).mapInPandas(_dec, schema=out_schema)
    # rebuild engine types from their wire encodings
    out = decoded
    for image in ("before", "after"):
        img_fields = []
        for f, (name, kind) in zip(payload.fields, fields):
            src = F.col(f"{image}.{name}")
            if kind == "timestamp":
                src = F.timestamp_micros(src)
            elif kind == "decimal":
                src = src.cast(f.dataType)
            img_fields.append(src.alias(name))
        out = out.withColumn(
            image, F.when(F.col(image).isNotNull(), F.struct(*img_fields))
        )
    return out.select(
        "schema", "tb", "row_type", "before", "after", "seq",
        F.timestamp_micros(F.col("ts_us")).alias("ts"), "origin_node", "ddl",
    )


def roundtrip_avro(df: DataFrame) -> DataFrame:
    """encode -> decode, projected to the input's columns (losslessness)."""
    payload = df.schema["after"].dataType
    assert isinstance(payload, T.StructType)
    return decode_events_avro(encode_events_avro(df), payload).select(*df.columns)
