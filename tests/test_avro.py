"""Avro binary wire codec: spec-conformant primitives and lossless envelope
round trips across every supported payload type, including NULL images,
NULL fields, timestamps, decimals, booleans and bytes."""

from datetime import datetime
from decimal import Decimal

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ape_dts_spark.sinks.avro_codec import (
    _r_long,
    _w_long,
    encode_events_avro,
    roundtrip_avro,
)


def test_zigzag_varint_spec_values():
    """Values from the Avro spec: 0->00, -1->01, 1->02, -2->03, 2->04,
    -64->7f, 64->80 01."""
    cases = {0: b"\x00", -1: b"\x01", 1: b"\x02", -2: b"\x03", 2: b"\x04",
             -64: b"\x7f", 64: b"\x80\x01"}
    for n, want in cases.items():
        buf = bytearray()
        _w_long(buf, n)
        assert bytes(buf) == want, n
        back, pos = _r_long(memoryview(bytes(buf)), 0)
        assert back == n and pos == len(buf)
    for n in (2**62, -(2**62), 123456789012345, -987654321):
        buf = bytearray()
        _w_long(buf, n)
        assert _r_long(memoryview(bytes(buf)), 0)[0] == n


PAYLOAD = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("price", T.DecimalType(18, 2)),
        T.StructField("score", T.DoubleType()),
        T.StructField("active", T.BooleanType()),
        T.StructField("blob", T.BinaryType()),
        T.StructField("seen", T.TimestampType()),
    ]
)


def _rich_stream(spark):
    rows = [
        ("db", "t", "insert", None,
         (1, "a'b\\c", Decimal("12.34"), 1.5, True, b"\x00\xff", datetime(2024, 1, 2, 3, 4, 5, 123456)),
         1, datetime(2024, 1, 2), "node_a", None),
        ("db", "t", "update",
         (2, None, None, -0.0, False, None, None),
         (2, "x", Decimal("-0.01"), 2.5, None, b"", datetime(1999, 12, 31, 23, 59, 59)),
         2, None, None, "ALTER TABLE t ADD COLUMN z int"),
        ("db", "t", "delete",
         (3, "gone", Decimal("0.00"), 0.0, True, b"\x01", datetime(2024, 6, 1)),
         None, 3, datetime(2024, 6, 1, 12), "node_b", None),
    ]
    schema = T.StructType(
        [
            T.StructField("schema", T.StringType()),
            T.StructField("tb", T.StringType()),
            T.StructField("row_type", T.StringType()),
            T.StructField("before", PAYLOAD),
            T.StructField("after", PAYLOAD),
            T.StructField("seq", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("origin_node", T.StringType()),
            T.StructField("ddl", T.StringType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def test_avro_roundtrip_rich_payload(spark):
    df = _rich_stream(spark)
    back = roundtrip_avro(df)
    a = {r["seq"]: repr(tuple(r)) for r in df.collect()}
    b = {r["seq"]: repr(tuple(r)) for r in back.collect()}
    assert a == b


def test_avro_binary_is_compact(spark):
    """Sanity: the binary envelope is materially smaller than the JSON one
    (the reason the reference speaks Avro on the wire)."""
    from ape_dts_spark.sinks.wire_format import encode_events

    df = _rich_stream(spark)
    avro_len = encode_events_avro(df).select(F.sum(F.octet_length("value"))).collect()[0][0]
    json_len = encode_events(df).select(F.sum(F.octet_length("value"))).collect()[0][0]
    assert avro_len < json_len


def test_avro_nan_double_coerces_to_null(spark):
    """Documented coercion of the Python-kernel path: NaN doubles decode as
    NULL (pandas NaN == missing on the Python->Arrow hop); everything else
    in the row survives."""
    df = _rich_stream(spark).withColumn(
        "after",
        F.when(
            F.col("after").isNotNull(),
            F.struct(
                F.col("after.id"), F.col("after.name"), F.col("after.price"),
                F.when(F.col("seq") == 2, F.lit(float("nan"))).otherwise(F.col("after.score")).alias("score"),
                F.col("after.active"), F.col("after.blob"), F.col("after.seen"),
            ),
        ),
    )
    back = {r["seq"]: r for r in roundtrip_avro(df).collect()}
    assert back[2]["after"]["score"] is None
    assert back[2]["after"]["name"] == "x"
