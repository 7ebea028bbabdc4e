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


def _change_df(spark):
    payload = "struct<user_id:bigint,value:double,name:string,ok:boolean>"
    return spark.createDataFrame(
        [
            ("db", "users", "insert", None, (1, 2.5, "ann", True), 1),
            ("db", "users", "update", (1, 2.5, "ann", True), (1, -3.25, None, False), 2),
            ("db", "users", "delete", (1, -3.25, None, False), None, 3),
        ],
        f"schema string, tb string, row_type string, before {payload}, after {payload}, seq long",
    )


def test_to_avro_swap_contract(spark):
    """Jar-gated: where spark-avro is on the classpath, the JVM to_avro path
    with envelope_avro_schema_json must emit byte-identical values to the
    Python codec, and from_avro must read the Python codec's bytes. In
    jar-less containers this skips, documenting the swap contract."""
    import pytest

    from ape_dts_spark.sinks.avro_codec import (
        encode_events_avro,
        envelope_avro_schema_json,
        wire_projection,
    )

    try:
        from pyspark.sql.avro.functions import from_avro, to_avro

        probe_schema = '{"type":"record","name":"p","fields":[{"name":"x","type":"long"}]}'
        spark.range(1).select(
            to_avro(F.struct(F.col("id").alias("x")), probe_schema)
        ).collect()
    except Exception:
        pytest.skip(
            "spark-avro jar not on the classpath; swap contract: "
            "to_avro(struct(*wire_projection(df)), envelope_avro_schema_json(payload)) "
            "== encode_events_avro(df).value, byte for byte"
        )

    df = _change_df(spark)
    payload = df.schema["after"].dataType
    schema_json = envelope_avro_schema_json(payload)
    ours = [bytes(r["value"]) for r in encode_events_avro(df).orderBy("value").collect()]
    jvm = [
        bytes(r["v"])
        for r in df.select(to_avro(F.struct(*wire_projection(df)), schema_json).alias("v"))
        .orderBy("v")
        .collect()
    ]
    assert ours == jvm
    # and the JVM reader accepts the Python writer's bytes
    back = (
        encode_events_avro(df)
        .select(from_avro(F.col("value"), schema_json).alias("e"))
        .select("e.schema", "e.tb", "e.row_type", "e.seq")
        .orderBy("seq")
        .collect()
    )
    assert [(r["schema"], r["tb"], r["row_type"], r["seq"]) for r in back] == [
        ("db", "users", "insert", 1),
        ("db", "users", "update", 2),
        ("db", "users", "delete", 3),
    ]


def test_envelope_schema_json_shape():
    """The contract schema is valid Avro-JSON with the exact wire order the
    Python codec writes (field order IS the binary layout)."""
    import json

    from ape_dts_spark.sinks.avro_codec import envelope_avro_schema_json

    payload = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("bal", T.DecimalType(18, 2)),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    rec = json.loads(envelope_avro_schema_json(payload))
    assert [f["name"] for f in rec["fields"]] == [
        "schema", "tb", "row_type", "before", "after", "seq", "ts_us", "origin_node", "ddl",
    ]
    payload_rec = rec["fields"][3]["type"][1]
    assert rec["fields"][4]["type"] == ["null", "Payload"]  # named reference
    assert [f["name"] for f in payload_rec["fields"]] == ["user_id", "bal", "ts"]
    # wire types: decimal -> string, timestamp -> long micros
    assert payload_rec["fields"][1]["type"] == ["null", "string"]
    assert payload_rec["fields"][2]["type"] == ["null", "long"]


def test_avro_jvm_core_parity(spark):
    """Cross-implementation parity with the CANONICAL Avro library (Apache
    Avro core, org.apache.avro — on Spark's classpath even without the
    spark-avro connector): every envelope the Python codec emits (a) parses
    with the JVM GenericDatumReader under envelope_avro_schema_json with
    field-identical values, and (b) re-serializes via GenericDatumWriter to
    BYTE-IDENTICAL output — pinning the wire format to the spec
    implementation, not merely to our own round trip."""
    from ape_dts_spark.sinks.avro_codec import envelope_avro_schema_json, wire_projection

    df = _rich_stream(spark)
    payload = df.schema["after"].dataType
    jvm = spark._jvm
    schema = jvm.org.apache.avro.Schema.Parser().parse(envelope_avro_schema_json(payload))
    reader = jvm.org.apache.avro.generic.GenericDatumReader(schema)
    writer = jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    decoder_f = jvm.org.apache.avro.io.DecoderFactory.get()
    encoder_f = jvm.org.apache.avro.io.EncoderFactory.get()

    wire_rows = {r["seq"]: r for r in df.select(*wire_projection(df)).collect()}
    encoded = encode_events_avro(df).collect()
    assert len(encoded) == len(wire_rows)
    for out in encoded:
        rec = reader.read(None, decoder_f.binaryDecoder(out["value"], None))
        seq = rec.get("seq")
        orig = wire_rows[seq]
        assert str(rec.get("schema")) == orig["schema"]
        assert str(rec.get("tb")) == orig["tb"]
        assert str(rec.get("row_type")) == orig["row_type"]
        assert rec.get("ts_us") == orig["ts_us"]
        for image in ("before", "after"):
            jimg, oimg = rec.get(image), orig[image]
            if oimg is None:
                assert jimg is None
                continue
            assert jimg.get("id") == oimg["id"]
            jname = jimg.get("name")
            assert (None if jname is None else str(jname)) == oimg["name"]
            jprice = jimg.get("price")
            assert (None if jprice is None else str(jprice)) == oimg["price"]
            assert jimg.get("score") == oimg["score"]
            assert jimg.get("active") == oimg["active"]
            jblob = jimg.get("blob")
            jb = None if jblob is None else bytes(jblob.array())
            ob = oimg["blob"] if oimg["blob"] is None else bytes(oimg["blob"])
            assert jb == ob
            assert jimg.get("seen") == oimg["seen"]
        # (b) canonical re-encode: the JVM writer must reproduce our bytes
        baos = jvm.java.io.ByteArrayOutputStream()
        enc = encoder_f.binaryEncoder(baos, None)
        writer.write(rec, enc)
        enc.flush()
        assert bytes(baos.toByteArray()) == bytes(out["value"])


def test_avro_jvm_parity_random_payloads(spark):
    """Hypothesis sweep of the JVM parity property: random envelopes
    (unicode strings, int64 extremes, signed-zero/denormal doubles,
    empty/odd bytes, NULL fields and NULL images) encoded by the Python
    codec must parse with the canonical Apache Avro reader AND re-serialize
    byte-identically through its writer."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from ape_dts_spark.sinks.avro_codec import _encode_row, envelope_avro_schema_json

    payload = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
            T.StructField("flag", T.BooleanType()),
            T.StructField("blob", T.BinaryType()),
        ]
    )
    fields = [("id", "long"), ("name", "string"), ("score", "double"),
              ("flag", "boolean"), ("blob", "bytes")]
    jvm = spark._jvm
    schema = jvm.org.apache.avro.Schema.Parser().parse(envelope_avro_schema_json(payload))
    reader = jvm.org.apache.avro.generic.GenericDatumReader(schema)
    writer = jvm.org.apache.avro.generic.GenericDatumWriter(schema)
    decoder_f = jvm.org.apache.avro.io.DecoderFactory.get()
    encoder_f = jvm.org.apache.avro.io.EncoderFactory.get()

    img = st.none() | st.fixed_dictionaries(
        {
            "id": st.none() | st.integers(-(2**63), 2**63 - 1),
            "name": st.none() | st.text(max_size=12),
            "score": st.none()
            | st.floats(allow_nan=False, allow_infinity=True, width=64),
            "flag": st.none() | st.booleans(),
            "blob": st.none() | st.binary(max_size=8),
        }
    )
    env = st.fixed_dictionaries(
        {
            "schema": st.text(max_size=6),
            "tb": st.text(max_size=6),
            "row_type": st.sampled_from(["insert", "update", "delete"]),
            "before": img,
            "after": img,
            "seq": st.integers(0, 2**40),
            "ts_us": st.none() | st.integers(-(2**50), 2**50),
            "origin_node": st.none() | st.text(max_size=6),
            "ddl": st.none() | st.text(max_size=20),
        }
    )

    @settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
    @given(env)
    def prop(row):
        by = _encode_row(row, fields)
        rec = reader.read(None, decoder_f.binaryDecoder(by, None))
        assert str(rec.get("schema")) == row["schema"]
        assert rec.get("seq") == row["seq"]
        for image in ("before", "after"):
            jimg, oimg = rec.get(image), row[image]
            if oimg is None:
                assert jimg is None
                continue
            assert jimg.get("id") == oimg["id"]
            jn = jimg.get("name")
            assert (None if jn is None else str(jn)) == oimg["name"]
            js = jimg.get("score")
            assert js == oimg["score"] or (js == 0.0 and oimg["score"] == 0.0)
            assert jimg.get("flag") == oimg["flag"]
            jb = jimg.get("blob")
            assert (None if jb is None else bytes(jb.array())) == oimg["blob"]
        baos = jvm.java.io.ByteArrayOutputStream()
        enc = encoder_f.binaryEncoder(baos, None)
        writer.write(rec, enc)
        enc.flush()
        assert bytes(baos.toByteArray()) == by

    prop()


def test_wire_bridge_apply_equivalence(spark, sf_dir):
    """mysql_to_kafka_to_mysql suite shape: routing the change stream
    through the Avro binary wire (encode -> kafka-shaped (key, value) rows
    -> decode) and then replaying to state must land EXACTLY the final
    table state of the direct replay — the bridge adds transport, not
    semantics. Covers timestamp/decimal wire re-materialization and image
    nullability through the full apply path."""
    from ape_dts_spark import demo
    from ape_dts_spark.operators.merge import replay_to_state
    from ape_dts_spark.sinks.avro_codec import decode_events_avro, encode_events_avro

    stream = demo.users_change_stream(spark, sf_dir)
    keyed = stream.filter(
        F.when(F.col("row_type") == "delete", F.col("before.user_id").isNotNull())
        .when(F.col("row_type") == "insert", F.col("after.user_id").isNotNull())
        .otherwise(F.col("before.user_id").isNotNull() & F.col("after.user_id").isNotNull())
    )
    payload = keyed.schema["after"].dataType
    direct = {
        r["user_id"]: r["value"]
        for r in replay_to_state(keyed, ["user_id"]).collect()
    }
    bridged_stream = decode_events_avro(encode_events_avro(keyed), payload)
    bridged = {
        r["user_id"]: r["value"]
        for r in replay_to_state(bridged_stream, ["user_id"]).collect()
    }
    assert direct == bridged and len(direct) > 0
