"""Canonical wire format + topic routing for message-queue sinks/sources.

Reference: the Kafka sinker serializes every change event with a fixed Avro
schema ``{schema, tb, operation, fields[], before, after}``
(dt-common/src/meta/avro/avro_converter_schema.rs:129-141, encode
avro_converter.rs:56-181) and routes it to a per-table topic
(dt-connector/src/rdb_router.rs:40-44,96-98); the Kafka extractor decodes the
same format back into change events (kafka_extractor.rs:38-86,
avro_converter.rs:183-236) — a lossless round trip.

Spark-native: ``to_json``/``from_json`` over the same envelope. The spark-avro
package is not bundled in this environment; where it is loaded, swap
``F.to_json`` -> ``to_avro`` / ``F.from_json`` -> ``from_avro`` (same columns,
same plan shape) for the binary format. Both are JVM-side, codegen'd
expressions — encoding is a pure projection, no shuffle at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ape_dts_spark.model.changes import change_event_schema


def topic_for(topic_map: dict[str, str] | None):
    """Column expr resolving the Kafka topic for each event: exact
    '<schema>.<tb>' match, then '<schema>.*', then the default '*' entry,
    else '<schema>.<tb>' itself."""
    full = F.concat_ws(".", F.col("schema"), F.col("tb"))
    if not topic_map:
        return full
    expr = full
    if "*" in topic_map:
        expr = F.lit(topic_map["*"])
    for pat, topic in topic_map.items():
        if pat == "*":
            continue
        if pat.endswith(".*"):
            expr = F.when(F.col("schema") == pat[:-2], F.lit(topic)).otherwise(expr)
    for pat, topic in topic_map.items():
        if "*" not in pat:
            s, t = pat.split(".", 1)
            expr = F.when((F.col("schema") == s) & (F.col("tb") == t), F.lit(topic)).otherwise(expr)
    return expr


def mark_origin(df: DataFrame, node: str, preserve_existing: bool = True) -> DataFrame:
    """Two-way-sync origin-marker WRITE path (dt-connector/src/data_marker.rs:
    9-110 writes a marker txn ahead of each real txn so the peer recognizes
    its own echoes; on the wire the marker is per-event metadata): stamp
    outgoing events with this node's identity so the peer's
    ``ignore_origin_nodes`` filter drops the echo. With
    ``preserve_existing`` (default), events relayed from a third node keep
    their original origin — the reference's topology-aware marker semantics."""
    stamped = F.lit(node)
    if preserve_existing and "origin_node" in df.columns:
        stamped = F.coalesce(F.col("origin_node"), F.lit(node))
    return df.withColumn("origin_node", stamped)


def encode_events(df: DataFrame, topic_map: dict[str, str] | None = None) -> DataFrame:
    """Change events -> Kafka-ready (topic, key, value) rows.

    key = '<schema>.<tb>' (per-table ordering within a partition, matching the
    reference's per-table topic routing); value = the JSON envelope. When the
    input carries ``ts`` / ``origin_node`` / ``ddl`` they ride the envelope
    too (ts as epoch millis) — a post-Kafka-hop consumer still needs the
    time-window filter, the two-way-sync origin filter and DDL barriers.
    """
    parts = [
        F.col("schema"),
        F.col("tb"),
        F.col("row_type").alias("operation"),
        F.col("before"),
        F.col("after"),
        F.col("seq"),
    ]
    if "ts" in df.columns:
        parts.append(F.unix_millis(F.col("ts")).alias("ts_ms"))
    if "origin_node" in df.columns:
        parts.append(F.col("origin_node"))
    if "ddl" in df.columns:
        parts.append(F.col("ddl"))
    return df.select(
        topic_for(topic_map).alias("topic"),
        F.concat_ws(".", F.col("schema"), F.col("tb")).alias("key"),
        F.to_json(F.struct(*parts)).alias("value"),
    )


def decode_events(df: DataFrame, payload: T.StructType, value_col: str = "value") -> DataFrame:
    """Wire rows -> canonical change DataFrame (the extractor's round trip).
    ``ts`` / ``origin_node`` / ``ddl`` decode to NULL when the producer's
    envelope predates them."""
    env = T.StructType(
        [
            T.StructField("schema", T.StringType()),
            T.StructField("tb", T.StringType()),
            T.StructField("operation", T.StringType()),
            T.StructField("before", payload),
            T.StructField("after", payload),
            T.StructField("seq", T.LongType()),
            T.StructField("ts_ms", T.LongType()),
            T.StructField("origin_node", T.StringType()),
            T.StructField("ddl", T.StringType()),
        ]
    )
    parsed = df.select(F.from_json(F.col(value_col), env).alias("r"))
    return parsed.select(
        F.col("r.schema").alias("schema"),
        F.col("r.tb").alias("tb"),
        F.col("r.operation").alias("row_type"),
        F.col("r.before").alias("before"),
        F.col("r.after").alias("after"),
        F.col("r.seq").alias("seq"),
        F.timestamp_millis(F.col("r.ts_ms")).alias("ts"),
        F.col("r.origin_node").alias("origin_node"),
        F.col("r.ddl").alias("ddl"),
    )


def roundtrip(df: DataFrame, topic_map: dict[str, str] | None = None) -> DataFrame:
    """encode -> decode, projected back to the input's columns (proves the
    wire format is lossless for every field the input carries)."""
    payload = df.schema["after"].dataType
    assert isinstance(payload, T.StructType)
    return decode_events(encode_events(df, topic_map), payload).select(*df.columns)
