"""Redis sinker: compacted key state -> commands, RESP-encoded batches.

Reference: entry_rewriter.rs:272-368 (object -> SET/HSET/RPUSH/SADD/ZADD +
PEXPIRE commands), cmd_encoder.rs:25-54 (RESP ``*N\\r\\n$len\\r\\narg\\r\\n``
encoding), redis_sinker.rs (batched pipeline writes, one connection per
parallel partition), redis_statistic_sinker.rs (big-key/hot-key reports).

The Spark-native sink renders the write-set as command rows (inline +
RESP-encoded columns, pure JVM string exprs) partitioned by cluster slot
(sources/redis.py partition_by_slot); a real deployment foreachBatch-es each
partition through one pipelined connection, mirroring the reference's
parallelizer -> sinker thread layout. Everything here is also expressible in
ANSI SQL, so command rendering is oracle-checked cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CRLF = "\r\n"


def resp_encode_col(argv: Column) -> Column:
    """RESP array-of-bulk-strings encoding of an argv array column
    (cmd_encoder.rs:25-54) as a JVM expression. ASCII/1-byte-per-char
    contract for the $len prefixes (binary-safe payloads go through RESP
    files, not inline strings)."""
    return F.concat(
        F.lit("*"),
        F.size(argv).cast("string"),
        F.lit(CRLF),
        F.aggregate(
            argv,
            F.lit(""),
            lambda acc, x: F.concat(
                acc, F.lit("$"), F.length(x).cast("string"), F.lit(CRLF), x, F.lit(CRLF)
            ),
        ),
    )


def state_to_commands(state: DataFrame) -> DataFrame:
    """Final key state (sources/redis.compact_entries output) -> one command
    row per string key / container member / list element / TTL, exactly the
    rewriter's shapes (entry_rewriter.rs:272-345,360-368):

        string -> SET key value          hash -> HSET key field value
        set    -> SADD key member        zset -> ZADD key score member
        list   -> RPUSH key element      ttl  -> PEXPIRE key ms

    Output: (db_id, key, ord, cmd: array<string>, inline: string, resp:
    string). ``ord`` orders list elements (and TTLs after their key's data);
    scores/values ride through as the original strings, so rendering is
    byte-stable across engines.
    """
    argv = (
        F.when(F.col("entry_type") == "string", F.array(F.lit("SET"), F.col("key"), F.col("value")))
        .when(F.col("entry_type") == "hash", F.array(F.lit("HSET"), F.col("key"), F.col("member"), F.col("value")))
        .when(F.col("entry_type") == "set", F.array(F.lit("SADD"), F.col("key"), F.col("member")))
        .when(F.col("entry_type") == "zset", F.array(F.lit("ZADD"), F.col("key"), F.col("value"), F.col("member")))
        .when(F.col("entry_type") == "list", F.array(F.lit("RPUSH"), F.col("key"), F.col("value")))
    )
    data = state.select("db_id", "key", "ord", argv.alias("cmd"))

    # one PEXPIRE per key with a live TTL, ordered after the key's data rows
    ttl = (
        state.filter(F.col("expire").isNotNull())
        .groupBy("db_id", "key")
        .agg(F.max("ord").alias("ord"), F.first("expire").alias("expire"))
        .select(
            "db_id",
            "key",
            (F.col("ord") + 1).alias("ord"),
            F.array(
                F.lit("PEXPIRE"), F.col("key"), F.substring_index(F.col("expire"), ":", -1)
            ).alias("cmd"),
        )
    )
    out = data.unionByName(ttl)
    return out.select(
        "db_id",
        "key",
        "ord",
        "cmd",
        F.array_join("cmd", " ").alias("inline"),
        resp_encode_col(F.col("cmd")).alias("resp"),
    )


def big_key_stats(state: DataFrame, top_n: int = 20) -> DataFrame:
    """Big-key statistics over the key state — the SCAN statistic extractor /
    statistic sinker analogue (redis_scan_extractor.rs:131-149 MEMORY USAGE
    per key, redis_statistic_sinker.rs): per key, its type, member count and
    estimated data size; top-N by size. Single hash aggregation; the top-N is
    a driver-small result by contract."""
    sized = state.withColumn(
        "entry_bytes",
        F.coalesce(F.length("member"), F.lit(0)) + F.coalesce(F.length("value"), F.lit(0)),
    )
    per_key = sized.groupBy("db_id", "key").agg(
        F.first("entry_type").alias("entry_type"),
        F.count(F.lit(1)).alias("n_members"),
        (F.length(F.first("key")) + F.sum("entry_bytes")).alias("est_bytes"),
    )
    return per_key.orderBy(F.col("est_bytes").desc(), F.col("key")).limit(top_n)
