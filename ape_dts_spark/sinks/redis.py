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
from pyspark.sql import Window as W
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


def stream_state_to_commands(state: DataFrame) -> DataFrame:
    """Stream-state rows (sources/redis_rdb._parse_stream's four families)
    -> the exact replay commands stream_parser.rs emits:

        stream       -> XADD key id field value ...   (fields ord-ordered,
                        one command per entry, entries id-ordered)
        stream_meta  -> XSETID key last_id            (after every XADD,
                        stream_parser.rs:114-120 — XDEL-safe last id)
        stream_group -> XGROUP CREATE key g last_id
        stream_pel   -> XCLAIM key g consumer 0 id TIME t RETRYCOUNT n
                        JUSTID FORCE                  (stream_parser.rs:207-221)

    Output shape matches state_to_commands; ``ord`` tiers the families so a
    sorted replay is valid (XADDs by entry id, then XSETID, then groups,
    then claims). One groupBy per family on (db_id, key[, id]) — map-side
    combines, no driver loops."""
    sid = F.substring_index(F.col("member"), ":", 1)
    field = F.expr("substring(member, length(substring_index(member, ':', 1)) + 2)")
    entries = (
        state.filter(F.col("entry_type") == "stream")
        .select(
            "db_id", "key", sid.alias("sid"), field.alias("field"), "value", "ord",
            # try_cast: under ANSI mode Catalyst constant-folds projection
            # expressions into pruned-away union branches (e.g. the literal
            # 'last_id' member of a stream_meta branch) BEFORE the
            # entry_type filter removes them — a plain cast then fails at
            # optimization time on rows that can never exist
            F.substring_index(sid, "-", 1).try_cast("long").alias("ms"),
            F.substring_index(sid, "-", -1).try_cast("long").alias("seq"),
        )
        .groupBy("db_id", "key", "sid")
        .agg(
            F.min("ms").alias("ms"),
            F.min("seq").alias("seq"),
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("ord", "field", "value"))),
                    lambda x: F.array(x["field"], x["value"]),
                )
            ).alias("fv"),
        )
    )
    w_key = W.partitionBy("db_id", "key")
    xadd = entries.select(
        "db_id", "key",
        (F.row_number().over(w_key.orderBy("ms", "seq")) - 1).cast("long").alias("ord"),
        F.concat(F.array(F.lit("XADD"), F.col("key"), F.col("sid")), F.col("fv")).alias("cmd"),
    )
    xsetid = state.filter(F.col("entry_type") == "stream_meta").select(
        "db_id", "key", F.lit(2_000_000).cast("long").alias("ord"),
        F.array(F.lit("XSETID"), F.col("key"), F.col("value")).alias("cmd"),
    )
    xgroup = state.filter(F.col("entry_type") == "stream_group").select(
        "db_id", "key",
        (F.lit(2_000_000) + F.dense_rank().over(w_key.orderBy("member"))).cast("long").alias("ord"),
        F.array(F.lit("XGROUP"), F.lit("CREATE"), F.col("key"), F.col("member"), F.col("value")).alias("cmd"),
    )
    pel = state.filter(F.col("entry_type") == "stream_pel").select(
        "db_id", "key", "ord",
        F.substring_index(F.col("member"), ":", 1).alias("grp"),
        F.expr("substring(member, length(substring_index(member, ':', 1)) + 2)").alias("consumer"),
        F.substring_index(F.col("value"), "@", 1).alias("sid"),
        F.substring_index(F.substring_index(F.col("value"), "@", -1), "/", 1).alias("t"),
        F.substring_index(F.col("value"), "/", -1).alias("n"),
    )
    xclaim = pel.select(
        "db_id", "key",
        (
            F.lit(3_000_000)
            + F.dense_rank().over(w_key.orderBy("grp", "consumer")) * 1000
            + F.col("ord")
        ).cast("long").alias("ord"),
        F.array(
            F.lit("XCLAIM"), F.col("key"), F.col("grp"), F.col("consumer"), F.lit("0"),
            F.col("sid"), F.lit("TIME"), F.col("t"), F.lit("RETRYCOUNT"), F.col("n"),
            F.lit("JUSTID"), F.lit("FORCE"),
        ).alias("cmd"),
    )
    out = xadd.unionByName(xsetid).unionByName(xgroup).unionByName(xclaim)
    return out.select(
        "db_id", "key", "ord", "cmd",
        F.array_join("cmd", " ").alias("inline"),
        resp_encode_col(F.col("cmd")).alias("resp"),
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
        .when(F.col("entry_type").isin("hash", "hash_ex"), F.array(F.lit("HSET"), F.col("key"), F.col("member"), F.col("value")))
        .when(F.col("entry_type") == "set", F.array(F.lit("SADD"), F.col("key"), F.col("member")))
        .when(F.col("entry_type") == "zset", F.array(F.lit("ZADD"), F.col("key"), F.col("value"), F.col("member")))
        .when(F.col("entry_type") == "list", F.array(F.lit("RPUSH"), F.col("key"), F.col("value")))
    )
    data = state.filter(
        F.col("entry_type").isin("string", "hash", "hash_ex", "set", "zset", "list")
    ).select("db_id", "key", "ord", argv.alias("cmd"))
    # Redis 7.4 per-field TTLs: one HPEXPIRE per hash_ex row carrying an
    # expiry ('KIND:value' form, value = the FIELD's ms) — replayed after
    # every data command (ord tier 4e6)
    hpexpire = (
        state.filter((F.col("entry_type") == "hash_ex") & F.col("expire").isNotNull())
        .select(
            "db_id",
            "key",
            (F.lit(4_000_000) + F.col("ord")).alias("ord"),
            F.array(
                F.lit("HPEXPIRE"), F.col("key"),
                F.substring_index(F.col("expire"), ":", -1),
                F.lit("FIELDS"), F.lit("1"), F.col("member"),
            ).alias("cmd"),
        )
    )
    data = data.unionByName(hpexpire)

    # one PEXPIRE per key with a live TTL, ordered after the key's data rows
    # (hash_ex expiries are per FIELD -> HPEXPIRE above, never key-level)
    ttl = (
        state.filter(F.col("expire").isNotNull() & (F.col("entry_type") != "hash_ex"))
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
    base = out.select(
        "db_id",
        "key",
        "ord",
        "cmd",
        F.array_join("cmd", " ").alias("inline"),
        resp_encode_col(F.col("cmd")).alias("resp"),
    )
    # stream families (XADD/XSETID/XGROUP/XCLAIM) ride their own grouped
    # rewriter; empty when the state carries no stream rows
    streams = state.filter(F.col("entry_type").startswith("stream"))
    return base.unionByName(stream_state_to_commands(streams))


def state_to_restore_commands(
    state: DataFrame,
    redis_version: float = 7.4,
    stream_version: int = 3,
    hash_field_ttl: str = "listpackex",
) -> DataFrame:
    """RESTORE-mode sinker (``RedisWriteMethod::Restore``): the reference's
    second rewrite mode next to typed commands — serialize each key's value
    to the DUMP wire format (RDB value payload + 2-byte LE RDB version 6 +
    8-byte LE CRC-64/Jones, entry_rewriter.rs:347-386 create_value_dump)
    and emit one ``RESTORE key ttl payload [REPLACE]`` per key
    (redis_sinker.rs:143-147 dispatch; REPLACE from redis >= 3.0,
    entry_rewriter.rs:353-355).

    Input is the compacted key state (sources/redis.compact_entries /
    redis_rdb entry rows) with ``expire`` as the ``KIND:ms`` string form.
    The ttl argument mirrors the reference: the entry's expire ms, 0 when
    none (hash_ex per-field TTLs ride inside the payload, so their ttl arg
    is 0). The payload rides hex-encoded in the command relation — the
    command row set is an ASCII-stable DataFrame; a live writer unhexes
    argv[3] before the socket (RESP bulk strings are binary-safe).

    Plan shape: one groupBy (db_id, key) with collect_list — a single
    shuffle on the key, map-side combined — then one Arrow-batched
    mapInPandas running the same encoders the RDB file writer uses. No
    driver collect; scales with keys × partition parallelism."""
    import pandas as pd

    from ape_dts_spark.sources import redis_rdb as rdb

    rows = state.select(
        "db_id",
        "key",
        "entry_type",
        "member",
        "value",
        "ord",
        # 'KIND:ms' -> ms; try_cast so malformed/absent forms degrade to
        # no-TTL instead of failing a whole partition under ANSI mode
        F.substring_index(F.col("expire"), ":", -1).try_cast("long").alias("expire_ms"),
    )
    grouped = rows.groupBy("db_id", "key").agg(
        F.collect_list(
            F.struct("entry_type", "member", "value", "ord", "expire_ms")
        ).alias("rows")
    )

    out_schema = (
        "db_id long, key string, ttl_ms long, type_byte int, "
        "payload_len int, payload_hex string"
    )

    def encode_batches(batches):
        for pdf in batches:
            recs = []
            for db_id, key, rlist in zip(pdf["db_id"], pdf["key"], pdf["rows"]):
                ents = sorted(
                    (
                        {
                            "entry_type": r["entry_type"],
                            "member": r["member"],
                            "value": r["value"],
                            "ord": r["ord"],
                            "expire_ms": r["expire_ms"],
                        }
                        for r in rlist
                    ),
                    key=lambda r: (
                        r["ord"] or 0,
                        r["entry_type"],
                        r["member"] or "",
                        r["value"] or "",
                    ),
                )
                etype = ents[0]["entry_type"]
                ttl = 0
                if etype != "hash_ex":  # hash_ex TTLs are per field, in-payload
                    ttl = max((e["expire_ms"] or 0) for e in ents)
                payload = rdb.dump_value(ents, stream_version, hash_field_ttl)
                recs.append(
                    (db_id, key, ttl, payload[0], len(payload), payload.hex())
                )
            yield pd.DataFrame(
                recs,
                columns=[
                    "db_id", "key", "ttl_ms", "type_byte", "payload_len", "payload_hex",
                ],
            )

    dumped = grouped.mapInPandas(encode_batches, out_schema)
    args = [
        F.lit("RESTORE"),
        F.col("key"),
        F.col("ttl_ms").cast("string"),
        F.col("payload_hex"),
    ]
    if redis_version >= 3.0:  # REPLACE exists from redis 3.0 on
        args.append(F.lit("REPLACE"))
    cmd = F.array(*args)
    return dumped.select(
        "db_id",
        "key",
        "ttl_ms",
        "type_byte",
        "payload_len",
        "payload_hex",
        cmd.alias("cmd"),
        F.array_join(cmd, " ").alias("inline"),
        resp_encode_col(cmd).alias("resp"),
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
