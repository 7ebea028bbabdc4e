"""Write-set compaction — the CDC "merge" operator.

Reference: ``RdbMerger`` (dt-parallelizer/src/rdb_merger.rs:17-143) folds a
drained micro-batch so each primary key is applied at most twice
(delete + insert); rows that cannot be safely merged spill to an ordered
serial list:

- any key column NULL  -> unmergeable (hash_code == 0, row_data.rs:273-281)
- update that changes a key column -> unmergeable (rdb_merger.rs:159-186)
- no key columns at all -> everything unmergeable (serial whole-row apply)

Spark-native design: **last-event-wins aggregation**, not a window.
``groupBy(key).agg(max_by(event, seq))`` gives map-side partial aggregation
(each shuffle partition pre-folds its events before the exchange), so the
shuffle volume is ~|distinct keys|, not |events| — this is what makes the
operator hold up when a 100 TB backlog replays through it. A
``row_number`` window would shuffle every event; ``max_by`` is strictly
better here and AQE coalesces the post-shuffle partitions.

The compacted output maps directly onto ``MERGE INTO`` / upsert writers:
``op = 'delete'`` -> delete by key, ``op = 'upsert'`` -> insert-or-replace
with the final after image. Spilled rows must be applied serially in
``seq`` order *after* barriers — mirroring MergeParallelizer's
delete-batch -> insert-batch -> unmerged-serial staging
(dt-parallelizer/src/merge_parallelizer.rs:54-113).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ape_dts_spark.model.changes import ROW_TYPE_DELETE, ROW_TYPE_UPDATE, split_updates


def _key_col(key: str) -> Column:
    """Merge key: before-image for deletes, after-image otherwise
    (rdb_merger.rs:106-121 uses before for delete, after for insert/update)."""
    return F.expr(_key_sql(key))


def _key_sql(key: str) -> str:
    return (
        f"CASE WHEN row_type = '{ROW_TYPE_DELETE}' THEN before.{key} "
        f"ELSE after.{key} END"
    )


def classify_mergeable(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Tag each event ``mergeable`` true/false and materialize ``_k_*`` key columns.

    Unmergeable = NULL in any key column, or a key-changing update.
    (Built as ONE selectExpr: this sits on the bench-headline path, where the
    per-Column driver round trips of the old formulation were a measurable
    slice of each attempt.)
    """
    if not key_cols:
        return df.withColumn("mergeable", F.lit(False))
    null_key = " OR ".join(f"({_key_sql(k)}) IS NULL" for k in key_cols)
    key_changed = " OR ".join(
        f"NOT (before.{k} <=> after.{k})" for k in key_cols
    )
    mergeable = (
        f"NOT (({null_key}) OR "
        f"(row_type = '{ROW_TYPE_UPDATE}' AND ({key_changed})))"
    )
    return df.selectExpr(
        "*",
        f"{mergeable} AS mergeable",
        *[f"{_key_sql(k)} AS _k_{k}" for k in key_cols],
    )


def compact_changes(
    df: DataFrame,
    key_cols: list[str],
    order_col: str = "seq",
) -> tuple[DataFrame, DataFrame]:
    """Compact a change batch into (compacted, spilled).

    ``compacted`` columns: ``schema, tb, <key_cols>, op ('delete'|'upsert'),
    after (final image), seq`` — one row per live key, ready for MERGE.
    ``spilled`` is the original events (in order) that must apply serially.
    """
    tagged = classify_mergeable(df, key_cols)
    spilled = tagged.filter(~F.col("mergeable")).drop("mergeable", *[f"_k_{k}" for k in key_cols])

    mergeable = tagged.filter(F.col("mergeable"))
    group_keys = ["schema", "tb"] + [f"_k_{k}" for k in key_cols]
    last = mergeable.groupBy(*group_keys).agg(
        F.max_by(F.struct("row_type", "after", order_col), F.col(order_col)).alias("_last")
    )
    compacted = last.select(
        F.col("schema"),
        F.col("tb"),
        *[F.col(f"_k_{k}").alias(k) for k in key_cols],
        F.when(F.col("_last.row_type") == ROW_TYPE_DELETE, F.lit("delete")).otherwise(F.lit("upsert")).alias("op"),
        F.col("_last.after").alias("after"),
        F.col(f"_last.{order_col}").alias(order_col),
    )
    return compacted, spilled


def replay_to_state(df: DataFrame, key_cols: list[str], order_col: str = "seq") -> DataFrame:
    """Replay a change stream from an empty initial state to its final table
    state — fully distributed, one shuffle of ~|distinct keys|.

    Handles key-changing updates by first splitting them into a delete(before)
    + insert(after) pair (each half then lands on its own key), then taking
    the last effect per key with a map-side ``max_by`` fold ordered by
    ``(seq, sub_seq)``; keys whose last effect is a delete vanish.

    Requires every event to carry non-NULL key columns (NULL-key events have
    whole-row-match semantics — the reference's serial path, handled by
    ``ParquetTable.merge_apply``'s spill replay; filter them out first).
    Output: (schema, tb, <payload columns of the final row images>).
    """
    key_changed = F.lit(False)
    for k in key_cols:
        key_changed = key_changed | ~F.col("before").getField(k).eqNullSafe(F.col("after").getField(k))
    key_changed = (F.col("row_type") == ROW_TYPE_UPDATE) & key_changed

    halves = split_updates(df.filter(key_changed))
    rest = df.filter(~key_changed).withColumn("sub_seq", F.lit(0))
    events = rest.unionByName(halves.select(*rest.columns))

    keyed = events
    for k in key_cols:
        keyed = keyed.withColumn(f"_k_{k}", _key_col(k))
    last = keyed.groupBy("schema", "tb", *[f"_k_{k}" for k in key_cols]).agg(
        F.max_by(
            F.struct("row_type", "after"), F.struct(F.col(order_col), F.col("sub_seq"))
        ).alias("_last")
    )
    payload_fields = [f.name for f in df.schema["after"].dataType.fields]
    return last.filter(F.col("_last.row_type") != ROW_TYPE_DELETE).select(
        "schema", "tb", *[F.col(f"_last.after.{f}").alias(f) for f in payload_fields]
    )
