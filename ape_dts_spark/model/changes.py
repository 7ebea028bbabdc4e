"""Canonical change-event DataFrame model.

The reference's unit of data is a row-oriented change event
(``RowData {schema, tb, row_type, before, after}`` —
dt-common/src/meta/row_data.rs:20-33, wrapped in ``DtItem`` with a replication
position — dt-common/src/meta/dt_data.rs:12-17). The Spark-native equivalent is
a **change DataFrame** with one row per event:

    schema    STRING        -- source database/schema name
    tb        STRING        -- table name
    row_type  STRING        -- 'insert' | 'update' | 'delete'
    before    STRUCT<...>   -- image before the change (delete/update)
    after     STRUCT<...>   -- image after the change (insert/update)
    seq       BIGINT        -- total order in the replication stream
                               (binlog/LSN position analogue)
    origin_node STRING      -- optional, for two-way-sync cycle filtering
                               (dt-common/src/meta/dt_data.rs:16)

Batch pipelines use a plain DataFrame of this shape; CDC uses the same shape as
a Structured Streaming DataFrame. All operators below are pure column
expressions (JVM-side, codegen'd) — no Python row loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ROW_TYPE_INSERT = "insert"
ROW_TYPE_UPDATE = "update"
ROW_TYPE_DELETE = "delete"


def change_event_schema(payload: T.StructType, with_origin: bool = False) -> T.StructType:
    """StructType of a change DataFrame whose before/after images have `payload` type."""
    fields = [
        T.StructField("schema", T.StringType()),
        T.StructField("tb", T.StringType()),
        T.StructField("row_type", T.StringType()),
        T.StructField("before", payload),
        T.StructField("after", payload),
        T.StructField("seq", T.LongType()),
    ]
    if with_origin:
        fields.append(T.StructField("origin_node", T.StringType()))
    return T.StructType(fields)


def reverse_events(df: DataFrame) -> DataFrame:
    """Invert a change stream to generate *undo* events.

    insert -> delete, delete -> insert, update swaps before/after.
    Reference: ``RowData::reverse`` (dt-common/src/meta/row_data.rs:77-94), used
    by the SQL-file sinker's undo mode (dt-connector/src/sinker/sql_sinker.rs:15-53).
    """
    new_rt = (
        F.when(F.col("row_type") == ROW_TYPE_INSERT, F.lit(ROW_TYPE_DELETE))
        .when(F.col("row_type") == ROW_TYPE_DELETE, F.lit(ROW_TYPE_INSERT))
        .otherwise(F.col("row_type"))
    )
    # uniformly: new before = old after, new after = old before; null the
    # unused image (insert has no before, delete has no after)
    return df.withColumns(
        {
            "row_type": new_rt,
            "before": F.when(new_rt == ROW_TYPE_INSERT, F.lit(None).cast(df.schema["before"].dataType)).otherwise(
                F.col("after")
            ),
            "after": F.when(new_rt == ROW_TYPE_DELETE, F.lit(None).cast(df.schema["after"].dataType)).otherwise(
                F.col("before")
            ),
        }
    )


def split_updates(df: DataFrame) -> DataFrame:
    """update -> delete(before) + insert(after), preserving stream order.

    Needed by append-only sinks (ClickHouse/StarRocks soft-delete emulation) and
    by the merger. Reference: ``RowData::split_update_row_data``
    (dt-common/src/meta/row_data.rs:96-115).

    The emitted pair keeps ``seq`` and adds ``sub_seq`` (0 = delete half,
    1 = insert half) so ``ORDER BY seq, sub_seq`` reproduces apply order.
    Implemented as explode over a 2-element array — single narrow stage, no shuffle.
    """
    payload_t = df.schema["before"].dataType
    null_payload = F.lit(None).cast(payload_t)
    pair = F.when(
        F.col("row_type") == ROW_TYPE_UPDATE,
        F.array(
            F.struct(
                F.lit(ROW_TYPE_DELETE).alias("row_type"),
                F.col("before").alias("before"),
                null_payload.alias("after"),
                F.lit(0).alias("sub_seq"),
            ),
            F.struct(
                F.lit(ROW_TYPE_INSERT).alias("row_type"),
                null_payload.alias("before"),
                F.col("after").alias("after"),
                F.lit(1).alias("sub_seq"),
            ),
        ),
    ).otherwise(
        F.array(
            F.struct(
                F.col("row_type").alias("row_type"),
                F.col("before").alias("before"),
                F.col("after").alias("after"),
                F.lit(0).alias("sub_seq"),
            )
        )
    )
    other_cols = [c for c in df.columns if c not in ("row_type", "before", "after")]
    return (
        df.select(*other_cols, F.explode(pair).alias("_e"))
        .select(
            *other_cols,
            F.col("_e.row_type").alias("row_type"),
            F.col("_e.before").alias("before"),
            F.col("_e.after").alias("after"),
            F.col("_e.sub_seq").alias("sub_seq"),
        )
    )
