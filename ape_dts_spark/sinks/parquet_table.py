"""Versioned parquet target table with staged merge-apply.

The reference applies a compacted CDC write-set to the target in three ordered
stages: delete batch, then insert batch, then the unmergeable spill rows
serially (dt-parallelizer/src/merge_parallelizer.rs:54-113). On Spark the
idiomatic sink is a transactional table format (Delta/Iceberg ``MERGE INTO``);
this module provides a dependency-free local stand-in with the same apply
semantics: each apply computes the new table state as a DataFrame plan and
commits it as a new immutable version directory, with ``_meta.json`` pointing
at the current version (a micro table-format commit — readers never see a
partial write, and a failed apply leaves the previous version intact).

Scale note: the new state is ``target LEFT ANTI JOIN changed_keys`` plus the
upsert images — one shuffle on the key columns, broadcast when the change set
is small (Spark/AQE picks that automatically since the compacted batch is
usually tiny relative to the table). A real cluster deployment swaps this
class for Delta ``MERGE`` and keeps every operator upstream unchanged.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ape_dts_spark.model.changes import ROW_TYPE_DELETE, ROW_TYPE_INSERT


class ParquetTable:
    """A versioned parquet table supporting idempotent merge-apply commits."""

    def __init__(self, spark: SparkSession, path: str, payload_schema: T.StructType):
        self.spark = spark
        self.path = path
        self.payload_schema = payload_schema
        os.makedirs(path, exist_ok=True)

    # -- version bookkeeping -------------------------------------------------

    @property
    def _meta_path(self) -> str:
        return os.path.join(self.path, "_meta.json")

    def _read_meta(self) -> dict:
        if not os.path.exists(self._meta_path):
            return {"version": -1, "applied_batches": {}}
        with open(self._meta_path) as f:
            return json.load(f)

    def _write_meta(self, meta: dict) -> None:
        tmp = self._meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._meta_path)

    def current(self) -> DataFrame:
        meta = self._read_meta()
        if meta["version"] < 0:
            return self.spark.createDataFrame([], self.payload_schema)
        vdir = os.path.join(self.path, f"v{meta['version']}")
        return self.spark.read.schema(self.payload_schema).parquet(vdir)

    def last_applied(self, stream_id: str) -> int:
        """Highest foreachBatch epoch already committed for `stream_id`
        (exactly-once replay guard, the Structured Streaming idiom)."""
        return int(self._read_meta()["applied_batches"].get(stream_id, -1))

    def record_batch(self, stream_id: str, batch_id: int) -> None:
        """Mark an epoch applied without a data commit (used when a batch was
        applied in multiple DDL-separated segments)."""
        meta = self._read_meta()
        meta["applied_batches"][stream_id] = batch_id
        self._write_meta(meta)

    def add_column(self, field: T.StructField, ddl_text: str = "") -> None:
        """Schema evolution: ADD COLUMN. No data rewrite — parquet
        schema-on-read fills missing columns with NULL (the Delta
        ``mergeSchema`` analogue); the DDL is appended to the meta ddl_log
        (the reference refreshes cached metadata on DDL,
        dt-pipeline/src/base_pipeline.rs:268-305)."""
        if field.name in [f.name for f in self.payload_schema.fields]:
            return
        self.payload_schema = T.StructType(list(self.payload_schema.fields) + [field])
        meta = self._read_meta()
        meta.setdefault("ddl_log", []).append(
            {"ddl": ddl_text, "column": field.name, "type": field.dataType.simpleString()}
        )
        self._write_meta(meta)

    # -- apply ---------------------------------------------------------------

    def merge_apply(
        self,
        compacted: DataFrame,
        spilled: DataFrame,
        key_cols: list[str],
        stream_id: str = "default",
        batch_id: int | None = None,
    ) -> None:
        """Stage-ordered apply of a compacted write-set.

        1. every changed key leaves the table (covers delete AND upsert-replace)
        2. upsert images are appended
        3. spilled events replay serially in seq order (key-changing updates,
           NULL-key rows — the reference's unmerged path,
           dt-parallelizer/src/rdb_merger.rs:159-186)

        If ``batch_id`` is given and was already committed for ``stream_id``
        the apply is a no-op — making foreachBatch replays idempotent.
        """
        meta = self._read_meta()
        if batch_id is not None and meta["applied_batches"].get(stream_id, -1) >= batch_id:
            return

        state = self.current()
        changed_keys = compacted.select(*[F.col(k) for k in key_cols]).distinct()
        kept = state.join(changed_keys, key_cols, "left_anti")
        upserts = compacted.filter(F.col("op") == "upsert").select("after.*")
        state = kept.unionByName(upserts.select(*state.columns))

        # serial spill replay — inherently ordered, tiny by construction
        # (reference applies these rows one-by-one through a single sinker)
        for ev in spilled.orderBy("seq").collect():
            rt = ev["row_type"]
            before, after = ev["before"], ev["after"]
            if rt == ROW_TYPE_DELETE or (rt == "update" and before is not None):
                match = self._row_predicate(before, key_cols)
                state = state.filter(~match) if match is not None else state
            if rt != ROW_TYPE_DELETE and after is not None:
                row_df = self.spark.createDataFrame([after], self.payload_schema)
                state = state.unionByName(row_df.select(*state.columns))

        version = meta["version"] + 1
        vdir = os.path.join(self.path, f"v{version}")
        state.write.mode("overwrite").parquet(vdir)
        meta["version"] = version
        meta["committed_at"] = time.time()
        if batch_id is not None:
            meta["applied_batches"][stream_id] = batch_id
        self._write_meta(meta)

    def version(self) -> int:
        return int(self._read_meta()["version"])

    def at_version(self, version: int) -> DataFrame:
        if version < 0:
            return self.spark.createDataFrame([], self.payload_schema)
        return self.spark.read.schema(self.payload_schema).parquet(
            os.path.join(self.path, f"v{version}")
        )

    def changes_between(self, v_from: int, v_to: int, key_cols: list[str]) -> DataFrame:
        """Change feed between two committed versions — the Delta CDF / data-
        subscription analogue (docs/en/cdc/... pull-based consumption,
        dt-pipeline/src/http_server_pipeline.rs): diff the two immutable
        snapshots with the checker join and emit canonical change events
        (insert/update/delete with before/after images)."""
        from ape_dts_spark.operators.checker import check_diff

        old = self.at_version(v_from)
        new = self.at_version(v_to)
        d = check_diff(new, old, key_cols, include_extra=True)
        # miss = key only in new -> insert; extra = key only in old -> delete;
        # diff = both, columns changed -> update
        row_type = (
            F.when(F.col("check_class") == "miss", F.lit("insert"))
            .when(F.col("check_class") == "extra", F.lit("delete"))
            .otherwise(F.lit("update"))
        )
        rebuild = lambda side: F.when(  # noqa: E731
            F.col(side).isNotNull(),
            F.struct(*[F.col(k) for k in key_cols], F.col(side + ".*")),
        )
        return d.select(
            row_type.alias("row_type"),
            rebuild("dst").alias("before"),
            rebuild("src").alias("after"),
        )

    def _row_predicate(self, image, key_cols: list[str]):
        """Match rows by key when the image has non-NULL keys, else by every
        non-NULL column (the reference's no-PK whole-row match,
        dt-connector/src/rdb_query_builder.rs no-PK guards)."""
        if image is None:
            return None
        d = image.asDict() if hasattr(image, "asDict") else dict(image)
        keys_ok = all(d.get(k) is not None for k in key_cols)
        cols = key_cols if keys_ok else [c for c, v in d.items() if v is not None]
        if not cols:
            return None
        pred = F.lit(True)
        for c in cols:
            pred = pred & F.col(c).eqNullSafe(F.lit(d[c]))
        return pred
