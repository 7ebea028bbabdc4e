"""Foxlake push sequencing: sequence-numbered ORC pushes + idempotent,
order-independent merge.

Reference parity: dt-connector/src/sinker/foxlake/orc_sequencer.rs (the
(sequencer_id, push_epoch, push_sequence) counter with its 999999999
rollover) and foxlake_pusher.rs:154-538 (ORC data files carrying appended
``cdc_action`` / ``cdc_log_sequence`` columns, meta files named
``{sequencer_id:010}_{push_sequence:010}_log_dml_{log_seq}_{uuid}`` so the
downstream merge can totally order pushes, the ``meta/finished`` marker,
and the insert-only fast path). foxlake_merger.rs:47-114 then merges the
named files into the table — here that merge is a Spark job.

Spark-first shape: a push writes ONE ORC dataset directory per batch via
the native writer (columnar, predicate-pushdown-able on re-read); the merge
reads ALL pushed files in one distributed scan, maps each row to its
push ordinal by joining ``input_file_name()`` against the (small,
broadcast) manifest, and resolves the final row per key with one map-side
``max_by`` aggregation — one shuffle on the primary key, no driver-side
row handling. Duplicate sequence numbers (a retried push after a crash)
deduplicate in the manifest, so replaying the same file twice — or pushing
files in any wall-clock order — converges to the same table state: the
property the reference buys with its global sequence counter.

The deterministic deviation from the reference: OrcSequencer's id/epoch are
injectable instead of ``Utc::now()`` (tests and gates must be replayable),
and rollover bumps the id by 1 — any strictly increasing id preserves the
ordering contract.
"""

from __future__ import annotations

import json
import os
import re
import uuid as _uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# cdc_action codes, foxlake_pusher.rs:375-381
ACTION_INSERT = 0
ACTION_UPDATE = 1
ACTION_DELETE = 2

_ROLLOVER = 999_999_999  # orc_sequencer.rs:29

_META_RE = re.compile(r"^(\d{10})_(\d{10})_(log_dml_.+)\.json$")


@dataclass
class OrcSequenceInfo:
    sequencer_id: int
    push_epoch: int
    push_sequence: int


class OrcSequencer:
    """Deterministic twin of orc_sequencer.rs: hands out monotonically
    increasing (sequencer_id, push_sequence) pairs; ``update_epoch`` stamps
    a new epoch on DDL-like boundaries (the pusher calls it per batch
    group); sequence rollover starts a fresh, larger sequencer id so
    ordering by (sequencer_id, push_sequence) stays total."""

    def __init__(self, sequencer_id: int, epoch: int | None = None):
        self.id = int(sequencer_id)
        self.epoch = int(epoch if epoch is not None else sequencer_id)
        self.sequence = 0

    def update_epoch(self, epoch: int) -> None:
        self.epoch = int(epoch)

    def get_sequence(self) -> OrcSequenceInfo:
        if self.sequence >= _ROLLOVER:
            self.id += 1
            self.sequence = 0
        info = OrcSequenceInfo(self.id, self.epoch, self.sequence)
        self.sequence += 1
        return info


def _tb_dir(root: str, schema: str, tb: str) -> str:
    return os.path.join(root, schema, tb)


def push_batch(
    df: DataFrame,
    root: str,
    schema: str,
    tb: str,
    sequencer: OrcSequencer,
    action_col: str = "cdc_action",
    log_sequence: str = "0_0",
    push_uuid: str | None = None,
    sequence_info: OrcSequenceInfo | None = None,
) -> dict:
    """Push one change batch as a sequence-numbered ORC file set.

    ``df`` carries the row image plus ``action_col`` (0 insert / 1 update /
    2 delete, the cdc_action encoding); a missing column means insert-only.
    Writes ``{root}/{schema}/{tb}/log_dml_{log_sequence}_{uuid}.orc/`` (one
    Spark ORC dataset = the reference's one data object) and the meta JSON
    ``meta/{sid:010}_{seq:010}_log_dml_..json``. Returns the meta record.
    Pass ``sequence_info`` to RE-PUSH an already-assigned sequence (the
    crash-retry path the merge must dedupe); contract within a push: at
    most one row per primary key (merge_parallelizer.rs compacts batches
    before they reach the pusher)."""
    if action_col not in df.columns:
        df = df.withColumn(action_col, F.lit(ACTION_INSERT))
    out = df.withColumnRenamed(action_col, "cdc_action").withColumn(
        "cdc_log_sequence", F.lit(0).cast("long")
    )
    insert_only = out.filter(F.col("cdc_action") != ACTION_INSERT).isEmpty()
    name = f"log_dml_{log_sequence}_{push_uuid or _uuid.uuid4().hex}"
    data_path = os.path.join(_tb_dir(root, schema, tb), name + ".orc")
    out.write.mode("overwrite").orc(data_path)

    info = sequence_info or sequencer.get_sequence()
    meta = {
        "sequencer_id": info.sequencer_id,
        "push_epoch": info.push_epoch,
        "push_sequence": info.push_sequence,
        "schema": schema,
        "tb": tb,
        "data_file_name": name + ".orc",
        "insert_only": insert_only,
    }
    meta_dir = os.path.join(_tb_dir(root, schema, tb), "meta")
    os.makedirs(meta_dir, exist_ok=True)
    meta_name = f"{info.sequencer_id:010d}_{info.push_sequence:010d}_{name}.json"
    tmp = os.path.join(meta_dir, meta_name + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, sort_keys=True)
    os.replace(tmp, os.path.join(meta_dir, meta_name))
    return meta


def mark_finished(root: str, schema: str, tb: str) -> str:
    """The pusher's end-of-stream marker (foxlake_pusher.rs:69-73)."""
    path = os.path.join(_tb_dir(root, schema, tb), "meta", "finished")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("")
    return path


_META_KEYS = frozenset(
    ("sequencer_id", "push_epoch", "push_sequence", "schema", "tb",
     "data_file_name", "insert_only")
)


def read_manifest(
    root: str, schema: str, tb: str, require_finished: bool = False
) -> list[dict]:
    """Meta dir -> push records ordered by (sequencer_id, push_sequence),
    DEDUPLICATED on the sequence pair (first meta in filename order wins —
    a retried push re-names the same sequence, so replay is idempotent).
    Driver-side listing is small by contract: one meta record per pushed
    batch.

    Hardened against a damaged meta directory — corruption is confined to
    ValueError naming the offending file, never a silently wrong merge:
    truncated/corrupt JSON, missing/mistyped fields, a filename whose
    encoded (sequencer_id, push_sequence) disagrees with the JSON body, a
    data_file_name that path-escapes the table dir or doesn't match the
    pusher's naming, or (with ``require_finished``) a missing end-of-stream
    marker. Non-conforming filenames (editor droppings, .tmp leftovers from
    a crashed rename) are skipped — they were never commits."""
    meta_dir = os.path.join(_tb_dir(root, schema, tb), "meta")
    if require_finished and not os.path.exists(os.path.join(meta_dir, "finished")):
        raise ValueError(
            f"push stream not finished: no meta/finished marker under {meta_dir}"
        )
    records: dict[tuple[int, int], dict] = {}
    for fname in sorted(os.listdir(meta_dir)):
        m = _META_RE.match(fname)
        if not m:
            continue  # 'finished', .tmp from a crashed rename, droppings
        path = os.path.join(meta_dir, fname)
        try:
            with open(path) as f:
                meta = json.load(f)
        except (json.JSONDecodeError, UnicodeDecodeError) as exc:
            raise ValueError(f"corrupt push meta {path}: {exc}") from exc
        if not isinstance(meta, dict) or not _META_KEYS <= set(meta):
            raise ValueError(
                f"push meta {path} is missing fields "
                f"{sorted(_META_KEYS - set(meta if isinstance(meta, dict) else ()))}"
            )
        if not all(isinstance(meta[k], int) for k in
                   ("sequencer_id", "push_epoch", "push_sequence")):
            raise ValueError(f"push meta {path} has non-integer sequence fields")
        if (int(m.group(1)), int(m.group(2))) != (
            meta["sequencer_id"], meta["push_sequence"]
        ):
            raise ValueError(
                f"push meta {path}: filename sequence {m.group(1)}_{m.group(2)} "
                f"disagrees with body ({meta['sequencer_id']}, "
                f"{meta['push_sequence']})"
            )
        dfn = meta["data_file_name"]
        if (not isinstance(dfn, str) or os.path.basename(dfn) != dfn
                or not dfn.startswith("log_dml_") or not dfn.endswith(".orc")):
            raise ValueError(f"push meta {path}: bad data_file_name {dfn!r}")
        key = (meta["sequencer_id"], meta["push_sequence"])
        records.setdefault(key, meta)
    return [records[k] for k in sorted(records)]


def merge_pushes(
    spark: SparkSession,
    root: str,
    schema: str,
    tb: str,
    pk_cols: list[str],
    require_finished: bool = False,
) -> DataFrame:
    """Merge every pushed file into the final table state — the Spark twin
    of foxlake_merger.rs's MERGE-over-named-files, made order-independent:

    1. read the manifest, dedupe + total-order pushes by
       (sequencer_id, push_sequence) -> a push ordinal;
    2. ONE distributed ORC scan over all data files; each row finds its
       ordinal by regexp-extracting the push name from input_file_name()
       and joining the broadcast manifest relation (no per-file jobs);
    3. one ``max_by(row, (ordinal, cdc_log_sequence))`` per primary key —
       map-side partial agg, single shuffle — then drop rows whose final
       action is DELETE.

    Result: the same DataFrame no matter the order files were pushed or
    how often a sequence was retried."""
    manifest = read_manifest(root, schema, tb, require_finished=require_finished)
    if not manifest:
        raise ValueError(f"no pushed files under {root}/{schema}/{tb}/meta")
    paths = [
        os.path.join(_tb_dir(root, schema, tb), m["data_file_name"]) for m in manifest
    ]
    missing = [p for p in paths if not os.path.exists(p)]
    if missing:  # fail with the manifest's story, not a mid-scan surprise
        raise ValueError(f"manifest references missing push data: {missing}")
    ords = spark.createDataFrame(
        [(m["data_file_name"][: -len(".orc")], i) for i, m in enumerate(manifest)],
        "push_name string, push_ord long",
    )
    rows = (
        spark.read.format("orc").load(paths)
        .withColumn(
            "push_name",
            F.regexp_extract(F.input_file_name(), r"(log_dml_[^/]+)\.orc", 1),
        )
        .join(F.broadcast(ords), "push_name")
    )
    data_cols = [
        c
        for c in rows.columns
        if c not in ("push_name", "push_ord", "cdc_action", "cdc_log_sequence")
    ]
    order_key = F.struct(F.col("push_ord"), F.col("cdc_log_sequence"))
    last = rows.groupBy(*pk_cols).agg(
        F.max_by(
            F.struct(
                *[F.col(c) for c in data_cols if c not in pk_cols],
                F.col("cdc_action"),
            ),
            order_key,
        ).alias("_last")
    )
    final = last.filter(F.col("_last.cdc_action") != ACTION_DELETE)
    return final.select(
        *pk_cols,
        *[
            F.col(f"_last.{c}").alias(c)
            for c in data_cols
            if c not in pk_cols
        ],
    )
