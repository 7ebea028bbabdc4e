"""Typed replication positions: the checkpoint/watermark union.

Reference: ``Position`` in dt-common/src/meta/position.rs:13-64 — Kafka
offsets, RdbSnapshot keyset cursors, MySQL binlog (file, pos, GTID set),
PG LSN, Mongo resume tokens, Redis replication offsets — with JSON
round-trips exercised by position.rs:136-259. The Spark engine checkpoints
through Structured Streaming + epoch tables, but tasks still need the typed
positions at the *edges*: resuming a Debezium/Kafka feed from a recorded
offset, comparing two binlog coordinates to pick the newer, merging GTID
sets after a failover, formatting a position for the heartbeat/monitor
surface.

All positions are frozen dataclasses with ``to_json``/``from_json``
round-trips and, where the reference defines one, a total order
(``sort_key``): binlog = (file index, event position), LSN = 64-bit value
parsed from ``X/Y`` hex, Kafka = (topic, partition, offset), snapshot =
keyset tuple. GTID sets get set-algebra (contains/union) used when stitching
resumed streams.
"""

from __future__ import annotations

import json
import re
from dataclasses import asdict, dataclass, field


@dataclass(frozen=True)
class KafkaPosition:
    topic: str
    partition: int
    offset: int

    def sort_key(self) -> tuple:
        return (self.topic, self.partition, self.offset)


@dataclass(frozen=True)
class RdbSnapshotPosition:
    db_type: str
    schema: str
    tb: str
    order_key: tuple = ()

    def sort_key(self) -> tuple:
        return tuple(self.order_key)


@dataclass(frozen=True)
class RdbSnapshotFinished:
    db_type: str
    schema: str
    tb: str

    def sort_key(self) -> tuple:
        # all finished markers for a table are equivalent: newer() of two is
        # a legal same-kind comparison and must not raise (it used to
        # AttributeError because this class defined no key at all)
        return ()


@dataclass(frozen=True)
class MysqlCdcPosition:
    binlog_filename: str
    next_event_position: int
    gtid_set: str = ""
    timestamp: str = ""

    def file_index(self) -> int:
        """mysql-bin.000007 -> 7; the numeric suffix is the rotation order."""
        m = re.search(r"\.(\d+)$", self.binlog_filename)
        if not m:
            raise ValueError(f"binlog filename without numeric suffix: {self.binlog_filename!r}")
        return int(m.group(1))

    def sort_key(self) -> tuple:
        return (self.file_index(), self.next_event_position)


@dataclass(frozen=True)
class PgCdcPosition:
    lsn: str  # textual X/Y form, e.g. "16/B374D848"
    timestamp: str = ""

    def lsn_value(self) -> int:
        hi, lo = self.lsn.split("/")
        return (int(hi, 16) << 32) | int(lo, 16)

    def sort_key(self) -> tuple:
        return (self.lsn_value(),)


@dataclass(frozen=True)
class MongoCdcPosition:
    resume_token: str
    operation_time: int = 0

    def sort_key(self) -> tuple:
        return (self.operation_time, self.resume_token)


@dataclass(frozen=True)
class RedisPosition:
    repl_id: str
    repl_offset: int

    def sort_key(self) -> tuple:
        return (self.repl_offset,)


@dataclass(frozen=True)
class FoxlakeS3Position:
    s3_meta_file: str
    sequence: int = 0

    def sort_key(self) -> tuple:
        return (self.sequence, self.s3_meta_file)


_KINDS = {
    "Kafka": KafkaPosition,
    "RdbSnapshot": RdbSnapshotPosition,
    "RdbSnapshotFinished": RdbSnapshotFinished,
    "MysqlCdc": MysqlCdcPosition,
    "PgCdc": PgCdcPosition,
    "MongoCdc": MongoCdcPosition,
    "Redis": RedisPosition,
    "FoxlakeS3": FoxlakeS3Position,
}
_NAMES = {v: k for k, v in _KINDS.items()}

Position = (
    KafkaPosition
    | RdbSnapshotPosition
    | RdbSnapshotFinished
    | MysqlCdcPosition
    | PgCdcPosition
    | MongoCdcPosition
    | RedisPosition
    | FoxlakeS3Position
)


def to_json(pos: Position) -> str:
    d = asdict(pos)
    if isinstance(pos, RdbSnapshotPosition):
        d["order_key"] = list(pos.order_key)
    return json.dumps({"type": _NAMES[type(pos)], **d}, sort_keys=True)


def from_json(s: str) -> Position:
    d = json.loads(s)
    kind = d.pop("type")
    cls = _KINDS[kind]
    if cls is RdbSnapshotPosition:
        d["order_key"] = tuple(d.get("order_key") or ())
    return cls(**d)


def newer(a: Position, b: Position) -> Position:
    """The later of two positions of the same kind (checkpoint advance)."""
    if type(a) is not type(b):
        raise TypeError(f"cannot order {type(a).__name__} against {type(b).__name__}")
    return a if a.sort_key() >= b.sort_key() else b


# ---------------------------------------------------------------------------
# GTID sets — "uuid:1-5:8-10,uuid2:1-3" (MySQL canonical text)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class GtidSet:
    """Interval set per source UUID, normalized (sorted, coalesced)."""

    intervals: dict[str, tuple[tuple[int, int], ...]] = field(default_factory=dict)

    @classmethod
    def parse(cls, text: str) -> GtidSet:
        out: dict[str, list[tuple[int, int]]] = {}
        for part in filter(None, (p.strip() for p in text.split(","))):
            uuid, *ranges = part.split(":")
            if not ranges:
                raise ValueError(f"GTID without ranges: {part!r}")
            for r in ranges:
                lo, _, hi = r.partition("-")
                a, b = int(lo), int(hi) if hi else int(lo)
                out.setdefault(uuid.lower(), []).append((a, b))
        return cls({u: _coalesce(iv) for u, iv in out.items()})

    def to_text(self) -> str:
        parts = []
        for uuid in sorted(self.intervals):
            rs = ":".join(f"{a}-{b}" if a != b else str(a) for a, b in self.intervals[uuid])
            parts.append(f"{uuid}:{rs}")
        return ",".join(parts)

    def contains(self, other: GtidSet) -> bool:
        """True when every transaction in `other` is also in `self`."""
        for uuid, ivs in other.intervals.items():
            mine = self.intervals.get(uuid, ())
            for a, b in ivs:
                if not any(ma <= a and b <= mb for ma, mb in mine):
                    return False
        return True

    def union(self, other: GtidSet) -> GtidSet:
        merged = {u: list(iv) for u, iv in self.intervals.items()}
        for u, iv in other.intervals.items():
            merged.setdefault(u, []).extend(iv)
        return GtidSet({u: _coalesce(iv) for u, iv in merged.items()})


def _coalesce(intervals: list[tuple[int, int]]) -> tuple[tuple[int, int], ...]:
    out: list[tuple[int, int]] = []
    for a, b in sorted(intervals):
        if out and a <= out[-1][1] + 1:
            out[-1] = (out[-1][0], max(out[-1][1], b))
        else:
            out.append((a, b))
    return tuple(out)


# ---------------------------------------------------------------------------
# position.log — task-progress protocol (docs/en/monitor/position.md)
# ---------------------------------------------------------------------------


@dataclass
class PositionLog:
    """The reference's position.log protocol: progress lines
    ``<ts> | <kind> | <position json>`` written periodically
    (checkpoint_interval_secs), with TWO kinds per CDC task —

    - ``current_position``: how far data has synced; may point INSIDE a
      large transaction's binlog/WAL span.
    - ``checkpoint_position``: the last fully-synced transaction boundary.

    Resume MUST start from the latest checkpoint_position — resuming from
    current_position can land mid-transaction and fail binlog/WAL parsing
    (docs/en/monitor/position.md). ``latest`` therefore defaults to the
    checkpoint kind; snapshot tasks log ``current_position`` only and pass
    kind explicitly.
    """

    path: str

    def record(self, kind: str, pos: Position, ts: str | None = None) -> None:
        import datetime

        stamp = ts or datetime.datetime.now(datetime.timezone.utc).strftime(
            "%Y-%m-%d %H:%M:%S.%f"
        )
        with open(self.path, "a") as fh:
            fh.write(f"{stamp} | {kind} | {to_json(pos)}\n")

    def checkpoint(self, pos: Position, ts: str | None = None) -> None:
        self.record("checkpoint_position", pos, ts)

    def current(self, pos: Position, ts: str | None = None) -> None:
        self.record("current_position", pos, ts)

    def latest(self, kind: str = "checkpoint_position") -> Position | None:
        import os as _os

        if not _os.path.exists(self.path):
            return None
        best = None
        with open(self.path) as fh:
            for line in fh:
                parts = line.rstrip("\n").split(" | ", 2)
                if len(parts) != 3 or parts[1] != kind:
                    continue
                best = from_json(parts[2])  # last line wins (append order)
        return best
