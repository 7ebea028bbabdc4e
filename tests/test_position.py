"""Typed position round-trips + ordering + GTID set algebra.

Mirrors the reference's position.rs:136-259 round-trip tests.
"""

import pytest

from ape_dts_spark.model.position import (
    FoxlakeS3Position,
    GtidSet,
    KafkaPosition,
    MongoCdcPosition,
    MysqlCdcPosition,
    PgCdcPosition,
    RdbSnapshotFinished,
    RdbSnapshotPosition,
    RedisPosition,
    from_json,
    newer,
    to_json,
)

ROUND_TRIPS = [
    KafkaPosition("topic1", 3, 42_000),
    RdbSnapshotPosition("mysql", "db1", "tb1", (5, "abc")),
    RdbSnapshotFinished("pg", "public", "orders"),
    MysqlCdcPosition("mysql-bin.000007", 1234, "uuid:1-5", "2026-01-01 00:00:00"),
    PgCdcPosition("16/B374D848", "2026-01-01 00:00:00"),
    MongoCdcPosition("82646E...", 1735689600),
    RedisPosition("b9f1c2", 987654),
    FoxlakeS3Position("s3://bucket/meta/000001.meta", 17),
]


@pytest.mark.parametrize("pos", ROUND_TRIPS, ids=lambda p: type(p).__name__)
def test_json_round_trip(pos):
    restored = from_json(to_json(pos))
    assert restored == pos
    assert to_json(restored) == to_json(pos)


def test_binlog_ordering_across_rotation():
    older = MysqlCdcPosition("mysql-bin.000007", 999_999)
    later = MysqlCdcPosition("mysql-bin.000010", 4)  # later file wins despite lower pos
    assert newer(older, later) == later
    assert newer(later, older) == later


def test_lsn_ordering():
    a = PgCdcPosition("0/FFFFFFFF")
    b = PgCdcPosition("1/00000000")
    assert b.lsn_value() == a.lsn_value() + 1
    assert newer(a, b) == b


def test_cross_kind_comparison_rejected():
    with pytest.raises(TypeError):
        newer(KafkaPosition("t", 0, 1), PgCdcPosition("0/1"))


def test_gtid_parse_normalizes():
    g = GtidSet.parse("UUID-A:3-5:1-2,uuid-b:7")
    assert g.to_text() == "uuid-a:1-5,uuid-b:7"  # adjacent ranges coalesce, case folds


def test_gtid_contains_and_union():
    executed = GtidSet.parse("s1:1-100,s2:1-10")
    resumed = GtidSet.parse("s1:50-80")
    assert executed.contains(resumed)
    assert not resumed.contains(executed)
    gap = GtidSet.parse("s1:90-120,s3:1")
    u = executed.union(gap)
    assert u.to_text() == "s1:1-120,s2:1-10,s3:1"
    assert u.contains(executed) and u.contains(gap)


def test_gtid_single_id_not_range():
    g = GtidSet.parse("s1:5")
    assert g.intervals == {"s1": ((5, 5),)}
    assert g.to_text() == "s1:5"


def test_snapshot_finished_pair_ordering():
    # a legal same-kind pair: newer() must return one of them, not raise
    from ape_dts_spark.model.position import RdbSnapshotFinished, newer

    a = RdbSnapshotFinished("mysql", "db", "t1")
    b = RdbSnapshotFinished("mysql", "db", "t1")
    assert newer(a, b) in (a, b)


def test_position_log_resume_uses_checkpoint_not_current():
    """position.log protocol: current_position may sit mid-transaction;
    resume must recover the LATEST checkpoint_position line and round-trip
    every typed position through the line format."""
    import tempfile, os
    from ape_dts_spark.model.position import (
        MysqlCdcPosition, PgCdcPosition, PositionLog, RedisPosition,
    )

    path = os.path.join(tempfile.mkdtemp(), "position.log")
    log = PositionLog(path)
    log.checkpoint(MysqlCdcPosition(binlog_filename="mysql-bin.000004",
                                    next_event_position=44315, gtid_set=""))
    log.current(MysqlCdcPosition(binlog_filename="mysql-bin.000004",
                                 next_event_position=50000, gtid_set=""))
    log.checkpoint(MysqlCdcPosition(binlog_filename="mysql-bin.000004",
                                    next_event_position=50865,
                                    gtid_set="9663a096:1-3112"))
    log.current(MysqlCdcPosition(binlog_filename="mysql-bin.000005",
                                 next_event_position=10, gtid_set=""))

    got = log.latest()
    assert got.next_event_position == 50865 and got.gtid_set == "9663a096:1-3112"
    cur = log.latest("current_position")
    assert cur.binlog_filename == "mysql-bin.000005"

    # other kinds round-trip through the same line format
    log2 = PositionLog(os.path.join(os.path.dirname(path), "pg.log"))
    log2.checkpoint(PgCdcPosition(lsn="0/5D65CB0"))
    log2.checkpoint(RedisPosition(repl_id="abc", repl_offset=12345))
    assert log2.latest().repl_offset == 12345
    assert PositionLog(path + ".absent").latest() is None
