"""Write-set compaction decision table — mirrors rdb_merger.rs:222-299 inline tests."""

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from ape_dts_spark.model.changes import change_event_schema
from ape_dts_spark.operators.merge import compact_changes

PAYLOAD = T.StructType([T.StructField("id", T.LongType()), T.StructField("v", T.StringType())])


def ev(rt, before, after, seq):
    return Row(
        schema="s",
        tb="t",
        row_type=rt,
        before=Row(id=before[0], v=before[1]) if before else None,
        after=Row(id=after[0], v=after[1]) if after else None,
        seq=seq,
    )


@pytest.fixture(scope="module")
def make(spark):
    def _make(rows):
        return spark.createDataFrame(rows, change_event_schema(PAYLOAD))

    return _make


def test_last_event_wins(make):
    df = make(
        [
            ev("insert", None, (1, "a"), 1),
            ev("update", (1, "a"), (1, "b"), 2),
            ev("update", (1, "b"), (1, "c"), 3),
        ]
    )
    compacted, spilled = compact_changes(df, ["id"])
    rows = compacted.collect()
    assert spilled.count() == 0
    assert len(rows) == 1
    assert rows[0]["op"] == "upsert" and rows[0]["after"]["v"] == "c" and rows[0]["seq"] == 3


def test_insert_then_delete_yields_delete(make):
    df = make([ev("insert", None, (1, "a"), 1), ev("delete", (1, "a"), None, 2)])
    compacted, _ = compact_changes(df, ["id"])
    rows = compacted.collect()
    assert len(rows) == 1 and rows[0]["op"] == "delete" and rows[0]["id"] == 1


def test_null_key_spills(make):
    df = make([ev("insert", None, (None, "a"), 1), ev("insert", None, (2, "b"), 2)])
    compacted, spilled = compact_changes(df, ["id"])
    assert compacted.count() == 1
    assert spilled.count() == 1
    assert spilled.collect()[0]["after"]["v"] == "a"


def test_key_change_update_spills(make):
    df = make([ev("update", (1, "a"), (9, "a"), 1), ev("update", (2, "b"), (2, "b2"), 2)])
    compacted, spilled = compact_changes(df, ["id"])
    assert spilled.count() == 1 and spilled.collect()[0]["before"]["id"] == 1
    rows = compacted.collect()
    assert len(rows) == 1 and rows[0]["id"] == 2


def test_no_keys_all_spill(make):
    df = make([ev("insert", None, (1, "a"), 1)])
    compacted, spilled = compact_changes(df, [])
    assert compacted.count() == 0
    assert spilled.count() == 1


def test_delete_keyed_by_before_image(make):
    # delete's merge key comes from the before image (rdb_merger.rs:106-121)
    df = make([ev("delete", (7, "x"), None, 1)])
    compacted, spilled = compact_changes(df, ["id"])
    rows = compacted.collect()
    assert spilled.count() == 0
    assert len(rows) == 1 and rows[0]["id"] == 7 and rows[0]["op"] == "delete"
