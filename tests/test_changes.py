"""reverse / update-split semantics (row_data.rs:77-115)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from ape_dts_spark.model.changes import change_event_schema, reverse_events, split_updates

PAYLOAD = T.StructType([T.StructField("id", T.LongType()), T.StructField("v", T.StringType())])


@pytest.fixture(scope="module")
def stream(spark):
    rows = [
        Row(schema="s", tb="t", row_type="insert", before=None, after=Row(id=1, v="a"), seq=1),
        Row(schema="s", tb="t", row_type="update", before=Row(id=2, v="old"), after=Row(id=2, v="new"), seq=2),
        Row(schema="s", tb="t", row_type="delete", before=Row(id=3, v="x"), after=None, seq=3),
    ]
    return spark.createDataFrame(rows, change_event_schema(PAYLOAD))


def test_reverse(stream):
    out = {r["seq"]: r for r in reverse_events(stream).collect()}
    assert out[1]["row_type"] == "delete"
    assert out[1]["before"]["v"] == "a" and out[1]["after"] is None
    assert out[2]["row_type"] == "update"
    assert out[2]["before"]["v"] == "new" and out[2]["after"]["v"] == "old"
    assert out[3]["row_type"] == "insert"
    assert out[3]["after"]["v"] == "x" and out[3]["before"] is None


def test_double_reverse_is_identity(stream):
    twice = reverse_events(reverse_events(stream))
    assert sorted(map(str, twice.collect())) == sorted(map(str, stream.collect()))


def test_update_split(stream):
    out = split_updates(stream).orderBy("seq", "sub_seq").collect()
    assert [r["row_type"] for r in out] == ["insert", "delete", "insert", "delete"]
    # the update pair: delete carries before, insert carries after
    d, i = out[1], out[2]
    assert d["seq"] == i["seq"] == 2
    assert (d["sub_seq"], i["sub_seq"]) == (0, 1)
    assert d["before"]["v"] == "old" and d["after"] is None
    assert i["after"]["v"] == "new" and i["before"] is None
