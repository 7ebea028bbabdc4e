"""DDL meta center (plans/meta_center.py).

Reference parity: the ``[metacenter]`` config section
(dt-common/src/config/meta_center_config.rs; task_config.rs:1444) and the
ddl_meta_center_test suite — a central store of applied DDL from which any
consumer reconstructs a table's schema as of a replication position.
"""

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ape_dts_spark.plans.meta_center import MetaCenter


def test_schema_at_replays_history(tmp_path):
    mc = MetaCenter(str(tmp_path / "meta.jsonl"))
    mc.register_base("db", "users", [("id", "BIGINT"), ("name", "VARCHAR(32)")], seq=0)
    mc.record_ddl("db", "users", "ALTER TABLE db.users ADD COLUMN age INT", seq=10)
    mc.record_ddl("db", "users", "ALTER TABLE users CHANGE COLUMN name full_name TEXT", seq=20)
    mc.record_ddl("db", "users", "ALTER TABLE users DROP COLUMN age", seq=30)

    assert mc.schema_at("db", "users", 5) == [("id", "BIGINT"), ("name", "VARCHAR(32)")]
    assert mc.schema_at("db", "users", 15) == [
        ("id", "BIGINT"), ("name", "VARCHAR(32)"), ("age", "INT")]
    at25 = mc.schema_at("db", "users", 25)
    assert ("full_name", at25[1][1]) == at25[1] and at25[1][0] == "full_name"
    assert mc.schema_at("db", "users") == [("id", "BIGINT"), (at25[1][0], at25[1][1])]
    # persistence: a fresh instance reads the same history
    mc2 = MetaCenter(str(tmp_path / "meta.jsonl"))
    assert mc2.schema_at("db", "users") == mc.schema_at("db", "users")


def test_multi_target_split_and_drop(tmp_path):
    """Multi-target statements split per table (split_to_multi parity);
    DROP TABLE tombstones schema_at."""
    mc = MetaCenter(str(tmp_path / "meta.jsonl"))
    mc.register_base("db", "a", [("id", "INT")], seq=0)
    mc.register_base("db", "b", [("id", "INT")], seq=0)
    parts = mc.record_ddl("db", "a", "DROP TABLE a, b", seq=10)
    assert sorted(p["tb"] for p in parts) == ["a", "b"]
    assert mc.schema_at("db", "a") is None and mc.schema_at("db", "b") is None
    assert mc.schema_at("db", "a", 5) == [("id", "INT")]


def test_rename_table_history_follows_forward(tmp_path):
    mc = MetaCenter(str(tmp_path / "meta.jsonl"))
    mc.register_base("db", "old", [("id", "INT")], seq=0)
    mc.record_ddl("db", "old", "RENAME TABLE old TO new", seq=10)
    mc.record_ddl("db", "new", "ALTER TABLE new ADD COLUMN v INT", seq=20)
    # querying by the ORIGINAL name follows the rename chain forward
    assert mc.schema_at("db", "old") == [("id", "INT"), ("v", "INT")]


def test_pipeline_records_applied_ddl(spark, tmp_path):
    """CdcPipeline with a meta center attached records the DDL it applies
    through the barrier (the [metacenter] wiring path)."""
    from ape_dts_spark.sinks.parquet_table import ParquetTable
    from ape_dts_spark.streaming.cdc import CdcPipeline, parse_debezium, write_debezium_jsonl

    payload = T.StructType([
        T.StructField("id", T.LongType()), T.StructField("name", T.StringType()),
        T.StructField("bal", T.LongType()),
    ])
    mc = MetaCenter(str(tmp_path / "meta.jsonl"))
    mc.register_base("d", "t", [("id", "BIGINT"), ("name", "TEXT"), ("bal", "BIGINT")])
    table = ParquetTable(spark, str(tmp_path / "tgt"), payload)
    pipe = CdcPipeline(spark, table, key_cols=["id"], meta_center=mc)
    events = [
        {"op": "c", "before": None, "after": {"id": 1, "name": "a", "bal": 1},
         "source": {"db": "d", "table": "t", "ts_ms": 1_700_000_000_000, "seq": 1}},
        {"op": "ddl", "ddl": "ALTER TABLE t ADD COLUMN note VARCHAR(16)",
         "source": {"db": "d", "table": "t", "ts_ms": 1_700_000_000_001, "seq": 2}},
    ]
    src = tmp_path / "src"
    src.mkdir()
    write_debezium_jsonl(events, os.path.join(src, "b.jsonl"))
    batch = parse_debezium(spark.read.text(str(src)), payload)
    pipe.apply_batch(batch, batch_id=0)
    assert "note" in table.current().columns
    assert mc.schema_at("d", "t") == [
        ("id", "BIGINT"), ("name", "TEXT"), ("bal", "BIGINT"), ("note", "VARCHAR(16)")]
