"""End-to-end task assembly tests: task_config ini -> running pipeline
(dt-task parity; golden pattern = the reference's integration tests:
prepare -> run task -> compare target to source, dt-tests/README.md)."""

import json
import os

from ape_dts_spark.config.task_config import TaskConfig
from ape_dts_spark.streaming.cdc import write_debezium_jsonl
from ape_dts_spark.task import run_task

SF = "/root/testdata/sf0.001"


def test_snapshot_task_with_filter_and_route(spark, tmp_path):
    cfg = TaskConfig.from_string(
        f"""
[extractor]
extract_type=snapshot
url={SF}
db=default
tables=region,nation,customer

[filter]
do_tbs=default.region,default.nation

[router]
tb_map=default.region:default.region_v2

[sinker]
sink_type=parquet
url={tmp_path}/out

[parallelizer]
parallel_size=4
"""
    )
    res = run_task(spark, cfg)
    assert set(res.tables) == {"region_v2", "nation"}  # filter + rename applied
    src_n = spark.read.parquet(f"{SF}/region.parquet").count()
    assert res.tables["region_v2"].count() == src_n  # golden: target equals source


def test_snapshot_task_sql_file_sink(spark, tmp_path):
    cfg = TaskConfig.from_string(
        f"""
[extractor]
extract_type=snapshot
url={SF}
tables=region

[sinker]
sink_type=sql_file
url={tmp_path}/sql
"""
    )
    res = run_task(spark, cfg, registry={"region": ["r_regionkey"]})
    files = [
        os.path.join(root, f)
        for root, _, fs in os.walk(res.outputs["region"])
        for f in fs
        if f.endswith(".txt")
    ]
    lines = [ln for f in files for ln in open(f).read().splitlines()]
    n = spark.read.parquet(f"{SF}/region.parquet").count()
    assert len(lines) == n
    assert all(ln.startswith("INSERT INTO `default`.`region`") for ln in lines)


def test_check_then_revise_tasks(spark, tmp_path):
    # build a drifted target: drop some orders rows
    src_o = spark.read.parquet(f"{SF}/orders.parquet")
    os.makedirs(f"{tmp_path}/dst")
    src_o.filter("o_orderkey % 7 <> 0").write.parquet(f"{tmp_path}/dst/orders.parquet")

    check_cfg = TaskConfig.from_string(
        f"""
[extractor]
extract_type=check
url={SF}
tables=orders

[sinker]
sink_type=check_log
url={tmp_path}/check
compare_url={tmp_path}/dst
"""
    )
    res = run_task(spark, check_cfg, registry={"orders": ["o_orderkey"]})
    log_dir = res.outputs["orders"]
    rows = spark.read.text(log_dir).collect()
    misses = [json.loads(r["value"]) for r in rows]
    expected_miss = src_o.filter("o_orderkey % 7 = 0").count()
    assert len([m for m in misses if m["log_type"] == "miss"]) == expected_miss

    revise_cfg = TaskConfig.from_string(
        f"""
[extractor]
extract_type=check_log
url={SF}
tb=orders
check_log_dir={log_dir}

[sinker]
sink_type=parquet
url={tmp_path}/revised
"""
    )
    res2 = run_task(spark, revise_cfg, registry={"orders": ["o_orderkey"]})
    # revised target now holds every previously-missing row
    assert res2.tables["orders"].count() == expected_miss


def test_cdc_task(spark, tmp_path):
    src = tmp_path / "cdc_src"
    src.mkdir()
    events = [
        {"op": "c", "after": {"id": 1, "name": "a", "bal": 10},
         "source": {"db": "d", "table": "users", "ts_ms": 1700000000001, "seq": 1, "origin_node": None}},
        {"op": "u", "before": {"id": 1, "name": "a", "bal": 10}, "after": {"id": 1, "name": "a", "bal": 11},
         "source": {"db": "d", "table": "users", "ts_ms": 1700000000002, "seq": 2, "origin_node": None}},
    ]
    write_debezium_jsonl(events, str(src / "b.jsonl"))
    sample = tmp_path / "payload.parquet"
    spark.createDataFrame([(1, "a", 10)], "id long, name string, bal long").write.parquet(str(sample))

    cfg = TaskConfig.from_string(
        f"""
[extractor]
extract_type=cdc
url={src}
tb=users
payload_sample={sample}

[sinker]
sink_type=parquet
url={tmp_path}/cdc_out
"""
    )
    res = run_task(spark, cfg, registry={"users": ["id"]})
    rows = res.tables["users"].collect()
    assert len(rows) == 1 and rows[0]["bal"] == 11
    assert res.metrics


def test_snapshot_task_orc_sink(spark, tmp_path):
    """Foxlake path: snapshot -> ORC round trip (foxlake_pusher.rs parity)."""
    cfg = TaskConfig.from_string(
        f"""
[extractor]
extract_type=snapshot
url={SF}
tables=nation

[sinker]
sink_type=orc
url={tmp_path}/orc_out
"""
    )
    res = run_task(spark, cfg)
    src = spark.read.parquet(f"{SF}/nation.parquet")
    assert res.tables["nation"].count() == src.count()
    assert res.outputs["nation"].endswith(".orc")
    assert set(res.tables["nation"].columns) == set(src.columns)


def test_task_config_parses_ddl_dcl_structure_filters():
    cfg = TaskConfig.from_string(
        """
[extractor]
db_type=mysql
extract_type=cdc

[filter]
do_ddls=add_column,truncate_table
do_dcls=grant
do_structures=table,index
ignore_cmds=flush

[sinker]
sink_type=write
"""
    )
    f = cfg.filter
    assert not f.filter_ddl("add_column") and f.filter_ddl("drop_table")
    assert not f.filter_dcl("grant") and f.filter_dcl("revoke")
    assert not f.filter_structure("index") and f.filter_structure("sequence")
    assert f.filter_cmd("flush")


def test_cdc_task_with_script_processor(spark, tmp_path):
    """[processor] hook: the reference's lua_code_file UX with the identical
    variable contract (schema/tb/row_type/before/after; empty row_type drops
    the row) — docs/en/etl/lua.md examples translated line-for-line."""
    src = tmp_path / "cdc_src2"
    src.mkdir()
    events = [
        {"op": "c", "after": {"id": 1, "name": "a", "bal": 10},
         "source": {"db": "d", "table": "users", "ts_ms": 1700000000001, "seq": 1, "origin_node": None}},
        {"op": "c", "after": {"id": 2, "name": "skipme", "bal": 20},
         "source": {"db": "d", "table": "users", "ts_ms": 1700000000002, "seq": 2, "origin_node": None}},
        {"op": "u", "before": {"id": 1, "name": "a", "bal": 10}, "after": {"id": 1, "name": "a", "bal": 11},
         "source": {"db": "d", "table": "users", "ts_ms": 1700000000003, "seq": 3, "origin_node": None}},
    ]
    write_debezium_jsonl(events, str(src / "b.jsonl"))
    sample = tmp_path / "payload2.parquet"
    spark.createDataFrame([(1, "a", 10)], "id long, name string, bal long").write.parquet(str(sample))

    code_file = tmp_path / "processor.py"
    code_file.write_text(
        "if after is not None and after.get('name') == 'skipme':\n"
        "    row_type = ''\n"
        "if row_type == 'update' and after is not None:\n"
        "    after['bal'] = after['bal'] + 100\n"
    )
    cfg = TaskConfig.from_string(
        f"""
[extractor]
extract_type=cdc
url={src}
tb=users
payload_sample={sample}

[sinker]
sink_type=parquet
url={tmp_path}/cdc_out2

[processor]
python_code_file={code_file}
"""
    )
    res = run_task(spark, cfg, registry={"users": ["id"]})
    rows = {r["id"]: r["bal"] for r in res.tables["users"].collect()}
    assert rows == {1: 111}  # skipme filtered; update value mutated by script


def test_snapshot_task_fk_stage_order(spark, tmp_path):
    """FK mode sequences table stages parents-first while leaving
    intra-table parallelism alone (foreign_key_test parity)."""
    cfg = TaskConfig.from_string(
        f"""
[extractor]
extract_type=snapshot
url={SF}
db=default
tables=lineitem,customer,orders,nation,region
foreign_keys=nation:region,customer:nation,orders:customer,lineitem:orders

[sinker]
sink_type=parquet
url={tmp_path}/out
"""
    )
    res = run_task(spark, cfg)
    # dict insertion order records apply order
    assert list(res.outputs) == ["region", "nation", "customer", "orders", "lineitem"]
    for tb in res.tables:
        assert res.tables[tb].count() == spark.read.parquet(f"{SF}/{tb}.parquet").count()


def test_cli_main(spark, tmp_path, capsys):
    """dt-main parity: python -m ape_dts_spark <config> runs the task;
    --precheck runs and reports prechecks (non-zero exit on failures)."""
    import json as _json

    from ape_dts_spark.__main__ import main

    cfg = tmp_path / "task_config.ini"
    cfg.write_text(
        "[extractor]\nextract_type=snapshot\nurl=/root/testdata/sf0.001\n"
        "db=default\ntables=region\n\n"
        f"[sinker]\nsink_type=parquet\nurl={tmp_path}/out\n"
    )
    assert main([str(cfg)]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["kind"] == "snapshot" and out["tables"] == ["region"]
    assert spark.read.parquet(f"{tmp_path}/out/region.parquet").count() > 0

    assert main([str(cfg), "--precheck"]) == 0
    # a missing table makes precheck exit non-zero
    cfg.write_text(cfg.read_text().replace("tables=region", "tables=region,nosuch"))
    assert main([str(cfg), "--precheck"]) == 1


def test_example_configs_parse_and_registry_flows(spark, tmp_path):
    """examples/*.ini stay parseable, and the [registry] section feeds key
    columns into check/revise tasks (information_schema stand-in)."""
    import glob

    for path in sorted(glob.glob("/root/repo/examples/*.ini")):
        cfg = TaskConfig.from_file(path)
        assert cfg.extractor.get("extract_type") in ("snapshot", "check", "check_log", "cdc"), path

    cfg = TaskConfig.from_string(
        f"""
[extractor]
extract_type=check
url=/root/testdata/sf0.001
tables=region

[sinker]
sink_type=check_log
url={tmp_path}/chk
compare_url=/root/testdata/sf0.001

[registry]
region=r_regionkey
"""
    )
    res = run_task(spark, cfg)  # no explicit registry: the ini section drives it
    assert "region" in res.outputs


def test_cdc_task_wires_marker_resumer_metacenter(spark, tmp_path):
    """The [data_marker]/[resumer]/[metacenter] ini sections reach the
    pipeline: origin-marked echoes are dropped, a position.log checkpoint
    line lands per batch, and applied DDL is recorded centrally
    (data_marker_config.rs / resumer_config.rs FromLog /
    meta_center_config.rs key parity)."""
    import json as _json
    import os as _os

    from ape_dts_spark.config.task_config import TaskConfig
    from ape_dts_spark.model.position import PositionLog
    from ape_dts_spark.plans.meta_center import MetaCenter
    from ape_dts_spark.streaming.cdc import write_debezium_jsonl
    from ape_dts_spark.task import run_task

    src = tmp_path / "src"
    dst = tmp_path / "dst"
    src.mkdir()
    dst.mkdir()
    sample = tmp_path / "payload.parquet"
    spark.createDataFrame([(1, "a", 2)], "id long, name string, bal long").write.parquet(str(sample))

    events = [
        {"op": "c", "before": None, "after": {"id": 1, "name": "a", "bal": 1},
         "source": {"db": "d", "table": "users", "ts_ms": 1_700_000_000_000, "seq": 1}},
        # an echo from THIS node's own origin must be dropped
        {"op": "c", "before": None, "after": {"id": 2, "name": "echo", "bal": 2},
         "source": {"db": "d", "table": "users", "ts_ms": 1_700_000_000_001, "seq": 2,
                    "origin_node": "node_a"}},
        {"op": "ddl", "ddl": "ALTER TABLE users ADD COLUMN note VARCHAR(8)",
         "source": {"db": "d", "table": "users", "ts_ms": 1_700_000_000_002, "seq": 3}},
    ]
    write_debezium_jsonl(events, _os.path.join(str(src), "b.jsonl"))
    meta_path = str(tmp_path / "meta.jsonl")
    MetaCenter(meta_path).register_base(
        "d", "users", [("id", "BIGINT"), ("name", "TEXT"), ("bal", "BIGINT")])
    cfg = TaskConfig.from_string(f"""
[extractor]
db_type=mysql
extract_type=cdc
url={src}
tb=users
payload_sample={sample}
[sinker]
db_type=mysql
sink_type=parquet
url={dst}
[filter]
[router]
[pipeline]
[parallelizer]
[runtime]
[registry]
users=id
[data_marker]
topo_name=star
src_node=node_a
ignore_nodes=node_a
[resumer]
resume_from_log=true
resume_log_dir={tmp_path}/poslog
[metacenter]
type=dbengine
url={meta_path}
""")
    result = run_task(spark, cfg)
    state = {r["id"] for r in result.tables["users"].collect()}
    assert state == {1}  # the echo was origin-filtered
    got = PositionLog(str(tmp_path / "poslog" / "position.log")).latest()
    assert got is not None and got.offset == 3
    assert MetaCenter(meta_path).schema_at("d", "users")[-1] == ("note", "VARCHAR(8)")
