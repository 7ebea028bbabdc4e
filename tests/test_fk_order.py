"""FK-aware apply ordering: longest-path levels, stage plans, cycle handling.

Reference: foreign_keys metadata in rdb_tb_meta.rs:11-23; FK mode drops to the
serial parallelizer (SURVEY §2.6) — the stage plan here keeps intra-table
parallelism and only sequences table stages.
"""

import pytest

from ape_dts_spark.plans.fk_order import TPCH_FK_EDGES, apply_stages, fk_levels

TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]


def test_tpch_levels_longest_path():
    levels, cyclic = fk_levels(TABLES, TPCH_FK_EDGES)
    assert cyclic == []
    assert levels == {
        "region": 0,
        "part": 0,
        "nation": 1,
        "customer": 2,
        "supplier": 2,
        "orders": 3,
        "lineitem": 4,
    }


def test_insert_stages_parents_first():
    stages = apply_stages(TABLES, TPCH_FK_EDGES)
    assert stages == [
        ["part", "region"],
        ["nation"],
        ["customer", "supplier"],
        ["orders"],
        ["lineitem"],
    ]
    # every child stage strictly after all of its parents' stages
    pos = {tb: i for i, group in enumerate(stages) for tb in group}
    for child, parent in TPCH_FK_EDGES:
        assert pos[child] > pos[parent]


def test_delete_stages_children_first():
    fwd = apply_stages(TABLES, TPCH_FK_EDGES)
    assert apply_stages(TABLES, TPCH_FK_EDGES, deletes_first=True) == fwd[::-1]


def test_diamond_takes_longest_path():
    # a -> b -> d, a -> d : d must wait for b (level 2), not apply at level 1
    levels, cyclic = fk_levels(["a", "b", "d"], [("b", "a"), ("d", "b"), ("d", "a")])
    assert cyclic == []
    assert levels == {"a": 0, "b": 1, "d": 2}


def test_self_reference_ignored():
    # employee.manager_id -> employee orders rows, not tables
    levels, cyclic = fk_levels(["employee"], [("employee", "employee")])
    assert cyclic == []
    assert levels == {"employee": 0}


def test_cycle_detected_and_isolated():
    edges = [("b", "a"), ("c", "b"), ("b", "c"), ("d", "a")]
    levels, cyclic = fk_levels(["a", "b", "c", "d"], edges)
    assert cyclic == ["b", "c"]  # the SCC; a and d still get levels
    assert levels == {"a": 0, "d": 1}
    with pytest.raises(ValueError, match="cycle"):
        apply_stages(["a", "b", "c", "d"], edges)


def test_parse_fk_spec_strips_whitespace():
    # task.py and precheck share this parser; " orders : customer" used to
    # produce a phantom ' customer' parent at apply staging only
    from ape_dts_spark.plans.fk_order import parse_fk_spec

    assert parse_fk_spec(" orders : customer , lineitem:orders ,, bad") == [
        ("orders", "customer"),
        ("lineitem", "orders"),
    ]
