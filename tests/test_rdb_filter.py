"""Wildcard/regex/escape matching semantics of RdbFilter — mirrors the
reference's inline tests (dt-common/src/rdb_filter.rs:302-1047)."""

from ape_dts_spark.config.rdb_filter import RdbFilter


def test_exact_do_tbs():
    f = RdbFilter(do_tbs="db1.tb1,db2.tb2")
    assert not f.filter_tb("db1", "tb1")
    assert not f.filter_tb("db2", "tb2")
    assert f.filter_tb("db1", "tb2")
    assert f.filter_tb("db3", "tb1")


def test_wildcards():
    f = RdbFilter(do_tbs="test_db_*.tb_?")
    assert not f.filter_tb("test_db_1", "tb_1")
    assert not f.filter_tb("test_db_22", "tb_9")
    assert f.filter_tb("test_db_1", "tb_10")  # ? is single char
    assert f.filter_tb("other", "tb_1")


def test_ignore_wins():
    f = RdbFilter(do_schemas="db1", ignore_tbs="db1.secret")
    assert not f.filter_tb("db1", "tb")
    assert f.filter_tb("db1", "secret")


def test_ignore_schema():
    f = RdbFilter(do_schemas="*", ignore_schemas="sys,information_schema")
    assert f.filter_tb("sys", "x")
    assert not f.filter_tb("app", "x")
    assert f.filter_schema("information_schema")
    assert not f.filter_schema("app")


def test_raw_regex():
    f = RdbFilter(do_tbs="db1.r#tb_[0-9]+#")
    assert not f.filter_tb("db1", "tb_123")
    assert f.filter_tb("db1", "tb_x")


def test_escaped_identifier_literal_star():
    f = RdbFilter(do_tbs="db1.`t*b`")
    assert not f.filter_tb("db1", "t*b")
    assert f.filter_tb("db1", "tXb")  # * is literal inside backquotes


def test_do_schemas_allows_all_tables():
    f = RdbFilter(do_schemas="db1,db2")
    assert not f.filter_tb("db1", "anything")
    assert f.filter_tb("db3", "anything")


def test_event_filter():
    f = RdbFilter(do_events="insert")
    assert not f.filter_event("insert")
    assert f.filter_event("update")
    assert f.filter_event("delete")
    none = RdbFilter()
    assert not none.filter_event("update")


def test_where_and_ignore_cols():
    f = RdbFilter(
        where_conditions='[{"db": "d", "tb": "t", "condition": "f_0 > 1"}]',
        ignore_cols='[{"db": "d", "tb": "t", "ignore_cols": ["f_2"]}]',
    )
    assert f.where_condition("d", "t") == "f_0 > 1"
    assert f.where_condition("d", "other") is None
    assert f.ignored_cols("d", "t") == ["f_2"]


def test_case_sensitive_identifiers():
    """The reference's mysql_to_mysql_case_sensitive suite: Upper_Case_DB /
    Upper_Case_TB names match exactly and NEVER case-fold — 'upper_case_db'
    is a different schema (rdb_filter.rs is byte-exact on names; MySQL on
    case-sensitive filesystems distinguishes them)."""
    f = RdbFilter(do_tbs="test_db_1.*,Upper_Case_DB.*")
    assert not f.filter_tb("Upper_Case_DB", "Upper_Case_TB")
    assert not f.filter_tb("test_db_1", "any")
    assert f.filter_tb("upper_case_db", "Upper_Case_TB")  # wrong-case schema
    assert f.filter_tb("UPPER_CASE_DB", "x")
    g = RdbFilter(do_tbs="Upper_Case_DB.Upper_Case_TB")
    assert not g.filter_tb("Upper_Case_DB", "Upper_Case_TB")
    assert g.filter_tb("Upper_Case_DB", "upper_case_tb")  # wrong-case table


def test_special_character_in_name_suite_parity():
    """The reference's special_character_in_name_test, byte for byte
    (dt-tests/tests/mysql_to_mysql/cdc/special_character_in_name_test/
    task_config.ini + filtered_tbs.txt): database/table names containing
    wildcards ('*', '?'), '&', '^', '@' and DOTS, escaped with backticks in
    every filter list — escaped identifiers must match exactly (wildcards
    literal), unescaped dots must not split inside escapes
    (rdb_filter.rs match_token + ConfigTokenParser)."""
    from ape_dts_spark.config.rdb_filter import RdbFilter

    f = RdbFilter(
        do_schemas="`*.*_test_db`,`&.&_test_db`",
        ignore_schemas="`test_db_*.*`,`test_db_&.&`",
        do_tbs="`test_db_^.^`.`one_pk_no_uk_2_^.^`,`test_db_@.@`.`one_pk_no_uk_2_@.@`",
        ignore_tbs="`*.*_test_db`.`one_pk_no_uk_1_*.*`,`&.&_test_db`.`one_pk_no_uk_1_&.&`",
        do_events="insert,update,delete",
    )
    # the suite's filtered_tbs.txt, unescaped: every one must be filtered
    filtered = [
        ("test_db_*.*", "one_pk_no_uk_1_*.*"),
        ("test_db_*.*", "one_pk_no_uk_2_*.*"),
        ("test_db_&.&", "one_pk_no_uk_1_&.&"),
        ("test_db_&.&", "one_pk_no_uk_2_&.&"),
        ("test_db_^.^", "one_pk_no_uk_1_^.^"),
        ("test_db_@.@", "one_pk_no_uk_1_@.@"),
        ("*.*_test_db", "one_pk_no_uk_1_*.*"),
        ("&.&_test_db", "one_pk_no_uk_1_&.&"),
        ("^.^_test_db", "one_pk_no_uk_1_^.^"),
        ("^.^_test_db", "one_pk_no_uk_2_^.^"),
        ("@.@_test_db", "one_pk_no_uk_1_@.@"),
        ("@.@_test_db", "one_pk_no_uk_2_@.@"),
    ]
    for db, tb in filtered:
        assert f.filter_tb(db, tb), f"{db}.{tb} must be filtered"
    # the suite's replicated survivors: do_dbs members not in ignore_tbs,
    # plus the two do_tbs entries
    kept = [
        ("*.*_test_db", "one_pk_no_uk_2_*.*"),
        ("&.&_test_db", "one_pk_no_uk_2_&.&"),
        ("test_db_^.^", "one_pk_no_uk_2_^.^"),
        ("test_db_@.@", "one_pk_no_uk_2_@.@"),
    ]
    for db, tb in kept:
        assert not f.filter_tb(db, tb), f"{db}.{tb} must replicate"
    # escaped wildcards stay literal: a db the pattern would match as a
    # wildcard but not as a literal is filtered
    assert f.filter_tb("anything_test_db", "one_pk_no_uk_2_x")
