from ape_dts_spark.router import RdbRouter


def test_table_routing_precedence():
    r = RdbRouter(schema_map="db1:dst1", tb_map="db1.a:dst9.z")
    assert r.route_table("db1", "a") == ("dst9", "z")  # tb_map wins
    assert r.route_table("db1", "b") == ("dst1", "b")  # schema_map fallback
    assert r.route_table("db2", "c") == ("db2", "c")  # identity


def test_topic_routing_fallback():
    r = RdbRouter(topic_map="*.*:default_topic,db1.a:topic_a")
    assert r.route_topic("db1", "a") == "topic_a"
    assert r.route_topic("db1", "b") == "default_topic"


def test_col_renames_and_reverse():
    import json

    r = RdbRouter(
        schema_map="s:d",
        col_map=json.dumps([{"db": "s", "tb": "t", "col_map": {"a": "x"}}]),
    )
    assert r.col_renames("s", "t") == {"a": "x"}
    rev = r.reverse()
    assert rev.route_table("d", "t") == ("s", "t")
    assert rev.col_renames("d", "t") == {"x": "a"}


def test_route_df_rename(spark):
    import json

    r = RdbRouter(col_map=json.dumps([{"db": "s", "tb": "t", "col_map": {"a": "x"}}]))
    df = spark.createDataFrame([(1, 2)], ["a", "b"])
    assert r.route_df(df, "s", "t").columns == ["x", "b"]
    assert r.route_df(df, "s", "other").columns == ["a", "b"]
