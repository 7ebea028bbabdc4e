"""Live execution of the MySQL-dialect DML shapes on H2 in MySQL mode.

test_jdbc_live.py validates the PG-dialect shapes on live DuckDB/Derby, but
MySQL's ``REPLACE INTO`` + backtick quoting (rdb_query_builder.rs:191-382)
stayed string-oracled only. H2 (a public jar) in MySQL compatibility mode
(``MODE=MySQL``) executes exactly those shapes: REPLACE INTO, backtick
identifier quotes, row-constructor ``(pk) IN ((..),(..))`` deletes. Gated on
an H2 jar being present (``ape_dts_spark.session.find_h2_jar``) AND the
driver class being loadable in the active session (the jar must be on the
JVM classpath at session launch — see the ordering note in session.py);
skips cleanly otherwise.

Reference parity: dt-connector/src/rdb_query_builder.rs:191-382 (MySQL
REPLACE/DELETE shapes), mysql_sinker.rs batch apply.
"""

from __future__ import annotations

import pytest

from ape_dts_spark.session import driver_class_loadable, find_h2_jar
from ape_dts_spark.sinks.upsert_sql import batch_statements, compacted_to_sql
from ape_dts_spark.sources.snapshot import SnapshotSource

pytestmark = pytest.mark.skipif(
    find_h2_jar() is None, reason="no H2 jar on this machine (public jar; jar-gated)"
)

COMPACTED_SCHEMA = (
    "schema string, tb string, id bigint, op string, "
    "after struct<id: bigint, name: string, val: double>, seq bigint"
)


@pytest.fixture(autouse=True)
def _require_h2_loadable(spark):
    if not driver_class_loadable(spark, "org.h2.Driver"):
        pytest.skip("H2 jar found but org.h2.Driver not loadable in the active session")


def _url(tmp_path, name):
    # DATABASE_TO_LOWER keeps unquoted identifiers lowercase like MySQL on
    # case-sensitive filesystems; MODE=MySQL enables REPLACE INTO + backticks
    return f"jdbc:h2:{tmp_path}/{name};MODE=MySQL;DATABASE_TO_LOWER=TRUE"


def _seed(spark, url, n=100):
    conn = spark._jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.execute("CREATE SCHEMA IF NOT EXISTS app")
    # backtick DDL: proves the MySQL-mode quoting the sinker emits parses
    st.execute(
        "CREATE TABLE `app`.`users` (`id` BIGINT PRIMARY KEY, `name` VARCHAR(64), `val` DOUBLE)"
    )
    for i in range(n):
        nm = f"user_{i}" if i % 10 else f"o''brien_{i}"  # quote-escape path
        st.execute(f"INSERT INTO app.users VALUES ({i}, '{nm}', {i}/4.0)")
    st.close()
    conn.close()


def _apply_sql(spark, url, statements):
    conn = spark._jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    for sql in statements:
        st.execute(sql)
    st.close()
    conn.close()


def _changes(spark):
    return spark.createDataFrame(
        [
            ("app", "users", 5, "upsert", (5, "updated_5", 99.5), 1),
            ("app", "users", 7, "upsert", (7, "it's", None), 2),
            ("app", "users", 200, "upsert", (200, "fresh", 1.25), 3),
            ("app", "users", 8, "delete", None, 4),
            ("app", "users", 9, "delete", None, 5),
        ],
        COMPACTED_SCHEMA,
    )


def _verify_final_state(spark, url):
    df = SnapshotSource(spark).read_jdbc(url, "app.users")
    rows = {r["id"]: (r["name"], r["val"]) for r in df.collect()}
    assert len(rows) == 99  # 100 - 2 deleted + 1 inserted
    assert rows[5] == ("updated_5", 99.5)
    assert rows[7] == ("it's", None)
    assert rows[200] == ("fresh", 1.25)
    assert 8 not in rows and 9 not in rows
    assert rows[42] == ("user_42", 10.5)


def test_h2_mysql_replace_into_per_row(spark, tmp_path):
    """Per-row MySQL-dialect DML (REPLACE INTO / DELETE with backtick
    quoting) executes on a live MySQL-mode engine and lands the expected
    final state — REPLACE's delete-then-insert upsert semantics included."""
    url = _url(tmp_path, "perrow")
    _seed(spark, url)
    stmts = (
        compacted_to_sql(_changes(spark), key_cols=["id"], dialect="mysql")
        .orderBy("seq")
        .collect()
    )
    assert any("REPLACE INTO `app`.`users`" in r["sql"] for r in stmts)
    _apply_sql(spark, url, [r["sql"] for r in stmts])
    _verify_final_state(spark, url)


def test_h2_mysql_replace_into_batched(spark, tmp_path):
    """Batched multi-row REPLACE INTO and DELETE ... WHERE (`id`) IN
    ((..),(..)) execute on a live MySQL-mode engine."""
    url = _url(tmp_path, "batch")
    _seed(spark, url)
    stmts = batch_statements(_changes(spark), key_cols=["id"], dialect="mysql").collect()
    ordered = [r["sql"] for r in stmts if r["op"] == "upsert"] + [
        r["sql"] for r in stmts if r["op"] == "delete"
    ]
    assert any("REPLACE INTO" in s and "),(" in s for s in ordered)
    _apply_sql(spark, url, ordered)
    _verify_final_state(spark, url)


def test_h2_mysql_snapshot_scan_chunked(spark, tmp_path):
    """The chunked JDBC snapshot reader works against the MySQL-mode engine
    (third live engine after DuckDB and Derby)."""
    url = _url(tmp_path, "scan")
    _seed(spark, url)
    df = SnapshotSource(spark).read_jdbc(
        url, "app.users", partition_column="id", lower_bound=0, upper_bound=99,
        num_partitions=4,
    )
    assert df.rdd.getNumPartitions() == 4
    rows = {r["id"]: r["name"] for r in df.collect()}
    assert len(rows) == 100 and rows[0] == "o'brien_0"
