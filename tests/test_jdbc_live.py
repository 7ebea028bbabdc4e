"""Live-database validation of the JDBC snapshot/sink paths.

Round 4 flagged that ``sources/snapshot.py``'s JDBC backend and
``sinks/upsert_sql.py``'s generated DML had only ever been string-oracled —
never executed against a real SQL engine. This module closes that gap with a
real JDBC round-trip, gated on a public DuckDB JDBC driver jar being present
on the machine (``ape_dts_spark.session.find_jdbc_jar``; skips cleanly
otherwise): seed a live database over JDBC, snapshot-scan it back through
Spark's chunked JDBC reader, apply a generated PG-dialect change-set over
JDBC, and verify the final table state.

DuckDB speaks the PG dialect the ``pg`` sink generates (double-quoted
identifiers, ``INSERT ... ON CONFLICT (pk) DO UPDATE SET``), so this
validates the PG statement shapes end-to-end on a live engine. Remaining
documented risk: MySQL's ``REPLACE INTO`` shape and server-specific type
coercions still have no live engine here (no MySQL/PG server in the
sandbox); the SQL text for those stays covered by the string oracles in
test_sinks.py.

Reference parity: dt-connector/src/extractor/mysql/mysql_snapshot_extractor.rs
(chunked scan) and dt-connector/src/rdb_query_builder.rs (DML shapes).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ape_dts_spark.session import driver_class_loadable, find_jdbc_jar
from ape_dts_spark.sinks.upsert_sql import batch_statements, compacted_to_sql
from ape_dts_spark.sources.snapshot import SnapshotSource

pytestmark = pytest.mark.skipif(
    find_jdbc_jar() is None, reason="no DuckDB JDBC driver jar on this machine"
)


@pytest.fixture(autouse=True)
def _require_driver_loadable(spark):
    """The jar existing on disk does not imply it is on the classpath: if a
    SparkSession was created before get_spark configured spark.jars,
    getOrCreate reused it and the driver class is absent — skip cleanly
    instead of failing with ClassNotFound."""
    if not driver_class_loadable(spark, "org.duckdb.DuckDBDriver"):
        pytest.skip("DuckDB jar found but driver class not loadable in the active session")

COMPACTED_SCHEMA = (
    "schema string, tb string, id bigint, op string, "
    "after struct<id: bigint, name: string, val: double>, seq bigint"
)


def _connect(spark, url):
    return spark._jvm.java.sql.DriverManager.getConnection(url)


def _seed(spark, url, n=100):
    conn = _connect(spark, url)
    st = conn.createStatement()
    st.execute("CREATE SCHEMA IF NOT EXISTS app")
    st.execute(
        'CREATE TABLE app.users (id BIGINT PRIMARY KEY, "name" VARCHAR, val DOUBLE)'
    )
    for i in range(n):
        nm = f"user_{i}" if i % 10 else f"o''brien_{i}"  # quote-escape path
        st.execute(f"INSERT INTO app.users VALUES ({i}, '{nm}', {i}/4.0)")
    st.close()
    conn.close()


def test_jdbc_snapshot_scan_chunked(spark, tmp_path):
    """Spark's partitionColumn/bounds chunked JDBC scan returns exactly the
    live table, across 4 range chunks."""
    url = f"jdbc:duckdb:{tmp_path}/scan.duckdb"
    _seed(spark, url)
    src = SnapshotSource(spark)
    df = src.read_jdbc(
        url,
        "app.users",
        partition_column="id",
        lower_bound=0,
        upper_bound=99,
        num_partitions=4,
    )
    assert df.rdd.getNumPartitions() == 4
    rows = {r["id"]: (r["name"], r["val"]) for r in df.collect()}
    assert len(rows) == 100
    assert rows[0] == ("o'brien_0", 0.0)
    assert rows[97] == ("user_97", 24.25)


def test_jdbc_snapshot_scan_keyset_predicates(spark, tmp_path):
    """predicates=[...] keyset chunks: one partition per predicate, union is
    the full table with no dupes/misses."""
    url = f"jdbc:duckdb:{tmp_path}/keyset.duckdb"
    _seed(spark, url)
    src = SnapshotSource(spark)
    preds = ["id < 40", "id >= 40 AND id < 80", "id >= 80"]
    df = src.read_jdbc(url, "app.users", predicates=preds)
    assert df.rdd.getNumPartitions() == len(preds)
    assert df.count() == 100
    assert df.select("id").distinct().count() == 100


def _apply_sql(spark, url, statements):
    conn = _connect(spark, url)
    st = conn.createStatement()
    for sql in statements:
        st.execute(sql)
    st.close()
    conn.close()


def _changes(spark):
    """A compacted write-set: update two live rows, insert one new, delete two."""
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
    src = SnapshotSource(spark)
    df = src.read_jdbc(url, "app.users")
    rows = {r["id"]: (r["name"], r["val"]) for r in df.collect()}
    assert len(rows) == 99  # 100 - 2 deleted + 1 inserted
    assert rows[5] == ("updated_5", 99.5)
    assert rows[7] == ("it's", None)
    assert rows[200] == ("fresh", 1.25)
    assert 8 not in rows and 9 not in rows
    assert rows[42] == ("user_42", 10.5)  # untouched row intact


def test_jdbc_upsert_apply_per_row(spark, tmp_path):
    """Per-row PG-dialect DML (INSERT..ON CONFLICT DO UPDATE / DELETE)
    executes on a live engine and lands the expected final state."""
    url = f"jdbc:duckdb:{tmp_path}/perrow.duckdb"
    _seed(spark, url)
    stmts = (
        compacted_to_sql(_changes(spark), key_cols=["id"], dialect="pg")
        .orderBy("seq")
        .collect()
    )
    _apply_sql(spark, url, [r["sql"] for r in stmts])
    _verify_final_state(spark, url)


def test_jdbc_upsert_apply_batched(spark, tmp_path):
    """Batched multi-row INSERT..ON CONFLICT and DELETE..WHERE (pk) IN
    ((..),(..)) execute on a live engine; deletes apply after upserts (the
    set-based apply order for a compacted set: each key appears once, so
    op groups are disjoint and order across groups only matters for
    delete-then-insert key reuse, which compaction already resolved)."""
    url = f"jdbc:duckdb:{tmp_path}/batch.duckdb"
    _seed(spark, url)
    stmts = batch_statements(_changes(spark), key_cols=["id"], dialect="pg").collect()
    ordered = [r["sql"] for r in stmts if r["op"] == "upsert"] + [
        r["sql"] for r in stmts if r["op"] == "delete"
    ]
    _apply_sql(spark, url, ordered)
    _verify_final_state(spark, url)


def test_jdbc_checker_cross_engine(spark, tmp_path):
    """The data checker diffs a live JDBC table against a second frame:
    zero miss/diff rows on identical data, and a planted drift is caught."""
    from ape_dts_spark.operators.checker import check_diff

    url = f"jdbc:duckdb:{tmp_path}/check.duckdb"
    _seed(spark, url)
    src = SnapshotSource(spark)
    clean = src.read_jdbc(url, "app.users").cache()
    assert check_diff(clean, clean, ["id"]).count() == 0
    drifted = clean.withColumn(
        "val", F.when(F.col("id") == 3, F.lit(-1.0)).otherwise(F.col("val"))
    )
    bad = check_diff(clean, drifted, ["id"])
    assert [r["id"] for r in bad.collect()] == [3]


def test_jdbc_snapshot_scan_second_engine_derby(spark, tmp_path):
    """Same chunked JDBC reader against a SECOND live engine — Apache Derby
    (embedded, ships on Spark's classpath): guards against DuckDB-specific
    assumptions in the reader path (quoting, type mapping, partition-clause
    generation). Derby folds unquoted identifiers to upper case and speaks
    strict ANSI, so a reader quirk that DuckDB tolerates surfaces here."""
    jvm = spark._jvm
    url = f"jdbc:derby:{tmp_path}/derbydb;create=true"
    try:
        conn = jvm.java.sql.DriverManager.getConnection(url)
    except Exception:
        pytest.skip("Derby embedded driver not on the session classpath")
    st = conn.createStatement()
    st.execute("CREATE TABLE users (id BIGINT PRIMARY KEY, name VARCHAR(40), val DOUBLE)")
    for i in range(60):
        st.execute(f"INSERT INTO users VALUES ({i}, 'u{i}', {i}/4.0)")
    st.close()
    conn.close()

    src = SnapshotSource(spark)
    df = src.read_jdbc(
        url, "users", partition_column="id", lower_bound=0, upper_bound=59,
        num_partitions=3,
    )
    assert df.rdd.getNumPartitions() == 3
    rows = {r["ID"]: (r["NAME"], r["VAL"]) for r in df.collect()}
    assert len(rows) == 60
    assert rows[17] == ("u17", 4.25)
    preds = src.read_jdbc(url, "users", predicates=["id < 30", "id >= 30"])
    assert preds.count() == 60
