"""Dialect-aware upsert/delete SQL generation from a compacted write-set.

Reference: dt-connector/src/rdb_query_builder.rs generates REPLACE INTO
(MySQL, :235-382), INSERT ... ON CONFLICT (pk) DO UPDATE SET (PG, :235-382),
batched multi-row INSERT VALUES(...),(...) (:191-233) and batch
DELETE ... WHERE (pk) IN ((...),(...)) (:144-190). The sinkers execute these
against the target; here they are produced as DataFrame columns (JVM string
expressions, codegen'd — no Python per row) so any JDBC ``foreachPartition``
writer, SQL-file sink, or test can consume them.

Input is the output of ``operators.merge.compact_changes`` — (schema, tb,
<key cols>, op in ('delete','upsert'), after, seq).

Scale: per-row statements are a pure projection (no shuffle). Batch
statements group by (schema, tb, op) — one shuffle keyed by table, matching
the reference's per-table batch apply (merge_parallelizer.rs:161-242).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ape_dts_spark.sinks.sql_file import _sql_literal

DIALECT_QUOTE = {"mysql": "`", "pg": '"'}


def _quoted(dialect: str, name: str) -> str:
    """Quoted identifier with the embedded quote char doubled — a column
    literally named a`b renders as `a``b` (MySQL) / a"b as "a""b" (PG); the
    reference's special-character-identifier tests cover exactly this."""
    q = DIALECT_QUOTE[dialect]
    return f"{q}{name.replace(q, q + q)}{q}"


def _table(dialect: str) -> Column:
    q = DIALECT_QUOTE[dialect]
    esc = lambda c: F.replace(F.col(c), F.lit(q), F.lit(q + q))  # noqa: E731
    return F.concat(F.lit(q), esc("schema"), F.lit(f"{q}.{q}"), esc("tb"), F.lit(q))


def compacted_to_sql(compacted: DataFrame, key_cols: list[str], dialect: str = "mysql") -> DataFrame:
    """One statement per compacted op.

    upsert -> MySQL ``REPLACE INTO`` / PG ``INSERT ... ON CONFLICT DO UPDATE``;
    delete -> ``DELETE ... WHERE <pk>=...``.
    Output: (schema, tb, op, seq, sql).
    """
    if dialect not in DIALECT_QUOTE:
        raise ValueError(f"unsupported dialect {dialect!r} (mysql|pg)")
    payload: T.StructType = compacted.schema["after"].dataType  # type: ignore[assignment]
    fields = [(f.name, f.dataType) for f in payload.fields]

    col_list = F.lit(", ".join(_quoted(dialect, n) for n, _ in fields))
    vals = F.concat_ws(", ", *[_sql_literal(F.col("after").getField(n), dt, dialect) for n, dt in fields])
    where = F.concat_ws(
        " AND ",
        *[
            F.concat(F.lit(f"{_quoted(dialect, k)} = "), _sql_literal(F.col(k), dict(fields)[k], dialect))
            for k in key_cols
        ],
    )
    if dialect == "mysql":
        upsert = F.concat(
            F.lit("REPLACE INTO "), _table(dialect), F.lit(" ("), col_list, F.lit(") VALUES ("), vals, F.lit(");")
        )
    else:
        pk = ", ".join(_quoted(dialect, k) for k in key_cols)
        set_clause = ", ".join(
            f"{_quoted(dialect, n)} = EXCLUDED.{_quoted(dialect, n)}" for n, _ in fields if n not in key_cols
        )
        upsert = F.concat(
            F.lit("INSERT INTO "), _table(dialect), F.lit(" ("), col_list, F.lit(") VALUES ("), vals,
            F.lit(f") ON CONFLICT ({pk}) DO UPDATE SET {set_clause};"),
        )
    delete = F.concat(F.lit("DELETE FROM "), _table(dialect), F.lit(" WHERE "), where, F.lit(";"))
    sql = F.when(F.col("op") == "delete", delete).otherwise(upsert)
    return compacted.select("schema", "tb", "op", "seq", sql.alias("sql"))


def batch_statements(
    compacted: DataFrame,
    key_cols: list[str],
    dialect: str = "mysql",
) -> DataFrame:
    """Batched multi-row statements, one per (schema, tb, op):

    - upserts -> ``REPLACE INTO t (cols) VALUES (...),(...)`` (MySQL) /
      multi-row ``INSERT ... ON CONFLICT`` (PG)
    - deletes -> ``DELETE FROM t WHERE (pk) IN ((...),(...))``

    Tuples are sorted by seq so the statement text is deterministic.
    Output: (schema, tb, op, n_rows, sql).
    """
    if dialect not in DIALECT_QUOTE:
        raise ValueError(f"unsupported dialect {dialect!r} (mysql|pg)")
    payload: T.StructType = compacted.schema["after"].dataType  # type: ignore[assignment]
    fields = [(f.name, f.dataType) for f in payload.fields]
    col_list = ", ".join(_quoted(dialect, n) for n, _ in fields)
    pk_list = ", ".join(_quoted(dialect, k) for k in key_cols)

    row_tuple = F.concat(
        F.lit("("), F.concat_ws(", ", *[_sql_literal(F.col("after").getField(n), dt, dialect) for n, dt in fields]), F.lit(")")
    )
    key_tuple = F.concat(
        F.lit("("),
        F.concat_ws(", ", *[_sql_literal(F.col(k), dict(fields)[k], dialect) for k in key_cols]),
        F.lit(")"),
    )
    tagged = compacted.select(
        "schema",
        "tb",
        "op",
        F.struct(F.col("seq"), F.when(F.col("op") == "delete", key_tuple).otherwise(row_tuple).alias("t")).alias("st"),
    )
    grouped = tagged.groupBy("schema", "tb", "op").agg(
        F.array_join(F.transform(F.array_sort(F.collect_list("st")), lambda s: s["t"]), ",").alias("tuples"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    if dialect == "mysql":
        upsert = F.concat(
            F.lit("REPLACE INTO "), _table(dialect), F.lit(f" ({col_list}) VALUES "), F.col("tuples"), F.lit(";")
        )
    else:
        set_clause = ", ".join(
            f"{_quoted(dialect, n)} = EXCLUDED.{_quoted(dialect, n)}" for n, _ in fields if n not in key_cols
        )
        upsert = F.concat(
            F.lit("INSERT INTO "), _table(dialect), F.lit(f" ({col_list}) VALUES "), F.col("tuples"),
            F.lit(f" ON CONFLICT ({pk_list}) DO UPDATE SET {set_clause};"),
        )
    delete = F.concat(
        F.lit("DELETE FROM "), _table(dialect), F.lit(f" WHERE ({pk_list}) IN ("), F.col("tuples"), F.lit(");")
    )
    sql = F.when(F.col("op") == "delete", delete).otherwise(upsert)
    return grouped.select("schema", "tb", "op", "n_rows", sql.alias("sql"))
