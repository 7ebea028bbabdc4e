"""SQL-file sink — render each change event as an executable SQL statement.

Reference: dt-connector/src/sinker/sql_sinker.rs:15-53 emits SQL text per
event; with ``reverse=true`` it first inverts the event
(insert<->delete, update swaps images — row_data.rs:77-94) to produce **undo
SQL**. Statement shapes follow rdb_query_builder.rs:383-516.

Spark-native: one projection building the statement string with JVM-side
string expressions (codegen'd, no Python in the loop), then ``df.write.text``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ape_dts_spark.model.changes import ROW_TYPE_DELETE, ROW_TYPE_INSERT, reverse_events


def _sql_literal(col: Column, dt: T.DataType, dialect: str = "mysql") -> Column:
    """Render a value as a SQL literal (NULL-safe, string-escaped).

    MySQL's default sql_mode treats backslash as an escape inside string
    literals, so for the mysql dialect backslashes are doubled BEFORE quote
    doubling — otherwise a value ending in ``\\`` swallows the closing quote
    (broken or injectable statement). PG standard-conforming strings need
    only quote doubling."""
    if isinstance(dt, (T.StringType,)):
        s = col
        if dialect == "mysql":
            s = F.replace(s, F.lit("\\"), F.lit("\\\\"))
        quoted = F.concat(F.lit("'"), F.replace(s, F.lit("'"), F.lit("''")), F.lit("'"))
    elif isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        quoted = F.concat(F.lit("'"), col.cast("string"), F.lit("'"))
    elif isinstance(dt, T.BinaryType):
        quoted = F.concat(F.lit("x'"), F.hex(col), F.lit("'"))
    else:
        quoted = col.cast("string")
    return F.coalesce(quoted, F.lit("NULL"))


def events_to_sql(df: DataFrame, key_cols: list[str], reverse: bool = False) -> DataFrame:
    """Change events -> one SQL statement per row (column ``sql``, plus seq).

    insert -> INSERT INTO, delete -> DELETE ... WHERE pk, update -> UPDATE ...
    SET ... WHERE pk. ``reverse=True`` emits undo SQL.
    """
    if reverse:
        df = reverse_events(df)
    payload: T.StructType = df.schema["after"].dataType  # type: ignore[assignment]
    fields = [(f.name, f.dataType) for f in payload.fields]

    bt = lambda n: "`" + n.replace("`", "``") + "`"  # noqa: E731  identifier escape
    esc = lambda c: F.replace(F.col(c), F.lit("`"), F.lit("``"))  # noqa: E731
    table = F.concat(F.lit("`"), esc("schema"), F.lit("`.`"), esc("tb"), F.lit("`"))
    col_list = F.lit(", ".join(bt(n) for n, _ in fields))
    insert_vals = F.concat_ws(", ", *[_sql_literal(F.col("after").getField(n), dt) for n, dt in fields])
    set_clause = F.concat_ws(
        ", ",
        *[F.concat(F.lit(f"{bt(n)} = "), _sql_literal(F.col("after").getField(n), dt)) for n, dt in fields],
    )
    where_clause = F.concat_ws(
        " AND ",
        *[
            F.concat(F.lit(f"{bt(n)} = "), _sql_literal(F.col("before").getField(n), dt))
            for n, dt in fields
            if n in key_cols
        ],
    )
    sql = (
        F.when(
            F.col("row_type") == ROW_TYPE_INSERT,
            F.concat(F.lit("INSERT INTO "), table, F.lit(" ("), col_list, F.lit(") VALUES ("), insert_vals, F.lit(");")),
        )
        .when(
            F.col("row_type") == ROW_TYPE_DELETE,
            F.concat(F.lit("DELETE FROM "), table, F.lit(" WHERE "), where_clause, F.lit(";")),
        )
        .otherwise(
            F.concat(F.lit("UPDATE "), table, F.lit(" SET "), set_clause, F.lit(" WHERE "), where_clause, F.lit(";")),
        )
    )
    return df.select(F.col("seq"), sql.alias("sql"))


def write_sql_file(df: DataFrame, path: str) -> None:
    """Persist ordered SQL statements (single file to preserve apply order —
    matching the reference's serial sql.log output)."""
    df.orderBy("seq").select("sql").coalesce(1).write.mode("overwrite").text(path)
