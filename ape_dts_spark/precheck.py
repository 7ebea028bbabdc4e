"""Pre-flight checks before a migration/sync task — dt-precheck parity.

Reference checks (dt-precheck/src): source/target connectivity, database &
table existence, permissions, CDC prerequisites (binlog/wal level), struct
supportability. The Spark-side analogues for a lake/parquet + JDBC world:

- source readability (path exists, parquet footer parses)        <- connectivity
- filter config matches at least one table                        <- struct existence
- primary keys registered for tables that will CDC-merge          <- CDC prereq
  (no PK => the reference falls back to serial whole-row apply;
   we flag it so the task picks the spill path deliberately)
- every column type translates to the target dialect without loss
  (complex types degrade to JSON on RDB targets -> warning)

Each check yields a CheckResult; ``ok=False`` results should block the task
(the reference aborts on fatal prechecks, dt-precheck/src/checker/*).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from ape_dts_spark.config.rdb_filter import RdbFilter


@dataclass
class CheckResult:
    check: str
    object: str
    ok: bool
    detail: str = ""


def check_source_readable(spark: SparkSession, sf_dir: str, tables: list[str]) -> list[CheckResult]:
    out = []
    for tb in tables:
        path = f"{sf_dir}/{tb}.parquet"
        if not os.path.exists(path):
            out.append(CheckResult("source_readable", tb, False, f"missing {path}"))
            continue
        try:
            spark.read.parquet(path).schema
            out.append(CheckResult("source_readable", tb, True))
        except Exception as e:  # corrupt footer, permission, ...
            out.append(CheckResult("source_readable", tb, False, str(e)[:200]))
    return out


def check_filter_matches(filt: RdbFilter, schema: str, tables: list[str]) -> list[CheckResult]:
    matched = [tb for tb in tables if not filt.filter_tb(schema, tb)]
    return [
        CheckResult(
            "filter_matches",
            f"{schema}.*",
            bool(matched),
            f"{len(matched)}/{len(tables)} tables selected",
        )
    ]


def check_primary_keys(registry: dict[str, list[str]], tables: list[str]) -> list[CheckResult]:
    out = []
    for tb in tables:
        keys = registry.get(tb, [])
        out.append(
            CheckResult(
                "primary_keys",
                tb,
                bool(keys),
                "no key columns: CDC merge degrades to serial whole-row apply" if not keys else ",".join(keys),
            )
        )
    return out


_LOSSY_FOR_RDB = (T.ArrayType, T.MapType, T.StructType)


def check_type_support(spark: SparkSession, sf_dir: str, tables: list[str], dialect: str) -> list[CheckResult]:
    out = []
    for tb in tables:
        path = f"{sf_dir}/{tb}.parquet"
        if not os.path.exists(path):
            continue
        schema = spark.read.parquet(path).schema
        lossy = [f.name for f in schema.fields if isinstance(f.dataType, _LOSSY_FOR_RDB)]
        if lossy and dialect in ("mysql", "pg", "starrocks"):
            out.append(
                CheckResult("type_support", tb, True, f"complex columns degrade to JSON: {','.join(lossy)}")
            )
        else:
            out.append(CheckResult("type_support", tb, True))
    return out


def run_prechecks(
    spark: SparkSession,
    sf_dir: str,
    tables: list[str],
    filt: RdbFilter | None = None,
    schema: str = "default",
    registry: dict[str, list[str]] | None = None,
    dialect: str = "mysql",
) -> list[CheckResult]:
    results = check_source_readable(spark, sf_dir, tables)
    if filt is not None:
        results += check_filter_matches(filt, schema, tables)
    if registry is not None:
        results += check_primary_keys(registry, tables)
    results += check_type_support(spark, sf_dir, tables, dialect)
    return results
