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


def check_target_writable(target_dir: str) -> list[CheckResult]:
    """Sink connectivity/permission analogue: the target path must be
    creatable and writable (reference: target connection + privilege checks,
    dt-precheck/src/checker/*)."""
    try:
        os.makedirs(target_dir, exist_ok=True)
        probe = os.path.join(target_dir, ".precheck_probe")
        with open(probe, "w") as f:
            f.write("ok")
        os.remove(probe)
        return [CheckResult("target_writable", target_dir, True)]
    except OSError as e:
        return [CheckResult("target_writable", target_dir, False, str(e)[:200])]


def check_key_columns_exist(
    spark: SparkSession, sf_dir: str, registry: dict[str, list[str]]
) -> list[CheckResult]:
    """Every registered merge key must exist in the table schema and carry a
    hashable scalar type — a complex-typed or missing key breaks the merge
    path at runtime, so it fails here instead (struct supportability)."""
    out = []
    for tb, keys in registry.items():
        path = f"{sf_dir}/{tb}.parquet"
        if not keys or not os.path.exists(path):
            continue
        schema = spark.read.parquet(path).schema
        cols = {f.name: f.dataType for f in schema.fields}
        for k in keys:
            if k not in cols:
                out.append(CheckResult("key_columns_exist", f"{tb}.{k}", False, "key column missing"))
            elif isinstance(cols[k], _LOSSY_FOR_RDB):
                out.append(
                    CheckResult(
                        "key_columns_exist", f"{tb}.{k}", False,
                        f"complex-typed key ({cols[k].simpleString()}) cannot merge",
                    )
                )
            else:
                out.append(CheckResult("key_columns_exist", f"{tb}.{k}", True))
    return out


_VALID_EVENTS = {"insert", "update", "delete", "ddl"}


def check_filter_config(filt: RdbFilter) -> list[CheckResult]:
    """Filter-config sanity (reference: config checker): do_events values
    must be known row types; where_conditions entries must carry a non-empty
    condition."""
    out = []
    bad_events = sorted(e for e in filt._events if e not in _VALID_EVENTS)
    out.append(
        CheckResult(
            "filter_config", "do_events", not bad_events,
            f"unknown event types: {','.join(bad_events)}" if bad_events else "",
        )
    )
    bad_conds = [k for k, cond in filt._where.items() if not (cond or "").strip()]
    out.append(
        CheckResult(
            "filter_config", "where_conditions", not bad_conds,
            f"{len(bad_conds)} empty condition(s)" if bad_conds else "",
        )
    )
    return out


def check_cdc_source(spark: SparkSession, source_dir: str) -> list[CheckResult]:
    """CDC prerequisite analogue: the change-stream directory must exist and
    its envelopes must parse with the fields ordered apply depends on
    (db/table/seq) — the lake-world stand-in for 'binlog is ON and
    ROW-format' (dt-precheck cdc prerequisite checkers)."""
    from pyspark.sql import functions as F

    if not os.path.isdir(source_dir):
        return [CheckResult("cdc_source", source_dir, False, "source dir missing")]
    try:
        sample = spark.read.text(source_dir).limit(100)
        parsed = sample.select(
            F.get_json_object("value", "$.source.db").alias("db"),
            F.get_json_object("value", "$.source.table").alias("tb"),
            F.get_json_object("value", "$.source.seq").alias("seq"),
        )
        n = parsed.count()
        bad = parsed.filter(F.col("db").isNull() | F.col("seq").isNull()).count()
        if n == 0:
            return [CheckResult("cdc_source", source_dir, True, "empty source (ok, stream may start later)")]
        return [
            CheckResult(
                "cdc_source", source_dir, bad == 0,
                f"{bad}/{n} sampled envelopes missing db/seq" if bad else f"{n} envelopes sampled",
            )
        ]
    except Exception as e:
        return [CheckResult("cdc_source", source_dir, False, str(e)[:200])]


def check_fk_config(tables: list[str], fk_spec: str) -> list[CheckResult]:
    """FK-mode preflight (dt-precheck's structure checks + plans/fk_order):
    the foreign_keys config must parse (child:parent pairs), reference known
    tables, and be acyclic — a cycle would force full-serial apply, which the
    operator refuses explicitly rather than silently degrading."""
    from ape_dts_spark.plans.fk_order import fk_levels, parse_fk_spec

    out: list[CheckResult] = []
    for part in filter(None, (p.strip() for p in fk_spec.split(","))):
        if ":" not in part:
            out.append(CheckResult("fk_config_parse", part, False, "expected child:parent"))
            continue
        child, parent = (s.strip() for s in part.split(":", 1))
        if not child or not parent:
            # parse_fk_spec silently drops empty-sided parts; a green
            # precheck over a spec the apply stage ignores is exactly the
            # disagreement this check exists to prevent
            out.append(
                CheckResult("fk_config_parse", part, False, "empty child or parent")
            )
    edges = parse_fk_spec(fk_spec)  # shared with task.run_task apply staging
    for child, parent in edges:
        for t in (child, parent):
            if t not in tables:
                out.append(
                    CheckResult(
                        "fk_table_known", t, False, f"edge {child}:{parent}: not in task tables"
                    )
                )
    _, cyclic = fk_levels(tables, edges)
    out.append(
        CheckResult(
            "fk_acyclic",
            ",".join(cyclic) or "-",
            not cyclic,
            "reference cycle would force serial apply" if cyclic else "",
        )
    )
    if not any(not r.ok for r in out):
        out.insert(0, CheckResult("fk_config_parse", fk_spec, True))
    return out


_JDBC_DRIVERS = {
    "mysql": "com.mysql.cj.jdbc.Driver",
    "mariadb": "org.mariadb.jdbc.Driver",
    "postgresql": "org.postgresql.Driver",
    "clickhouse": "com.clickhouse.jdbc.ClickHouseDriver",
    "sqlserver": "com.microsoft.sqlserver.jdbc.SQLServerDriver",
}


def check_jdbc_config(spark: SparkSession, url: str, props: dict | None = None) -> list[CheckResult]:
    """Connectivity-adjacent prechecks for a JDBC source/sink that work
    without a live database (dt-precheck's connectivity/permission checkers
    need a reachable server; in a sandboxed run these degrade to the checks
    that CAN fail early): URL dialect parse, credential presence, and
    driver-class availability on the JVM classpath. With a reachable DB the
    first partitioned read is itself the live probe."""
    props = props or {}
    out: list[CheckResult] = []
    parts = url.split(":", 2)
    if len(parts) < 3 or parts[0] != "jdbc" or not parts[1]:
        return [CheckResult("jdbc_url", url, False, "expected jdbc:<dialect>://host[:port]/db")]
    dialect = parts[1]
    known = dialect in _JDBC_DRIVERS
    out.append(
        CheckResult("jdbc_url", url, known, "" if known else f"unknown dialect {dialect!r}")
    )
    out.append(
        CheckResult(
            "jdbc_credentials",
            dialect,
            bool(props.get("user")),
            "" if props.get("user") else "no 'user' in connection properties",
        )
    )
    if known:
        cls = props.get("driver", _JDBC_DRIVERS[dialect])
        try:
            spark._jvm.java.lang.Class.forName(cls)  # type: ignore[union-attr]
            out.append(CheckResult("jdbc_driver_class", cls, True))
        except Exception:
            out.append(
                CheckResult(
                    "jdbc_driver_class", cls, False,
                    "driver jar not on the Spark classpath (add via spark.jars)",
                )
            )
    return out


def run_prechecks(
    spark: SparkSession,
    sf_dir: str,
    tables: list[str],
    filt: RdbFilter | None = None,
    schema: str = "default",
    registry: dict[str, list[str]] | None = None,
    dialect: str = "mysql",
    target_dir: str | None = None,
    cdc_source_dir: str | None = None,
    fk_spec: str | None = None,
) -> list[CheckResult]:
    results = check_source_readable(spark, sf_dir, tables)
    if fk_spec:
        results += check_fk_config(tables, fk_spec)
    if filt is not None:
        results += check_filter_matches(filt, schema, tables)
        results += check_filter_config(filt)
    if registry is not None:
        results += check_primary_keys(registry, tables)
        results += check_key_columns_exist(spark, sf_dir, registry)
    results += check_type_support(spark, sf_dir, tables, dialect)
    if target_dir is not None:
        results += check_target_writable(target_dir)
    if cdc_source_dir is not None:
        results += check_cdc_source(spark, cdc_source_dir)
    return results
