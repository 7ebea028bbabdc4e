"""Local correctness harness replicating the driver's gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at the same
scale factor, compare row count + column names + order-insensitive values.

Usage: python tools/check.py [sf_dir] [query_name ...]
       python tools/check.py [sf_dir] --window    # first 50 only (driver replica)
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("\x01".join(canon_cell(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    if not os.path.isdir(sf_dir) and os.path.isdir(os.path.join("/root/testdata", sf_dir)):
        sf_dir = os.path.join("/root/testdata", sf_dir)  # accept the 'sf0.01' short form
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod

    from ape_dts_spark.session import clear_spark_blocks

    if os.environ.get("CHECK_VANILLA"):
        # Replicate the external driver gate exactly: a vanilla SparkSession
        # with no repo-specific confs — queries() must be self-sufficient.
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master(f"local[{os.cpu_count() or 4}]")
            .appName("check-vanilla")
            .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        from ape_dts_spark.session import get_spark

        spark = get_spark("check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    # --window: replicate the external driver exactly — it gates ONLY the
    # first 50 dict entries; use this before freezing the queries() order
    if "--window" in only:
        only.discard("--window")
        qs = dict(list(qs.items())[:50])
        # named queries outside the 50-slot window would silently never run
        # and read as a pass — make that an explicit failure
        missing = sorted(n for n in only if n not in qs)
        if missing:
            print(f"ERROR: named queries outside the 50-slot --window: {missing}")
            return 2
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        # the DRIVER's value hasher dies on non-scalar cells (pandas
        # Categorical over list/bytearray: "unhashable type") — flag any
        # ARRAY/MAP/STRUCT/BINARY output column so the gate projection gets
        # made scalar-only (posexplode arrays, hex binaries) before the
        # driver ever sees it
        nonscalar = [
            f"{f.name}:{f.dataType.simpleString()}"
            for f in sdf.schema.fields
            if f.dataType.typeName() in ("array", "map", "struct", "binary")
        ]
        srows = [tuple(r) for r in sdf.collect()]
        clear_spark_blocks(spark)  # caches + leaked localCheckpoint blocks
        sql = oracles.get(name)
        if sql is None:
            tag = f" NONSCALAR {nonscalar}" if nonscalar else ""
            print(
                f"  {name:28s} rows={len(srows):7d}  (no oracle — rows-only){tag} {time.time()-t0:5.1f}s"
            )
            if len(srows) == 0:
                failures.append((name, "zero rows"))
            continue
        # LIMIT 0 wrapper: the Arrow type audit needs only the schema —
        # .arrow() on the full query would materialize (and thus execute)
        # the oracle twice per query
        arrow_schema = con.execute(f"SELECT * FROM ({sql}) LIMIT 0").arrow().schema
        res = con.execute(sql)
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        status = []
        # the DRIVER hashes values by Arrow type: DuckDB HUGEINT (a bare SUM
        # over integers) arrives as decimal128 and hash-mismatches Spark's
        # int64 even when values are identical — this replica canonicalizes
        # via str() and would pass, so flag the type itself (CAST the oracle
        # aggregate AS BIGINT)
        bad_types = [
            f"{f.name}:{f.type}" for f in arrow_schema if "decimal" in str(f.type)
        ]
        if bad_types:
            status.append(f"ORACLE-ARROW-TYPE {bad_types}")
        if nonscalar:
            status.append(f"SPARK-NONSCALAR-TYPE {nonscalar}")
        oracle_nonscalar = [
            f"{f.name}:{f.type}"
            for f in arrow_schema
            if any(k in str(f.type) for k in ("list", "binary", "struct", "map"))
        ]
        if oracle_nonscalar:
            status.append(f"ORACLE-NONSCALAR-TYPE {oracle_nonscalar}")
        if len(srows) != len(drows):
            status.append(f"ROWCOUNT spark={len(srows)} duck={len(drows)}")
        if sorted(scols) != sorted(dcols):
            status.append(f"SCHEMA spark={sorted(scols)} duck={sorted(dcols)}")
        if not status:
            sc = canon_rows(scols, srows)
            dc = canon_rows(dcols, drows)
            if sc != dc:
                nbad = sum(1 for a, b in zip(sc, dc) if a != b)
                status.append(f"VALUES {nbad}/{len(sc)} rows differ")
                for a, b in list(zip(sc, dc))[:2000]:
                    if a != b:
                        status.append(f"  spark: {a[:200]}")
                        status.append(f"  duck : {b[:200]}")
                        break
        if status:
            failures.append((name, "; ".join(status[:1])))
            print(f"  {name:28s} FAIL  {' | '.join(status)}")
        else:
            print(f"  {name:28s} OK    rows={len(srows):7d} {time.time()-t0:5.1f}s")
    print()
    if failures:
        print(f"{len(failures)} FAILURES:")
        for n, s in failures:
            print(f"  {n}: {s}")
        return 1
    print("all queries match")
    return 0


if __name__ == "__main__":
    sys.exit(main())
