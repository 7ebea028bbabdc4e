"""CLI entry: ``python -m ape_dts_spark <task_config.ini>`` — the dt-main
analogue (dt-main/src/main.rs:34-48 parses the config path, builds the task,
runs it). Exit code 0 on success; precheck failures (``--precheck``) and
task errors exit non-zero with the failing checks listed.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="ape_dts_spark", description="Run a task_config.ini on Spark"
    )
    ap.add_argument("config", help="path to task_config.ini")
    ap.add_argument("--precheck", action="store_true", help="run prechecks only")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args(argv)

    from ape_dts_spark.config.task_config import TaskConfig
    from ape_dts_spark.session import get_spark

    cfg = TaskConfig.from_file(args.config)
    spark = get_spark("ape_dts_spark", shuffle_partitions=args.shuffle_partitions)

    src_dir = cfg.extractor.get("url", "") or ""
    schema = cfg.extractor.get("db", "default") or "default"
    if args.precheck:
        from ape_dts_spark.precheck import run_prechecks
        from ape_dts_spark.task import _tables_from

        tables = _tables_from(cfg, src_dir)
        results = run_prechecks(
            spark, src_dir, tables, filt=cfg.filter, schema=schema,
            fk_spec=cfg.extractor.get("foreign_keys") or None,
        )
        bad = [r for r in results if not r.ok]
        for r in results:
            print(json.dumps({"check": r.check, "object": r.object, "ok": r.ok, "detail": r.detail}))
        return 1 if bad else 0

    from ape_dts_spark.task import run_task

    result = run_task(spark, cfg)
    print(
        json.dumps(
            {
                "kind": result.kind,
                "tables": sorted(result.tables),
                "outputs": result.outputs,
                "metrics": result.metrics[-5:],
            },
            default=str,
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
