"""CLI runner — the engine's ``olap_to_dataverse.py`` equivalent.

Mirrors the reference's entry-point surface (``modules/olap_sync.py``):
pipeline choices discovered dynamically from config, slicer flags
(``--fy``, ``--fp``, ``--length 1wk|2wk``), ``--query all``,
``--dry-run``, and a ``--print-plan`` debug flag (the reference's
``--print-mdx``, except here the "plan" is Catalyst's, via
``explain``). Sink is a keyed parquet target per mapping table name.

Usage:
    python -m bw_new_data_integration_spark.runner \
        --query daily_sales --fy 1997 --sf-dir /root/testdata/sf0.01 \
        --target-root /tmp/targets
"""

from __future__ import annotations

import argparse
import os
import sys
import time

from pyspark.sql import functions as F

from bw_new_data_integration_spark import catalog
from bw_new_data_integration_spark.plans import pipeline as plans
from bw_new_data_integration_spark.plans import slicers
from bw_new_data_integration_spark.session import get_spark
from bw_new_data_integration_spark.sources.parquet_target import ParquetKeyedTable

DEFAULT_PIPELINES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "pipelines", "pipelines.yaml")


def build_slicer(spec: plans.PipelineSpec, args) -> object | None:
    col = spec.slicer_column
    if col is None:
        return None
    # fiscal anchor: CLI flag overrides the pipeline spec's fy_start
    fy_m, fy_d = (
        plans.parse_fy_start(args.fy_start) if getattr(args, "fy_start", None) else spec.fy_start
    )
    if args.fy and args.fp:
        return slicers.fiscal_period(col, args.fy, args.fp, fy_m, fy_d)
    if args.fy:
        return slicers.fiscal_year(col, args.fy, fy_m, fy_d)
    if args.length:
        days = 7 if args.length == "1wk" else 14
        return slicers.trailing_days(col, days)
    return None


def run_one(spark, specs, name, args) -> dict:
    from pyspark.sql import Observation

    spec = specs[name]
    src = catalog.load(spark, args.sf_dir, spec.source_table)
    df = plans.build_plan(src, spec, slicer=build_slicer(spec, args), audit_ts=True)
    # run-summary metrics ride the job that materializes the pipeline
    # (Spark's observe() — no second pass over the data): output rows
    # plus an audit that the F1/F7 key filters actually held. At 100 TB
    # a separate validation count would rescan the source; this is free.
    key = spec.mapping.alternate_key
    obs = Observation(f"pipeline_metrics_{name}")
    df = df.observe(
        obs,
        F.count(F.lit(1)).alias("rows_out"),
        F.sum(
            F.when(F.col(key).isNull() | (F.length(key) == 0), 1).otherwise(0)
        ).alias("empty_keys"),
    )
    if args.print_plan:
        df.explain("formatted")
    if args.dry_run:
        n = df.count()
        return {"pipeline": name, "dry_run": True, "rows": n, "metrics": obs.get}
    target = ParquetKeyedTable(
        os.path.join(args.target_root, spec.mapping.table), [spec.mapping.alternate_key]
    )
    t0 = time.time()
    version = target.upsert(spark, df)
    n = target.read(spark).count()
    return {
        "pipeline": name,
        "rows": n,
        "version": version,
        "seconds": round(time.time() - t0, 2),
        "metrics": obs.get,
    }


def main(argv=None) -> int:
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--pipelines", default=DEFAULT_PIPELINES)
    known, _ = pre.parse_known_args(argv)
    specs = plans.load_pipelines(known.pipelines)

    ap = argparse.ArgumentParser(description=__doc__, parents=[pre])
    # choices discovered from config, like modules/olap_sync.py:199-209
    ap.add_argument("--query", required=True, choices=[*specs.keys(), "all"])
    ap.add_argument("--fy", type=int, help="fiscal-year slicer (F4)")
    ap.add_argument("--fp", type=int, help="fiscal-period slicer, 1-13 (F5)")
    ap.add_argument(
        "--fy-start",
        help="fiscal-year anchor MM-DD (13-4 calendar start; default from pipeline spec, else 01-01)",
    )
    ap.add_argument("--length", choices=["1wk", "2wk"], help="trailing-window slicer (F6)")
    ap.add_argument(
        "--backfill-years",
        type=int,
        nargs="+",
        help="multi-year backfill: run the pipeline once per 13-4 fiscal "
        "period of each listed year (the reference's period-at-a-time "
        "discipline — one bounded slice per run, idempotent upserts into "
        "the same target; backfill_sales_channel_by_period.sh)",
    )
    ap.add_argument("--sf-dir", default=catalog.DEFAULT_SF_DIR)
    ap.add_argument("--target-root", default="/tmp/bw_targets")
    ap.add_argument("--dry-run", action="store_true")
    ap.add_argument("--print-plan", action="store_true")
    args = ap.parse_args(argv)
    if args.backfill_years and (args.fy or args.fp or args.length):
        ap.error(
            "--backfill-years drives --fy/--fp itself and ignores --length; "
            "combining them is ambiguous — drop the conflicting flags"
        )

    spark = get_spark(app_name="pipeline_runner")
    names = list(specs) if args.query == "all" else [args.query]
    for name in names:
        if args.backfill_years:
            for fy in args.backfill_years:
                for fp in range(1, 14):
                    args.fy, args.fp = fy, fp
                    result = run_one(spark, specs, name, args)
                    print({"fy": fy, "fp": fp, **result})
        else:
            result = run_one(spark, specs, name, args)
            print(result)
    return 0


if __name__ == "__main__":
    sys.exit(main())
