#!/usr/bin/env python3
"""k17 decade probe: split the flagship gate's wall into FIXTURE
(window-dedup staging + base-table churn commits) vs REFRESH (the
49-measure maintain_pipeline_rollup folds) vs SERVE, with >=3 samples
per scale factor (VERDICT r12 #2, carried from r11 #3 — the 363 s sf10
row in docs/SCALING.md was a fixture-confounded single sample).

Phases per sample (the gate's own lifecycle, same spec, same waves):
  fixture   — deduped-lineitem pin + initial upsert + wave upsert +
              delete (all base-table commits; O(corpus))
  bootstrap — first maintain_pipeline_rollup (full 49-measure rollup)
  refresh   — ONE incremental refresh spanning upsert + delete (the
              O(churn) fold the decade claim is about)
  serve     — serve_pipeline_from_matview + count

Usage: python tools/probe_k17_decades.py [--sfs 0.1,1,10] [--runs 3]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import Window  # noqa: E402


def run_once(spark, sf_dir: str) -> dict:
    from bw_new_data_integration_spark.plans import pipeline as plans
    from bw_new_data_integration_spark.plans.matview_pipeline import (
        maintain_pipeline_rollup,
        serve_pipeline_from_matview,
        staging_frame,
    )
    from bw_new_data_integration_spark.queries.table import (
        _PIPELINES_YAML,
        _t,
        tune_for_oracle_parity,
    )
    from bw_new_data_integration_spark.sources.parquet_target import (
        ParquetKeyedTable,
    )

    T = time.perf_counter
    out: dict[str, float] = {}
    tune_for_oracle_parity(spark)
    spec = plans.load_pipelines(_PIPELINES_YAML)["daily_sales_full"]

    t0 = T()
    li = (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") % 5 == 0)
        .withColumn("ok", F.col("l_orderkey"))
        .withColumn(
            "k", (F.col("l_orderkey") * 8 + F.col("l_linenumber")).cast("bigint")
        )
    )
    w = Window.partitionBy("k").orderBy(
        F.desc("l_extendedprice"), F.desc("l_discount"), F.desc("l_suppkey"),
        F.desc("l_partkey"), F.desc("l_shipdate"), F.desc("l_quantity"),
        F.desc("l_tax"), F.desc("l_linenumber"), F.desc("l_returnflag"),
        F.desc("l_linestatus"),
    )
    li = (
        li.withColumn("__rn", F.row_number().over(w))
        .where("__rn = 1")
        .drop("__rn")
        .localCheckpoint(eager=True)
    )
    staged = staging_frame(li, spec)
    root = tempfile.mkdtemp(prefix="bw_k17probe_")
    try:
        base = ParquetKeyedTable(root + "/base", ["k"], change_feed=True)
        roll = ParquetKeyedTable(root + "/roll", ["store_number", "calendar_date"])
        base.upsert(spark, staged.where(F.col("ok") % 4 != 1))
        out["fixture_initial"] = T() - t0

        t0 = T()
        maintain_pipeline_rollup(spark, spec, base, roll)
        out["bootstrap"] = T() - t0

        t0 = T()
        wave = staging_frame(
            li.where(F.col("ok") % 4 == 0)
            .withColumn("l_extendedprice", F.col("l_extendedprice") * 2)
            .unionByName(li.where(F.col("ok") % 4 == 1)),
            spec,
        ).localCheckpoint(eager=True)
        base.upsert(spark, wave)
        dead = (
            staged.where(F.col("ok") % 6 == 2).select("k").localCheckpoint(eager=True)
        )
        base.delete_keys(spark, dead)
        out["fixture_churn"] = T() - t0

        t0 = T()
        stats = maintain_pipeline_rollup(spark, spec, base, roll)
        assert stats["action"] == "incremental", stats
        out["refresh"] = T() - t0

        t0 = T()
        n = serve_pipeline_from_matview(spark, spec, roll).count()
        out["serve"] = T() - t0
        out["rows"] = n
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sfs", default="0.1,1,10")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    from bw_new_data_integration_spark.session import get_spark

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spark = get_spark(app_name="probe_k17_decades")
    spark.range(1000).count()  # session warmup
    for sf in args.sfs.split(","):
        sf = sf.strip()
        local = os.path.join(repo, ".localdata", f"sf{sf}")
        sf_dir = local if os.path.isdir(local) else f"/root/testdata/sf{sf}"
        if not os.path.isdir(sf_dir):
            print(f"# sf{sf}: no data at {sf_dir}, skipped")
            continue
        acc: dict[str, list[float]] = {}
        for r in range(args.runs):
            res = run_once(spark, sf_dir)
            for k, v in res.items():
                acc.setdefault(k, []).append(v)
            print(
                f"# sf{sf} run{r}: "
                + " ".join(f"{k}={v:.2f}" for k, v in res.items())
            )
        best = {k: min(v) for k, v in acc.items() if k != "rows"}
        fixture = best["fixture_initial"] + best["fixture_churn"]
        print(
            f"sf{sf}: fixture={fixture:.2f}s bootstrap={best['bootstrap']:.2f}s "
            f"refresh={best['refresh']:.2f}s serve={best['serve']:.2f}s "
            f"(min of {args.runs}; rows={int(acc['rows'][0])})"
        )
    spark.stop()


if __name__ == "__main__":
    main()
