#!/usr/bin/env python3
"""Three-decade merge-on-read A/B probe (VERDICT r10 tasks 2+6).

Measures, at a given SF, on identical range-clustered keyed tables
built from the orders fixture:

  WRITE side — an interleaved churn batch (every data file's key range
  touched) committed into (a) a copy-on-write table, (b) a merge-on-
  read table, at 1% and 10% churn;

  READ side — full-scan count and a key-window read_where on the MoR
  table with 0% / 1% / 10% of rows invalidated by live tombstones,
  against the COW control (the "MoR read tax");

  CDF side — a maintained-rollup refresh consuming the same churn
  commit from a COW vs a MoR change_feed base.

Prints one JSON line per SF; run at sf0.1 / 1 / 10 and paste into
docs/SCALING.md §R11. Usage: python tools/probe_mor.py --sf 0.1
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bw_new_data_integration_spark import catalog
from bw_new_data_integration_spark.operators.matview import maintain_rollup
from bw_new_data_integration_spark.session import get_spark
from bw_new_data_integration_spark.sources.parquet_target import ParquetKeyedTable


def _orders(spark, sf_dir):
    return catalog.load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        (F.col("o_custkey") % 101).cast("bigint").alias("grp"),
        F.col("o_totalprice").cast("double").alias("price"),
        F.col("o_orderpriority").alias("prio"),
    )


def _churn_batch(src, pct: int):
    # every Nth key: uniformly interleaved across the whole key domain,
    # so a COW range-scoped merge must touch ~every file
    n = max(1, round(100 / pct))
    return (
        src.where(F.col("k") % n == 0)
        .withColumn("price", F.col("price") * 2)
        .localCheckpoint(eager=True)
    )


def _timed(fn):
    t0 = time.time()
    fn()
    return round(time.time() - t0, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="0.1")
    args = ap.parse_args()
    local = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".localdata", f"sf{args.sf}",
    )
    sf_dir = local if os.path.isdir(local) else f"/root/testdata/sf{args.sf}"
    spark = get_spark(app_name="probe_mor")
    src = _orders(spark, sf_dir)
    out: dict = {"probe": "mor_ab", "sf": float(args.sf), "write": {}, "read": {},
                 "cdf_refresh": {}}

    root = tempfile.mkdtemp(prefix="bw_mor_probe_")
    try:
        for pct in (1, 10):
            batch = _churn_batch(src, pct)
            n_batch = batch.count()
            walls = {}
            for mode in ("cow", "mor"):
                t = ParquetKeyedTable(
                    os.path.join(root, f"w_{mode}_{pct}"), ["k"], write_mode=mode
                )
                t.overwrite(src)  # identical bases, untimed
                walls[mode] = _timed(
                    lambda t=t: t.upsert(spark, batch, source_rows=n_batch)
                )
                m = t.manifest()
                walls[f"{mode}_linked"] = m["n_linked"]
                walls[f"{mode}_files"] = m["n_files"]
            walls["batch_rows"] = n_batch
            walls["speedup"] = round(walls["cow"] / walls["mor"], 2)
            out["write"][f"churn_{pct}pct"] = walls

        # read tax: one MoR table per invalidation level vs a COW control
        cow = ParquetKeyedTable(os.path.join(root, "r_cow"), ["k"])
        cow.overwrite(src)
        hi = src.agg(F.max("k")).collect()[0][0]
        window = (int(hi * 0.4), int(hi * 0.5))  # a 10% key window
        for pct in (0, 1, 10):
            t = ParquetKeyedTable(os.path.join(root, f"r_mor_{pct}"), ["k"],
                                  write_mode="mor")
            t.overwrite(src)
            if pct:
                b = _churn_batch(src, pct)
                t.upsert(spark, b, source_rows=b.count())
            rec = {
                "count": _timed(lambda t=t: t.read(spark).count()),
                "window": _timed(
                    lambda t=t: t.read_where(
                        spark, [("k", "between", window)]
                    ).count()
                ),
                "agg": _timed(
                    lambda t=t: t.read(spark)
                    .groupBy("grp").agg(F.sum("price")).count()
                ),
            }
            out["read"][f"invalidated_{pct}pct"] = rec
        out["read"]["cow_control"] = {
            "count": _timed(lambda: cow.read(spark).count()),
            "window": _timed(
                lambda: cow.read_where(spark, [("k", "between", window)]).count()
            ),
            "agg": _timed(
                lambda: cow.read(spark).groupBy("grp").agg(F.sum("price")).count()
            ),
        }

        # CDF-fed matview refresh over a 1% interleaved churn commit
        for mode in ("cow", "mor"):
            base = ParquetKeyedTable(
                os.path.join(root, f"c_{mode}"), ["k"],
                write_mode=mode, change_feed=True,
            )
            roll = ParquetKeyedTable(os.path.join(root, f"c_{mode}_roll"), ["grp"])
            base.overwrite(src)
            maintain_rollup(spark, base, roll, ["grp"], {"sum_price": "price"})
            batch = _churn_batch(src, 1)
            nb = batch.count()
            commit_wall = _timed(
                lambda b=base, bt=batch: b.upsert(spark, bt, source_rows=nb)
            )
            refresh_wall = _timed(
                lambda b=base, r=roll: maintain_rollup(
                    spark, b, r, ["grp"], {"sum_price": "price"}
                )
            )
            out["cdf_refresh"][mode] = {
                "commit": commit_wall, "refresh": refresh_wall,
            }
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
