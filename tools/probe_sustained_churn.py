#!/usr/bin/env python3
"""Sustained-churn curve probe (VERDICT r13 #4, carried from r12 #4 /
r11 #8): replay the 110-commit MoR churn from
``tests/test_sustained_churn.py`` and RECORD the curve the test only
bounds — per-commit wall, tombstone-sidecar set count, write-version
union width, dead-row share, and cumulative compactions — so
docs/SCALING.md can show the steady state instead of asserting it.

Usage: python tools/probe_sustained_churn.py [--commits 110] [--every 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main() -> None:  # noqa: C901
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--commits", type=int, default=110)
    ap.add_argument("--every", type=int, default=10)
    ap.add_argument("--keys", type=int, default=400)
    # at probe scale every file is < the 8 MB small-file threshold, so the
    # default policy compacts EVERY commit and the MoR debt policy never
    # gets to act; 0 disables the small-file trigger (production files are
    # >= the target size and do not hit it) so the tombstone steady state
    # is the thing measured
    ap.add_argument("--small-bytes", type=int, default=None)
    args = ap.parse_args()
    n_keys = args.keys

    from bw_new_data_integration_spark.session import get_spark
    from bw_new_data_integration_spark.sources.parquet_target import (
        ParquetKeyedTable,
    )

    spark = get_spark(app_name="probe_sustained_churn")
    spark.range(1000).count()
    root = tempfile.mkdtemp(prefix="bw_churn_")
    t = ParquetKeyedTable(os.path.join(root, "t"), ["k"], write_mode="mor")
    compactions = 0
    window: list[float] = []
    for i in range(args.commits):
        t0 = time.perf_counter()
        if i and i % 5 == 0:
            ks = [(k,) for k in range(n_keys) if k % 11 == i % 11]
            t.delete_keys(spark, spark.createDataFrame(ks, "k bigint"))
        else:
            rows = [
                (k, float(k * 1000 + i), f"m{k % 12}")
                for k in range(n_keys)
                if k % 7 == i % 7
            ]
            t.upsert(
                spark, spark.createDataFrame(rows, "k bigint, v double, month string")
            )
        if args.small_bytes is None:
            t.maybe_compact(spark)
        else:
            t.maybe_compact(spark, small_file_bytes=args.small_bytes)
        window.append(time.perf_counter() - t0)
        m = t.manifest()
        if m.get("operation") in ("compact", "compact_where", "compact_tombstones"):
            compactions += 1
        if (i + 1) % args.every == 0:
            tombs = m.get("tombstones") or []
            files = m["files"]
            sets = len({int(tb["tv"]) for tb in tombs})
            wv = len({int(f.get("wv", 0)) for f in files})
            trows = sum(tb.get("rows") or 0 for tb in tombs)
            drows = sum(f.get("rows") or 0 for f in files)
            frac = (trows / drows) if drows else 0.0
            print(
                f"commit {i+1:4d}: wall/commit avg={sum(window)/len(window):.3f}s "
                f"max={max(window):.3f}s | files={len(files)} sidecar_sets={sets} "
                f"wv_groups={wv} dead_frac={frac:.3f} compactions={compactions}"
            )
            window = []
    spark.stop()


if __name__ == "__main__":
    main()
