"""Profile the FIXED per-commit cost of ParquetKeyedTable (VERDICT r9
task 6): k11's lifecycle wall is commit-overhead-dominated at sf0.1, and
a 100 TB lakehouse takes many small commits (the streaming matview does
one per epoch) — so the fixed term matters as much as the per-byte term.

Builds a k11-shaped base table (1/3 of orders at the given sf), then
times ONE single-row upsert with every internal phase wrapped:
range-probe, snapshot write, manifest write, hard-link pass, pointer
flip. Run: python tools/profile_commit.py [sf_dir]
"""

from __future__ import annotations

import functools
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from bw_new_data_integration_spark.session import get_spark  # noqa: E402
from bw_new_data_integration_spark.sources.parquet_target import (  # noqa: E402
    ParquetKeyedTable,
)

PHASES = [
    "_probe_touched_ranges",
    "_write_snapshot",
    "_write_manifest",
    "_link_files",
    "_flip",
    "_n_write_partitions",
    "read",
    "manifest",
]


def wrap(cls, acc):
    originals = {}
    for name in PHASES:
        raw = cls.__dict__[name]
        originals[name] = raw
        fn = raw.__func__ if isinstance(raw, staticmethod) else raw

        @functools.wraps(fn)
        def timed(*a, __fn=fn, __name=name, **kw):
            t0 = time.perf_counter()
            try:
                return __fn(*a, **kw)
            finally:
                acc[__name] = acc.get(__name, 0.0) + time.perf_counter() - t0
                acc[f"n_{__name}"] = acc.get(f"n_{__name}", 0) + 1

        setattr(cls, name, staticmethod(timed) if isinstance(raw, staticmethod) else timed)
    return originals


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark()
    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .where(F.col("o_orderkey") % 3 == 0)
        .select(
            F.col("o_orderkey").alias("k"),
            (F.col("o_custkey") % 101).cast("bigint").alias("grp"),
            F.col("o_totalprice").cast("double").alias("price"),
        )
    )
    root = tempfile.mkdtemp(prefix="bw_prof_")
    t = ParquetKeyedTable(root + "/base", ["k"])
    t.overwrite(o)
    t.compact(spark, target_file_bytes=max(1, t.manifest()["total_bytes"] // 12))
    one = spark.createDataFrame([(12345678901, 7, 1.0)], "k long, grp long, price double")
    # warm the write path once (codegen/JIT), untimed
    t.upsert(spark, one)

    for trial in range(3):
        acc: dict = {}
        originals = wrap(ParquetKeyedTable, acc)
        t0 = time.perf_counter()
        t.upsert(
            spark,
            spark.createDataFrame(
                [(12345678902 + trial, 8, 2.0)], "k long, grp long, price double"
            ),
        )
        wall = time.perf_counter() - t0
        for name, fn in originals.items():
            setattr(ParquetKeyedTable, name, fn)
        # _flip includes _write_manifest; subtract for the residual
        flip_resid = acc.get("_flip", 0) - acc.get("_write_manifest", 0)
        print(f"\n-- trial {trial}: single-row upsert total {wall:.3f}s --")
        shown = 0.0
        for name in PHASES:
            if name == "_flip":
                continue
            v = acc.get(name)
            if v is None:
                continue
            if name == "_write_snapshot":
                v = v - acc.get("_write_manifest", 0) * 0  # disjoint
            print(f"  {name:24s} {v:7.3f}s  x{acc.get('n_' + name, 0)}")
            shown += v
        print(f"  {'flip residual (ptr+txn)':24s} {max(0.0, flip_resid):7.3f}s")
        print(f"  {'unattributed':24s} {max(0.0, wall - shown - max(0.0, flip_resid)):7.3f}s")


if __name__ == "__main__":
    main()
