#!/usr/bin/env python3
"""Parallelism-determinism sweep: every registered query must produce
bit-identical rows under different masters/shuffle widths (the
decimal-accumulation + total-ordering policy, verified end-to-end).

Usage: python3 tools/determinism_sweep.py [sf_dir] [query ...]
Non-directory arguments are query-name filters (default: every
registered query). Exit 0 = all selected queries identical across
local[4]/5-part and local[16]/64-part.
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bw_new_data_integration_spark import queries as q
from bw_new_data_integration_spark.session import get_spark


def run_all(master: str, parts: int, sf_dir: str, only: set[str]) -> dict[str, str]:
    spark = get_spark(app_name=f"det_{parts}", master=master, shuffle_partitions=parts)
    out = {}
    for name, fn in sorted(q.registry().items()):
        if only and name not in only:
            continue
        rows = sorted(map(str, fn(spark, sf_dir).collect()))
        out[name] = hashlib.md5("\n".join(rows).encode()).hexdigest()
    spark.stop()
    return out


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.001"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    only = set(args)
    missing = only - q.registry().keys()
    if missing:
        print(f"unknown queries: {sorted(missing)}")
        return 2
    a = run_all("local[4]", 5, sf_dir, only)
    b = run_all("local[16]", 64, sf_dir, only)
    bad = [n for n in a if a[n] != b[n]]
    for n in bad:
        print(f"NONDETERMINISTIC {n}: {a[n]} != {b[n]}")
    print(f"RESULT: {len(a) - len(bad)} deterministic, {len(bad)} nondeterministic")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
