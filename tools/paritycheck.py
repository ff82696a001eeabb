"""Driver-faithful correctness check: run every registered query in Spark
AND its DuckDB oracle at a given SF, canonicalize (sort columns by name,
sort rows), and compare *rendered* cell values strictly.

Stricter than tests/test_oracle_parity.py: value rendering (dtype) must
match too, because the driver compares a value-hash of rendered cells —
int64 1 vs float64 1.0, Decimal('1.50') vs 1.5, or date vs timestamp all
hash-mismatch even though `==` would pass.

Usage:
  python tools/paritycheck.py [--sf /root/testdata/sf0.01] [name ...]
"""

from __future__ import annotations

import argparse
import decimal
import hashlib
import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

from bw_new_data_integration_spark import queries as q
from bw_new_data_integration_spark.session import get_spark

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def render(v) -> str:
    """Canonical cell rendering, dtype-sensitive like a value-hash is."""
    if v is None:
        return "\0NULL"
    if isinstance(v, float):
        if v != v:
            return "\0NULL"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return "dec:" + str(v)
    if isinstance(v, bytes):
        return "bytes:" + v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(render(x) for x in v) + "]"
    try:
        if pd.isna(v):
            return "\0NULL"
    except (TypeError, ValueError):
        pass
    return f"{type(v).__name__}:{v}"


def canon_rows(pdf: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = [tuple(render(v) for v in row) for row in pdf.itertuples(index=False, name=None)]
    rows.sort()
    return rows


def value_hash(rows: list[tuple[str, ...]]) -> str:
    h = hashlib.sha256()
    for r in rows:
        for c in r:
            h.update(c.encode())
            h.update(b"\x1f")
        h.update(b"\x1e")
    return h.hexdigest()


def first_diff(srows, drows):
    for i, (a, b) in enumerate(zip(srows, drows)):
        if a != b:
            return i, a, b
    return None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    spark = get_spark(app_name="paritycheck", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    reg = q.registry()
    oracles = q.oracles()
    names = args.names or sorted(reg)
    n_pass = n_fail = n_rowsonly = 0
    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = reg[name](spark, args.sf)
            spdf = sdf.toPandas()
            sql = oracles.get(name)
            if sql is None:
                n_rowsonly += 1
                print(f"ROWSONLY {name:40s} rows={len(spdf)} ({time.time()-t0:.1f}s)")
                continue
            dpdf = con.sql(sql).fetchdf()
            ok_rows = len(spdf) == len(dpdf)
            ok_schema = sorted(spdf.columns) == sorted(dpdf.columns)
            srows, drows = canon_rows(spdf), canon_rows(dpdf)
            ok_hash = value_hash(srows) == value_hash(drows)
            if ok_rows and ok_schema and ok_hash:
                n_pass += 1
                print(f"PASS     {name:40s} rows={len(spdf)} ({time.time()-t0:.1f}s)")
            else:
                n_fail += 1
                msg = f"FAIL     {name:40s} rows={ok_rows}({len(spdf)}/{len(dpdf)}) schema={ok_schema} hash={ok_hash}"
                print(msg)
                if ok_rows and ok_schema and not ok_hash:
                    d = first_diff(srows, drows)
                    if d:
                        i, a, b = d
                        print(f"  first diff row {i}: cols={sorted(spdf.columns)}")
                        print(f"    spark : {a}")
                        print(f"    duckdb: {b}")
                elif not ok_schema:
                    print(f"  spark cols : {sorted(spdf.columns)}")
                    print(f"  duckdb cols: {sorted(dpdf.columns)}")
                failures.append(name)
        except Exception:
            n_fail += 1
            failures.append(name)
            print(f"ERROR    {name}")
            traceback.print_exc()
    print(
        f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only of {len(names)}"
    )
    if failures:
        print("failures:", " ".join(failures))
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
