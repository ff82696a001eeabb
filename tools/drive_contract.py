"""Drive __spark_entry__ exactly as the driver does: fresh session,
entry() smoke, queries() vs oracle_sql() at sf0.01 via DuckDB."""
import sys, time
sys.path.insert(0, "/root/repo")
import duckdb
import pandas as pd
from pyspark.sql import SparkSession

import __spark_entry__ as E

spark = (SparkSession.builder.master("local[8]")
         .appName("driver-sim").config("spark.ui.enabled","false")
         .getOrCreate())  # NOTE: deliberately NOT the engine's tuned session

# t1 smoke
t0 = time.time()
df = E.entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows in {time.time()-t0:.1f}s schema={[f.name for f in df.schema.fields]}")
assert len(rows) > 0

# t2 correctness at sf0.01
SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

qs, os_ = E.queries(), E.oracle_sql()
# optional positional args restrict the sweep to the named queries —
# the fast inner loop when iterating on one gate
only = set(sys.argv[1:])
if only:
    missing = only - qs.keys()
    if missing:
        sys.exit(f"unknown queries: {sorted(missing)}")
    qs = {k: v for k, v in qs.items() if k in only}
n_ok = n_bad = 0
for name, fn in sorted(qs.items()):
    t0 = time.time()
    spdf = fn(spark, SF).toPandas()
    dt = time.time()-t0
    if name not in os_:
        print(f"  rows-only {name}: {len(spdf)} rows {dt:.1f}s"); continue
    ddf = con.sql(os_[name]).df()
    ok = len(spdf)==len(ddf) and sorted(spdf.columns)==sorted(ddf.columns)
    if ok:
        s = spdf[sorted(spdf.columns)].sort_values(list(sorted(spdf.columns)), na_position="last").reset_index(drop=True)
        d = ddf[sorted(ddf.columns)].sort_values(list(sorted(ddf.columns)), na_position="last").reset_index(drop=True)
        try:
            pd.testing.assert_frame_equal(s, d, check_dtype=False, check_exact=True)
        except AssertionError as e:
            ok = False
            print(f"    mismatch detail: {str(e)[:200]}")
    print(f"  {'OK ' if ok else 'BAD'} {name}: {len(spdf)} rows {dt:.1f}s")
    n_ok += ok; n_bad += (not ok)
print(f"RESULT: {n_ok} ok, {n_bad} bad")
sys.exit(1 if n_bad else 0)
