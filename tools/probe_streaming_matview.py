"""VERDICT r9 task 4: split streaming_matview_e2e's wall into its
components per epoch — base keyed-table upsert vs incremental rollup
refresh (feed fold + rollup merge) — across scale factors, to test the
O(churn) design claim: the fold should track EPOCH SIZE, and any growth
with BASE SIZE should live in the base upsert (growing-table merge).

Run: python tools/probe_streaming_matview.py /root/testdata/sf0.1
     python tools/probe_streaming_matview.py /root/repo/.localdata/sf1
     python tools/probe_streaming_matview.py /root/repo/.localdata/sf10
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
import uuid

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, functions as F, types as T  # noqa: E402

from bw_new_data_integration_spark.operators.matview import maintain_rollup  # noqa: E402
from bw_new_data_integration_spark.session import get_spark, tune_for_oracle_parity  # noqa: E402
from bw_new_data_integration_spark.sources.parquet_target import ParquetKeyedTable  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = tune_for_oracle_parity(get_spark())
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).select(
        "event_id", "event_type", F.col("value").cast("double").alias("value")
    )
    n_events = ev.count()
    base_dir = tempfile.mkdtemp(prefix="bw_smvp_")
    staging = os.path.join(base_dir, "src")
    os.makedirs(staging)
    for wave in range(3):
        ev.where(F.col("event_id") % 3 == wave).coalesce(1).write.parquet(
            os.path.join(base_dir, f"w{wave}")
        )
        for f in os.listdir(os.path.join(base_dir, f"w{wave}")):
            if f.endswith(".parquet"):
                os.rename(
                    os.path.join(base_dir, f"w{wave}", f),
                    os.path.join(staging, f"wave{wave}.parquet"),
                )
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
        ]
    )
    base = ParquetKeyedTable(os.path.join(base_dir, "base"), ["event_id"], change_feed=os.environ.get("SMV_CDF", "1") == "1")
    roll = ParquetKeyedTable(os.path.join(base_dir, "roll"), ["event_type"])
    timings: list[dict] = []

    def fold_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.persist()
        try:
            if batch_df.isEmpty():
                return
            t0 = time.perf_counter()
            base.upsert(batch_df.sparkSession, batch_df)
            t1 = time.perf_counter()
            stats = maintain_rollup(
                batch_df.sparkSession, base, roll, ["event_type"], {"sum_value": "value"}
            )
            t2 = time.perf_counter()
            timings.append(
                {
                    "epoch": epoch_id,
                    "base_upsert_s": round(t1 - t0, 2),
                    "refresh_s": round(t2 - t1, 2),
                    "action": stats["action"],
                    "base_files": base.manifest()["n_files"],
                }
            )
        finally:
            batch_df.unpersist()

    reader = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
    events = reader.parquet(staging)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    wall0 = time.perf_counter()
    try:
        q = (
            events.writeStream.outputMode("update")
            .foreachBatch(fold_epoch)
            .option("checkpointLocation", os.path.join(base_dir, "ckpt"))
            .queryName("smvp_" + uuid.uuid4().hex[:8])
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    wall = time.perf_counter() - wall0
    print(f"\nsf_dir={sf_dir} events={n_events} total_wall={wall:.2f}s")
    up = sum(t["base_upsert_s"] for t in timings)
    rf = sum(t["refresh_s"] for t in timings)
    for t in timings:
        print(f"  epoch {t['epoch']}: base_upsert {t['base_upsert_s']:6.2f}s"
              f"  refresh {t['refresh_s']:6.2f}s  ({t['action']}, {t['base_files']} base files)")
    print(f"  SUM: base_upsert {up:.2f}s  refresh {rf:.2f}s  "
          f"streaming_overhead {wall - up - rf:.2f}s")


if __name__ == "__main__":
    main()
