"""VERDICT r9 task 8: A/B the state-store provider for the streaming
dedup family at sf10 — default HDFSBackedStateStore (in-memory maps,
full-horizon eviction in one maintenance step = the r9 'cliff') vs
RocksDBStateStoreProvider (spills to local disk, incremental
maintenance). Runs the doubled-stream dedup both single-batch
(availableNow, the gate's shape) and multi-batch (maxFilesPerTrigger=1,
the variant r8 rejected at 116s because batch 2 mass-evicted 10M keys).

Run: python tools/probe_rocksdb_dedup.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, "/root/repo")

from bw_new_data_integration_spark.session import get_spark, tune_for_oracle_parity  # noqa: E402
from bw_new_data_integration_spark.streaming import stream as st  # noqa: E402

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
DEFAULT = (
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
)


def run(spark, sf_dir: str, provider: str, multi_batch: bool) -> tuple[float, int]:
    staging = tempfile.mkdtemp(prefix="bw_rdb_")
    shutil.copy(os.path.join(sf_dir, "events.parquet"), os.path.join(staging, "c1.parquet"))
    shutil.copy(os.path.join(sf_dir, "events.parquet"), os.path.join(staging, "c2.parquet"))
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    events = st.read_event_stream(
        spark, staging, max_files_per_trigger=1 if multi_batch else None
    )
    deduped = st.dedup_stream(events, keys=("event_id",), watermark="14 days")
    name = "rdb_" + uuid.uuid4().hex[:8]
    t0 = time.perf_counter()
    q = (
        deduped.select("event_id", "event_type")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.perf_counter() - t0
    n = spark.table(name).count()
    shutil.rmtree(staging, ignore_errors=True)
    return wall, n


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.localdata/sf10"
    spark = tune_for_oracle_parity(get_spark())
    for provider, label in ((DEFAULT, "hdfs-backed"), (ROCKSDB, "rocksdb")):
        for multi in (False, True):
            try:
                wall, n = run(spark, sf_dir, provider, multi)
                print(
                    f"{label:12s} {'multi-batch' if multi else 'single-batch':13s}"
                    f" wall={wall:7.2f}s rows={n}"
                )
            except Exception as e:  # provider unavailable → record, not crash
                print(f"{label:12s} {'multi' if multi else 'single':13s} FAILED: {e}")


if __name__ == "__main__":
    main()
