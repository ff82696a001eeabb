#!/usr/bin/env python3
"""streaming_dedup_drip per-batch split (VERDICT r13 #7, carried from
r12 #8): run the drip gate's exact shape (3 full redeliveries, one file
per micro-batch, RocksDB state) and split the wall into per-batch
addBatch/getBatch/commit plus the state-store metrics — separating
SOURCE REPLAY cost (reading the redelivered file, shuffling to the
dedup key layout) from STATE-STORE LOAD (rows in state, memory, commit
time), so the growth term can be named instead of guessed.

Usage: python tools/probe_drip_batches.py [sf_dir] [runs]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.localdata/sf10"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    from bw_new_data_integration_spark.session import get_spark
    from bw_new_data_integration_spark.streaming import stream as st

    spark = get_spark(app_name="probe_drip_batches")
    spark.range(1000).count()
    for r in range(runs):
        staging = tempfile.mkdtemp(prefix="bw_drip_probe_")
        for i in (1, 2, 3):
            shutil.copy(
                os.path.join(sf_dir, "events.parquet"),
                os.path.join(staging, f"copy{i}.parquet"),
            )
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        st.use_rocksdb_state(spark)
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        try:
            events = st.read_event_stream(spark, staging, max_files_per_trigger=1)
            deduped = st.dedup_stream(events, keys=("event_id",), watermark="14 days")
            name = "drip_probe_" + uuid.uuid4().hex[:8]
            t0 = time.perf_counter()
            q = (
                deduped.select("event_id", "event_type")
                .writeStream.format("memory")
                .queryName(name)
                .outputMode("append")
                .option("checkpointLocation", tempfile.mkdtemp(prefix="bw_dpc_"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            wall = time.perf_counter() - t0
            print(f"run {r}: wall {wall:.2f}s @ {sf_dir}")
            for p in q.recentProgress:
                d = p.get("durationMs", {}) or {}
                ops = p.get("stateOperators", []) or []
                srow = ops[0] if ops else {}
                cm = srow.get("customMetrics", {}) or {}
                print(
                    f"  batch {p.get('batchId')}: rows_in={p.get('numInputRows')} "
                    f"addBatch={d.get('addBatch')}ms getBatch={d.get('getBatch')}ms "
                    f"commit={d.get('commitOffsets')}ms trigger={d.get('triggerExecution')}ms | "
                    f"state_rows={srow.get('numRowsTotal')} upd={srow.get('numRowsUpdated')} "
                    f"mem={srow.get('memoryUsedBytes')} commitMs={srow.get('commitTimeMs')} "
                    f"rocksdb_commit={cm.get('rocksdbCommitLatency')} "
                )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
            shutil.rmtree(staging, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
