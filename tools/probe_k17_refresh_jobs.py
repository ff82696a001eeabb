"""Job-level profile of the k17 refresh: wrap the ONE incremental
maintain_pipeline_rollup call in statusTracker job accounting and a
per-phase monkeypatch timer, to see whether the refresh wall is data
work or job-count/driver overhead (guide §1.1/§7.3).

Run: python tools/probe_k17_refresh_jobs.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from bw_new_data_integration_spark.plans import pipeline as plans
    from bw_new_data_integration_spark.plans.matview_pipeline import (
        maintain_pipeline_rollup,
        staging_frame,
    )
    from bw_new_data_integration_spark.queries.table import (
        _PIPELINES_YAML,
        _t,
        tune_for_oracle_parity,
    )
    from bw_new_data_integration_spark.session import get_spark
    from bw_new_data_integration_spark.sources.parquet_target import (
        ParquetKeyedTable,
    )

    spark = get_spark(app_name="probe_k17_refresh")
    tune_for_oracle_parity(spark)
    spark.range(1000).count()
    spec = plans.load_pipelines(_PIPELINES_YAML)["daily_sales_full"]

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
    root = tempfile.mkdtemp(prefix="bw_k17rj_")
    try:
        base = ParquetKeyedTable(root + "/base", ["k"], change_feed=True)
        roll = ParquetKeyedTable(
            root + "/roll", ["store_number", "calendar_date"]
        )
        base.upsert(spark, staged.where(F.col("ok") % 4 != 1))
        maintain_pipeline_rollup(spark, spec, base, roll)
        wave = staging_frame(
            li.where(F.col("ok") % 4 == 0)
            .withColumn("l_extendedprice", F.col("l_extendedprice") * 2)
            .unionByName(li.where(F.col("ok") % 4 == 1)),
            spec,
        ).localCheckpoint(eager=True)
        base.upsert(spark, wave)
        dead = (
            staged.where(F.col("ok") % 6 == 2)
            .select("k")
            .localCheckpoint(eager=True)
        )
        base.delete_keys(spark, dead)

        # --- instrument the refresh ---
        # New-job set from the AppStatusStore jobsList delta (ADVICE
        # r13: statusTracker().getJobIdsForGroup(None) misses any job
        # submitted under a job group, deflating the job sum and
        # inflating the reported driver gaps).
        jsc = spark.sparkContext._jsc.sc()
        store = jsc.statusStore()

        def _all_job_ids() -> set:
            jd = store.jobsList(None)
            return {jd.apply(i).jobId() for i in range(jd.size())}

        before_ids = _all_job_ids()
        t0 = time.perf_counter()
        stats = maintain_pipeline_rollup(spark, spec, base, roll)
        wall = time.perf_counter() - t0
        assert stats["action"] == "incremental", stats
        time.sleep(0.5)
        ids = sorted(_all_job_ids() - before_ids)
        jdata = store.jobsList(None)
        n = jdata.size()
        per_job = []
        for i in range(n):
            j = jdata.apply(i)
            if j.jobId() in ids:
                sub = j.submissionTime()
                comp = j.completionTime()
                if sub.isDefined() and comp.isDefined():
                    ms = (
                        comp.get().getTime() - sub.get().getTime()
                    )
                    per_job.append((j.jobId(), ms, j.name()[:90]))
        per_job.sort()
        total_job = sum(ms for _, ms, _ in per_job) / 1000.0
        print(f"refresh wall: {wall:.2f}s; {len(per_job)} jobs, "
              f"sum job time {total_job:.2f}s, driver gaps "
              f"{wall - total_job:.2f}s")
        for jid, ms, name in per_job:
            print(f"  job {jid}: {ms/1000.0:6.2f}s  {name}")
    finally:
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
