"""streaming query-family module — split from the monolithic queries.py
(round 6). Registration side effects only; the public registry surface
lives in the package __init__."""

from __future__ import annotations

import os as _os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bw_new_data_integration_spark import catalog
from bw_new_data_integration_spark.functions import coercion, keys, text, vectors
from bw_new_data_integration_spark.operators import (
    aggregate,
    dedup,
    merge,
    similarity,
    window_ops,
)
from bw_new_data_integration_spark.session import tune_for_oracle_parity  # noqa: F401
from bw_new_data_integration_spark.queries._shared import (  # noqa: F401
    _REGISTRY,
    _ORACLES,
    register,
    registry,
    oracles,
    _t,
    _fanout,
    _collect_capped,
    _SHINGLE_SQL,
    _minhash_select_sql,
    _lsh_oracle,
    _BOILER_TEXT,
    _capped_lsh_oracle,
    _simhash_oracle,
    _dot_sql,
    _COS_SQL,
    _STOPWORD_LIST_SQL,
    _lang_id_oracle,
    _PIPELINES_YAML,
    _pipeline,
    _lsh_topk_oracle,
    _lsh_multiprobe_oracle,
    _xmla_cube_fixture,
    _IVF_COS_CENT,
    _near_dup_lsh_oracle,
    _TOKS_SQL,
    _cluster_oracle,
    _dedup_e2e_oracle,
    _profile_cols,

)



# ---------------------------------------------------------------------------
# (Removed round 5: the mm_image_features_stub / mm_video_frames_stub
# registry twins — never driver-sampled, superseded by the gated REAL
# decoders mm_image_features / mm_video_frames. The operator-level stub
# seams extract_image_features / sample_video_frames stay in
# operators/multimodal.py as the documented compressed-codec plumbing
# and are pytest-covered in tests/test_invariants.py.)
# ---------------------------------------------------------------------------
# Structured Streaming: watermarked tumbling-window counts driven to
# completion with an availableNow trigger — the batch-equivalent
# execution of the streaming plan, so the result is deterministic and
# oracle-checkable (sum_value is excluded: double accumulation order
# differs between engines).
# ---------------------------------------------------------------------------
@register(
    "streaming_windowed_counts",
    oracle="""
SELECT strftime(date_trunc('hour', ts::TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS window_start,
       strftime(date_trunc('hour', ts::TIMESTAMP) + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS window_end,
       event_type, COUNT(*) AS n
FROM events GROUP BY 1, 2, 3
""",
)
def streaming_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming tumbling-window counts with watermarked late-data handling."""
    import shutil
    import tempfile
    import uuid

    from bw_new_data_integration_spark.streaming import stream as st

    tune_for_oracle_parity(spark)
    staging = tempfile.mkdtemp(prefix="bw_stream_src_")
    shutil.copy(_os.path.join(sf_dir, "events.parquet"), staging)
    events = st.read_event_stream(spark, staging)
    agg = st.windowed_counts(events, window_duration="1 hour", watermark="14 days")
    out = agg.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        F.date_format("window_end", "yyyy-MM-dd HH:mm:ss").alias("window_end"),
        "event_type",
        "n",
    )
    name = "stream_wc_" + uuid.uuid4().hex[:8]
    # state-store partition count is frozen from shuffle.partitions at
    # query start — bound it so an untuned session (default 200) doesn't
    # run 200 tiny stateful tasks (AQE can't coalesce stateful stages)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


# ---------------------------------------------------------------------------
# §2.9 late-data repair gate: the streaming path (14-day watermark +
# foreachBatch keyed upsert) must converge to the SAME table as the
# batch trailing-window re-sync when events arrive up to 14 days late —
# the reference's repair horizon (truenas/cron-jobs.txt:12 re-upserts a
# 2-week window nightly; the watermark is that horizon expressed as
# streaming state retention). Events are replayed in two waves: wave 1
# is everything on time, wave 2 holds back a deterministic subset of
# the last 14 days and delivers it late. The oracle is the batch
# truth over ALL events — exactly what a trailing-window re-sync
# produces — so a green row proves the two modes reach the same state.
# ---------------------------------------------------------------------------
@register(
    "late_data_repair",
    oracle="""
SELECT strftime(date_trunc('hour', ts::TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, COUNT(*) AS n
FROM events GROUP BY 1, 2
""",
)
def late_data_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window late-data repair: partition-scoped re-merge of a 14-day window."""
    import shutil
    import tempfile
    import uuid

    from pyspark.sql import types as T

    from bw_new_data_integration_spark.sources.parquet_target import ParquetKeyedTable
    from bw_new_data_integration_spark.streaming import stream as st

    tune_for_oracle_parity(spark)
    ev = _t(spark, sf_dir, "events").select("event_id", "ts", "event_type", "value")
    max_ts = ev.agg(F.max("ts")).first()[0]
    # late wave: inside the repair horizon (> max-14d, so never dropped
    # by the watermark) but strictly before the newest hour (so wave 1
    # keeps the global max event time and sets the watermark honestly)
    late_cond = (
        (F.col("ts") > F.lit(max_ts) - F.expr("INTERVAL 14 DAYS"))
        & (F.col("ts") <= F.lit(max_ts) - F.expr("INTERVAL 1 HOUR"))
        & (F.col("event_id") % 3 == 0)
    )

    base = tempfile.mkdtemp(prefix="bw_late_repair_")
    staging = _os.path.join(base, "src")
    _os.makedirs(staging)

    def stage(df: DataFrame, name: str) -> None:
        out = _os.path.join(base, name)
        df.coalesce(1).write.parquet(out)
        for f in _os.listdir(out):
            if f.endswith(".parquet"):
                shutil.copy(_os.path.join(out, f), _os.path.join(staging, f"{name}.parquet"))

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType(), True),
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
        ]
    )
    target = ParquetKeyedTable(_os.path.join(base, "tbl"), ["window_start", "event_type"])
    ckpt = _os.path.join(base, "ckpt")
    qname = "late_repair_" + uuid.uuid4().hex[:8]

    def run_wave() -> None:
        events = st.read_event_stream(spark, staging, schema=schema)
        agg = st.windowed_counts(events, window_duration="1 hour", watermark="14 days")
        out = agg.select(
            F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
        )
        q = (
            st.upsert_sink(out, target, ckpt, query_name=qname)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        stage(ev.filter(~late_cond), "wave1")
        run_wave()  # on-time delivery
        stage(ev.filter(late_cond), "wave2")
        run_wave()  # late arrivals, same checkpoint: state repairs in place
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return target.read(spark).select("window_start", "event_type", "n")


# ---------------------------------------------------------------------------
# Custom stateful streaming: per-user gap sessionization via
# applyInPandasWithState, driven to completion with availableNow. The
# oracle is the batch definition of the same operator — streaming and
# batch must agree at the cutover.
# ---------------------------------------------------------------------------
@register(
    "streaming_sessionize",
    oracle="""
WITH g AS (
  SELECT user_id,
         CASE WHEN lag(ts::TIMESTAMP) OVER w IS NULL
                   OR date_diff('second', lag(ts::TIMESTAMP) OVER w, ts::TIMESTAMP) > 1800
              THEN 1 ELSE 0 END AS is_new
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id)
)
SELECT user_id, SUM(is_new)::BIGINT AS n_sessions FROM g GROUP BY user_id
""",
)
def streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sessionization with gap timeout via stateful processing."""
    import shutil
    import tempfile
    import uuid

    from bw_new_data_integration_spark.streaming import stream as st
    from bw_new_data_integration_spark.streaming.sessionize import stream_sessionize

    tune_for_oracle_parity(spark)
    staging = tempfile.mkdtemp(prefix="bw_stream_sess_")
    shutil.copy(_os.path.join(sf_dir, "events.parquet"), staging)
    events = st.read_event_stream(spark, staging)
    sessions = stream_sessionize(events, gap_minutes=30)
    name = "stream_sess_" + uuid.uuid4().hex[:8]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        q = (
            sessions.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    # update mode emits one row per user per micro-batch; the count is
    # monotone, so the latest value per user is the max
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(F.max("n_sessions").alias("n_sessions"))
    )


# ---------------------------------------------------------------------------
# Stream-stream join: watermarked interval self-join of the event
# stream (probe x trailing quotes), driven with availableNow. The
# oracle is the equivalent batch theta-join — streaming state
# semantics must reproduce the batch answer at completion. Both
# engines compare at microsecond precision.
# ---------------------------------------------------------------------------
@register(
    "streaming_interval_join",
    oracle="""
SELECT p.user_id, p.event_id AS p_event, r.event_id AS q_event
FROM events p JOIN events r
  ON p.user_id = r.user_id
  AND r.event_id <> p.event_id
  AND r.ts::TIMESTAMP >= p.ts::TIMESTAMP - INTERVAL 300 SECONDS
  AND r.ts::TIMESTAMP <= p.ts::TIMESTAMP
""",
)
def streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming interval join (inner): events joined within a bounded time range + watermark."""
    import shutil
    import tempfile
    import uuid

    from bw_new_data_integration_spark.streaming import stream as st

    tune_for_oracle_parity(spark)
    staging = tempfile.mkdtemp(prefix="bw_stream_ssj_")
    shutil.copy(_os.path.join(sf_dir, "events.parquet"), staging)
    probes = st.read_event_stream(spark, staging)
    quotes = st.read_event_stream(spark, staging)
    pairs = st.interval_pair_join(probes, quotes, window_seconds=300).select(
        F.col("p_user").alias("user_id"),
        F.col("p_event").alias("p_event"),
        F.col("q_event").alias("q_event"),
    )
    name = "stream_ssj_" + uuid.uuid4().hex[:8]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        qy = (
            pairs.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        qy.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


# ---------------------------------------------------------------------------
# Stream-stream LEFT-OUTER interval join. Unmatched probes can only be
# emitted once the watermark proves no matching quote can still arrive
# — the same instant their join state is evicted (state_metrics
# exposes the eviction counters; tests/test_sinks_and_sources.py
# asserts rows_removed > 0). A far-future sentinel row (user_id -1,
# filtered from the result) advances both sides' watermarks past every
# real event at end-of-stream, so the streaming answer equals the
# batch LEFT JOIN — without it, probes inside the final watermark lag
# would stay in state forever and the outer rows would never emit.
# ---------------------------------------------------------------------------
@register(
    "streaming_interval_join_outer",
    oracle="""
SELECT p.user_id, p.event_id AS p_event, r.event_id AS q_event
FROM events p LEFT JOIN events r
  ON p.user_id = r.user_id
  AND r.event_id <> p.event_id
  AND r.event_type = 'click'
  AND r.ts::TIMESTAMP >= p.ts::TIMESTAMP - INTERVAL 300 SECONDS
  AND r.ts::TIMESTAMP <= p.ts::TIMESTAMP
""",
)
def streaming_interval_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming interval join, left-outer: unmatched lefts emitted after the watermark closes."""
    import datetime
    import shutil
    import tempfile
    import uuid

    from bw_new_data_integration_spark.streaming import stream as st

    tune_for_oracle_parity(spark)
    staging = tempfile.mkdtemp(prefix="bw_stream_ssjo_")
    shutil.copy(_os.path.join(sf_dir, "events.parquet"), staging)
    max_ts = (
        spark.read.parquet(staging)
        .agg(F.max(F.col("ts").cast("timestamp")).alias("m"))
        .collect()[0]["m"]
    )
    sentinel = spark.createDataFrame(
        [
            (
                -1,
                max_ts + datetime.timedelta(days=1),
                -1,
                "click",  # must pass the quote-side filter so BOTH watermarks advance
                0.0,
                None,
            )
        ],
        st.EVENTS_SCHEMA,
    )
    sentinel.coalesce(1).write.mode("append").parquet(staging)
    probes = st.read_event_stream(spark, staging)
    quotes = st.read_event_stream(spark, staging).filter(F.col("event_type") == "click")
    # NOTE: the sentinel filter must NOT be part of the streaming plan —
    # Catalyst pushes it below the probe-side EventTimeWatermark node,
    # the sentinel then never reaches the watermark tracker, and the
    # trailing real probes stay unflushed in state. Filter the batch
    # result after termination instead.
    pairs = st.interval_pair_join(
        probes, quotes, window_seconds=300, watermark="0 seconds", how="left_outer"
    ).select(
        F.col("p_user").alias("user_id"),
        F.col("p_event").alias("p_event"),
        F.col("q_event").alias("q_event"),
    )
    name = "stream_ssjo_" + uuid.uuid4().hex[:8]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        qy = (
            pairs.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        qy.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    # drop exactly the sentinel row (user_id -1 AND event_id -1),
    # null-safely: an open-ended `user_id >= 0` would also silently
    # drop real probes with NULL or negative ids, which the batch
    # LEFT JOIN oracle retains
    return spark.table(name).filter(
        ~(F.col("user_id").eqNullSafe(F.lit(-1)) & F.col("p_event").eqNullSafe(F.lit(-1)))
    )


# ---------------------------------------------------------------------------
# Deterministic rate-limited source: the rate-micro-batch format emits
# exactly rowsPerBatch consecutive integers per micro-batch from a
# pinned start timestamp — the replayable flavor of Spark's rate
# source (the wall-clock `rate` format paces soak tests; this one is
# hash-checkable). One triggered batch = values 0..999, so the oracle
# is a DuckDB generate_series.
# ---------------------------------------------------------------------------
@register(
    "streaming_rate_source",
    oracle="""
SELECT CAST(x % 10 AS BIGINT) AS bucket,
       COUNT(*) AS n,
       CAST(SUM(x) AS BIGINT) AS sum_value
FROM generate_series(0, 999) t(x)
GROUP BY 1
""",
)
def streaming_rate_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-source streaming smoke: deterministic generated rows through a windowed aggregate."""
    import tempfile
    import uuid

    from bw_new_data_integration_spark.streaming import stream as st

    tune_for_oracle_parity(spark)
    src = st.read_rate_stream(spark, rows_per_batch=1000)
    agg = src.groupBy((F.col("value") % 10).cast("bigint").alias("bucket")).agg(
        F.count("*").alias("n"),
        F.sum("value").cast("bigint").alias("sum_value"),
    )
    name = "stream_rate_" + uuid.uuid4().hex[:8]
    qy = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="bw_rate_ckpt_"))
        .trigger(once=True)
        .start()
    )
    qy.awaitTermination()
    return spark.table(name)


# ---------------------------------------------------------------------------
# Streaming dedup: a doubled event stream (two copies of the source)
# deduplicated on event_id with watermark-bounded state — exactly-once
# ingest semantics for at-least-once sources. Oracle: the unique
# events per type.
# ---------------------------------------------------------------------------
def _streaming_dedup_plan(spark: SparkSession, sf_dir: str, bounded: bool) -> DataFrame:
    import shutil
    import tempfile
    import uuid

    from bw_new_data_integration_spark.streaming import stream as st

    tune_for_oracle_parity(spark)
    staging = tempfile.mkdtemp(prefix="bw_stream_dup_")
    # two copies of the file = an at-least-once source delivering
    # every event twice
    shutil.copy(_os.path.join(sf_dir, "events.parquet"), _os.path.join(staging, "copy1.parquet"))
    shutil.copy(_os.path.join(sf_dir, "events.parquet"), _os.path.join(staging, "copy2.parquet"))
    # single availableNow batch, deliberately: a multi-batch variant
    # (maxFilesPerTrigger=1) was measured and REJECTED at sf10 — the
    # second batch mass-evicts the entire 10M-key horizon in one state
    # maintenance step (116s vs 26s single-batch; eviction is priced
    # for steady drip, not one cliff). Steady-state boundedness is
    # pinned by the eviction pytest; this gate pins value semantics.
    events = st.read_event_stream(spark, staging)
    if bounded:
        deduped = st.dedup_stream(events, keys=("event_id",), watermark="14 days")
    else:
        deduped = events.withWatermark("ts", "14 days").dropDuplicates(["event_id"])
    name = "stream_dedup_" + uuid.uuid4().hex[:8]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        qy = (
            deduped.select("event_id", "event_type")
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        qy.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name).groupBy("event_type").agg(F.count("*").alias("n"))


@register(
    "streaming_dedup",
    oracle="""
SELECT event_type, COUNT(*) AS n
FROM events GROUP BY event_type
""",
)
def streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup via dropDuplicatesWithinWatermark: per-key
    state is EVICTED once the watermark passes the key's event time +
    delay, so continuous-stream state is O(keys within the 14-day
    horizon), not O(keys ever seen). State boundedness is pytest-pinned
    (tests/test_sinks_and_sources.py::test_streaming_dedup_state_bounded)."""
    return _streaming_dedup_plan(spark, sf_dir, bounded=True)


@register(
    "streaming_dedup_unbounded_baseline",
    oracle="""
SELECT event_type, COUNT(*) AS n
FROM events GROUP BY event_type
""",
)
def streaming_dedup_unbounded_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LABELED BASELINE (keep-forever state): dropDuplicates on event_id
    alone never evicts state — kept only to compare against the
    watermark-bounded plan above; never the production path."""
    return _streaming_dedup_plan(spark, sf_dir, bounded=False)


# ---------------------------------------------------------------------------
# Stream-static enrichment join — the canonical streaming dimension
# lookup: each micro-batch joins the (small, broadcast) static customer
# dimension; no stream-stream state needed. Oracle is the batch
# equivalent of the same join + aggregate.
# ---------------------------------------------------------------------------
@register(
    "streaming_static_enrich",
    oracle="""
SELECT c.c_mktsegment, e.event_type, COUNT(*) AS n
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2
""",
)
def streaming_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join: streaming facts against a broadcast dimension."""
    import shutil
    import tempfile
    import uuid

    from bw_new_data_integration_spark.streaming import stream as st

    tune_for_oracle_parity(spark)
    staging = tempfile.mkdtemp(prefix="bw_stream_enrich_")
    shutil.copy(_os.path.join(sf_dir, "events.parquet"), staging)
    events = st.read_event_stream(spark, staging)
    dim = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    enriched = events.join(
        F.broadcast(dim), events.user_id == dim.c_custkey
    ).groupBy("c_mktsegment", "event_type").agg(F.count("*").alias("n"))
    name = "stream_enrich_" + uuid.uuid4().hex[:8]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        qy = (
            enriched.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        qy.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


# ---------------------------------------------------------------------------
# Streaming heavy hitters (streaming/topk.py): SpaceSaving summaries as
# stream state, bucketed so buckets PARTITION the key space. The gate
# runs with capacity >= any bucket's distinct keys, where SpaceSaving
# provably degrades to exact counting (err stays 0) — so the streaming
# output hash-compares against a plain GROUP BY, pinning the stateful
# plumbing (bucketing, state round-trip, batch fold) value-exactly.
# The eviction path's guarantee is pytest-pinned on an over-capacity
# stream (tests/test_sinks_and_sources.py).
# ---------------------------------------------------------------------------
@register(
    "streaming_heavy_hitters",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS est,
       CAST(CAST(('0x' || substring(md5(event_type), 1, 8)) AS UBIGINT) AS BIGINT) % 4 AS bucket,
       CAST(0 AS BIGINT) AS err
FROM events GROUP BY event_type
""",
)
def streaming_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SpaceSaving top-k: bucketed stateful summaries, exact at gate capacity."""
    import shutil
    import tempfile
    import uuid

    from bw_new_data_integration_spark.streaming import stream as st
    from bw_new_data_integration_spark.streaming.topk import stream_heavy_hitters

    tune_for_oracle_parity(spark)
    staging = tempfile.mkdtemp(prefix="bw_stream_hh_")
    shutil.copy(_os.path.join(sf_dir, "events.parquet"), staging)

    # the oracle's err=0 is only valid while capacity covers every
    # bucket's distinct-key count (exact-counting regime). Verify that
    # precondition explicitly so a fixture-vocabulary change fails with
    # a clear capacity error, not an opaque hash mismatch (ADVICE r7 #4)
    capacity, n_buckets = 16, 4
    vocab = (
        spark.read.parquet(staging)
        .select(
            (
                F.conv(
                    F.substring(F.md5(F.col("event_type").cast("string")), 1, 8), 16, 10
                ).cast("bigint")
                % n_buckets
            ).alias("bucket"),
            "event_type",
        )
        .groupBy("bucket")
        .agg(F.countDistinct("event_type").alias("n_keys"))
        .agg(F.max("n_keys").alias("m"))
        .collect()[0]["m"]
    )
    if vocab is not None and vocab > capacity:
        raise ValueError(
            f"streaming_heavy_hitters gate precondition violated: a bucket has "
            f"{vocab} distinct keys > capacity {capacity}; the err=0 oracle only "
            f"holds in the exact-counting regime — raise capacity or n_buckets"
        )

    events = st.read_event_stream(spark, staging)
    hh = stream_heavy_hitters(events, "event_type", capacity=capacity, n_buckets=n_buckets)
    name = "stream_hh_" + uuid.uuid4().hex[:8]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        q = (
            hh.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    out = spark.table(name)
    return out.select(
        F.col("bucket").cast("bigint").alias("bucket"),
        "err",
        F.explode(F.arrays_zip("terms", "counts")).alias("e"),
    ).select(
        F.col("e.terms").alias("event_type"),
        F.col("e.counts").cast("bigint").alias("est"),
        "bucket",
        F.col("err").cast("bigint").alias("err"),
    )


# ---------------------------------------------------------------------------
# Streaming lakehouse end-to-end (round 9): stream → keyed-table sink →
# per-epoch INCREMENTAL rollup refresh. Each micro-batch upserts into
# the base table (idempotent keyed merge), then maintain_rollup folds
# just that commit's file-pruned change feed into the grouped rollup —
# the continuous form of the reference's re-aggregate-everything sync
# (modules/olap_sync.py). Exactly-once composition: a replayed epoch
# re-upserts identical rows, the new base version carries an EMPTY
# change feed, and the rollup commits nothing. The oracle is the batch
# recompute over all events; decimal-exact sums make the per-epoch
# maintenance bit-equal to it regardless of how the stream was
# batched. The multi_epoch flag proves in-query that the rollup was
# maintained across ≥2 incremental refreshes, not one bootstrap.
# ---------------------------------------------------------------------------
@register(
    "streaming_matview_e2e",
    oracle="""
SELECT event_type,
       CAST(CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DECIMAL(38,6)) AS DOUBLE)
         AS sum_value,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       TRUE AS multi_epoch
FROM events GROUP BY event_type
""",
)
def streaming_matview_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream → keyed table → per-epoch incremental rollup maintenance (exactly-once composition)."""
    import tempfile
    import uuid

    from pyspark.sql import types as T

    from bw_new_data_integration_spark.operators.matview import maintain_rollup
    from bw_new_data_integration_spark.sources.parquet_target import ParquetKeyedTable
    from bw_new_data_integration_spark.streaming import stream as st

    tune_for_oracle_parity(spark)
    ev = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    base_dir = tempfile.mkdtemp(prefix="bw_smv_")
    staging = _os.path.join(base_dir, "src")
    _os.makedirs(staging)
    # three staged files → three sequential micro-batches. ONE
    # partitioned write stages all three (one events scan + one job;
    # the old per-wave coalesce(1) writes were three scans + three
    # jobs of pure fixture cost inside the timed gate). Hash
    # partitioning puts each wave in exactly one task, so each wave
    # dir holds exactly one data file; epoch contents are identical
    # (row order within a staged file is irrelevant: the sink is a
    # keyed upsert and every rollup measure is an order-independent
    # decimal-exact fold).
    (
        ev.withColumn("wave", (F.col("event_id") % 3).cast("int"))
        .repartition("wave")
        .write.partitionBy("wave")
        .parquet(_os.path.join(base_dir, "w"))
    )
    for wave in range(3):
        wdir = _os.path.join(base_dir, "w", f"wave={wave}")
        for f in _os.listdir(wdir):
            if f.endswith(".parquet"):
                _os.rename(
                    _os.path.join(wdir, f),
                    _os.path.join(staging, f"wave{wave}.parquet"),
                )
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
        ]
    )
    # change_feed=True: each epoch's upsert persists its O(batch) change
    # events at commit time, so the per-epoch refresh folds exactly the
    # batch — a snapshot diff would be O(files rewritten), and this
    # stream's event_ids interleave the whole key range, making every
    # epoch rewrite (and diff) the ENTIRE growing base (the r9 4.3x
    # decade; docs/SCALING.md r10)
    # write_mode stays COW deliberately: the epochs are DISJOINT
    # event_id thirds — pure-insert batches that the range-scoped merge
    # already commits with ZERO rewrites (cdf=all_insert, every file
    # linked forward), so this lifecycle is O(batch) under COW by
    # construction. The r11 A/B measured the MoR flip at sf10 as a 25%
    # REGRESSION here (52.2s -> 65.0s: tombstone machinery bought
    # nothing; docs/SCALING.md §R11) — MoR is for interleaved UPDATE
    # churn (k13/k14), not disjoint inserts.
    base = ParquetKeyedTable(
        _os.path.join(base_dir, "base"), ["event_id"], change_feed=True
    )
    roll = ParquetKeyedTable(_os.path.join(base_dir, "roll"), ["event_type"])

    def fold_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.persist()
        try:
            if batch_df.isEmpty():
                return  # availableNow may end on an empty epoch
            base.upsert(batch_df.sparkSession, batch_df)
            maintain_rollup(
                batch_df.sparkSession, base, roll, ["event_type"], {"sum_value": "value"}
            )
        finally:
            batch_df.unpersist()

    reader = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
    events = reader.parquet(staging)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        q = (
            events.writeStream.outputMode("update")
            .foreachBatch(fold_epoch)
            .option("checkpointLocation", _os.path.join(base_dir, "ckpt"))
            .queryName("smv_" + uuid.uuid4().hex[:8])
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    # ≥2 incremental refreshes happened on top of the bootstrap
    multi_epoch = roll.current_version() >= 2
    return roll.read(spark).select(
        "event_type",
        F.col("sum_value").cast("double").alias("sum_value"),
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.lit(multi_epoch).alias("multi_epoch"),
    )


# ---------------------------------------------------------------------------
# Streaming dedup, DRIP shape on RocksDB state (VERDICT r10 task 7):
# the continuous-ingest profile — several micro-batches, each
# redelivering the whole at-least-once event set — running on the
# RocksDB state-store provider (streaming/stream.use_rocksdb_state).
# The r10 A/B (docs/SCALING.md) measured RocksDB 3.1× faster on this
# multi-batch shape and 2.9× slower on the one-shot shape, so the
# providers are split by gate: streaming_dedup keeps the default
# HDFS-backed store for its single availableNow batch; THIS gate pins
# the drip shape to RocksDB, so the driver exercises the provider
# choice every window. Oracle: unique events per type (value
# semantics are provider-independent; the provider choice is about
# state maintenance cost, which the A/B records).
# ---------------------------------------------------------------------------
@register(
    "streaming_dedup_drip",
    oracle="""
SELECT event_type, COUNT(*) AS n
FROM events GROUP BY event_type
""",
)
def streaming_dedup_drip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-batch (drip) streaming dedup on the RocksDB state provider — the continuous-ingest shape RocksDB wins."""
    import shutil
    import tempfile
    import uuid

    from bw_new_data_integration_spark.streaming import stream as st

    tune_for_oracle_parity(spark)
    staging = tempfile.mkdtemp(prefix="bw_stream_drip_")
    # three full redeliveries, dripped one file per micro-batch: batch 1
    # seeds the state, batches 2-3 are pure duplicate storms (either
    # deduped against live state or dropped as late — same output)
    for i in (1, 2, 3):
        shutil.copy(
            _os.path.join(sf_dir, "events.parquet"),
            _os.path.join(staging, f"copy{i}.parquet"),
        )
    prev_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", ""
    )
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    st.use_rocksdb_state(spark)
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try:
        events = st.read_event_stream(spark, staging, max_files_per_trigger=1)
        deduped = st.dedup_stream(events, keys=("event_id",), watermark="14 days")
        name = "stream_drip_" + uuid.uuid4().hex[:8]
        qy = (
            deduped.select("event_id", "event_type")
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", tempfile.mkdtemp(prefix="bw_drip_ckpt_"))
            .trigger(availableNow=True)
            .start()
        )
        qy.awaitTermination()
        ops = (qy.lastProgress or {}).get("stateOperators", [])
        metrics = (ops[0].get("customMetrics", {}) if ops else {})
        assert any("rocksdb" in k.lower() for k in metrics), (
            "drip gate must run on the RocksDB provider"
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        if prev_provider:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev_provider
            )
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    return spark.table(name).groupBy("event_type").agg(F.count("*").alias("n"))
