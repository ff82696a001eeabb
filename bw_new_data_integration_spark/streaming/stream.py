"""Structured Streaming operators — the continuous-mode upgrade path.

The reference needs only scheduled batch (SURVEY.md §2.9), but the
engine exposes the streaming equivalents so the same pipelines can run
continuously: watermarked windowed aggregation (the 14-day repair
horizon becomes the watermark), streaming day-part rollups, and a
foreachBatch keyed-upsert sink that reuses the batch merge operator —
one code path for both modes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bw_new_data_integration_spark.sources.parquet_target import ParquetKeyedTable

# the fixture files store microsecond timestamps without a zone
# (TIMESTAMP_NTZ); normalize to a session-zone timestamp exactly like
# catalog.load does for batch reads (session tz is pinned to UTC, so
# the cast is value-preserving)
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampNTZType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def read_event_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType = EVENTS_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a directory of event files. In
    production this is Kafka/CDC; the file source exercises the same
    plan.

    Both fixture generations are supported, mirroring catalog.load's
    batch path: pass a schema whose ``ts`` is LongType to read the
    nanosecond-int64 generation; the default schema reads the micros
    generation.

    .. warning:: the LongType branch sets
       ``spark.sql.legacy.parquet.nanosAsLong=true`` **session-wide
       and permanently** — the flag is consulted at every micro-batch
       read, long after this function returns, so it cannot be
       save/restored here. After a nanos-generation stream has been
       opened, any OTHER query in the same session that reads a
       TIMESTAMP(NANOS) parquet column will see it as bigint
       nanoseconds instead of erroring. catalog.load sets the same
       flag for the batch path, so engine-managed reads are
       consistent either way; only sessions mixing in raw
       ``spark.read.parquet`` calls over nanos files observe the
       difference."""
    if isinstance(schema["ts"].dataType, T.LongType):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        # sequential micro-batches (one file each): the replay /
        # redelivery shape — a later delivery arrives AFTER the
        # watermark advanced, so watermark-bounded operators downstream
        # actually exercise late-drop and state eviction
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    df = reader.parquet(path)
    if isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif not isinstance(df.schema["ts"].dataType, T.TimestampType):
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def windowed_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "14 days",
    group_cols: Sequence[str] = ("event_type",),
) -> DataFrame:
    """Watermarked tumbling-window aggregate. The watermark equals the
    batch mode's trailing repair horizon: late events inside it update
    their window, older ones are dropped — the exact semantics the
    reference got from re-syncing a 14-day window nightly.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration).alias("w"), *group_cols)
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *group_cols,
            "n",
            "sum_value",
        )
    )


def upsert_sink(
    agg: DataFrame,
    target: ParquetKeyedTable,
    checkpoint_dir: str,
    query_name: str = "upsert_stream",
):
    """foreachBatch keyed-upsert sink: every micro-batch merges into
    the keyed table — the streaming twin of the batch sink, idempotent
    per key so replays converge (exactly-once effect on the table).
    """

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        # the keyed merge runs more than one action over the batch;
        # uncached, EVERY action re-executes the upstream stateful plan
        # (observed: per-batch watermark-drop metrics doubling, i.e.
        # the whole micro-batch computed twice). Standard foreachBatch
        # discipline: pin the batch once, merge, release.
        batch_df.persist()
        try:
            target.upsert(batch_df.sparkSession, batch_df)
        finally:
            batch_df.unpersist()

    return (
        agg.writeStream.outputMode("update")
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
    )


def run_stream_once(spark: SparkSession, source_path: str, target: ParquetKeyedTable, checkpoint_dir: str):
    """Drive one availableNow pass (batch-equivalent execution of the
    streaming plan) — used by tests and by backfill-then-stream
    cutovers."""
    events = read_event_stream(spark, source_path)
    agg = windowed_counts(events)
    q = (
        upsert_sink(agg, target, checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def read_rate_stream(
    spark: SparkSession,
    rows_per_batch: int = 1000,
    n_partitions: int = 8,
    start_timestamp_ms: int = 1_700_000_000_000,
    advance_ms_per_batch: int = 1000,
) -> DataFrame:
    """Deterministic rate-limited source (``rate-micro-batch``): batch
    *b* is exactly rows ``b*rows_per_batch .. (b+1)*rows_per_batch-1``
    with timestamps advancing ``advance_ms_per_batch`` per batch — the
    load-testing / smoke source for streaming pipelines, and (unlike
    the wall-clock ``rate`` format) replayable and hash-checkable.

    The plain ``rate`` format paces on wall time (``rowsPerSecond``)
    and is the right knob for throughput soak tests; this wrapper
    defaults to the deterministic variant so correctness gates can use
    a rate source at all."""
    return (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .option("numPartitions", n_partitions)
        .option("startTimestamp", start_timestamp_ms)
        .option("advanceMillisPerBatch", advance_ms_per_batch)
        .load()
    )


def dedup_stream(
    events: DataFrame,
    keys: Sequence[str] = ("event_id",),
    watermark: str = "14 days",
    event_time_col: str = "ts",
) -> DataFrame:
    """Watermark-bounded streaming exact dedup — exactly-once ingest
    semantics for at-least-once sources (replayed Kafka offsets, CDC
    redelivery, file re-drops).

    Uses ``dropDuplicatesWithinWatermark``: state per key is evicted
    once the watermark passes the key's event time plus the delay, so
    on a continuous stream the state store holds only the keys seen
    within the trailing watermark horizon — O(keys-in-horizon), not
    O(keys-ever-seen). The contract matches the at-least-once threat
    model: a redelivery arrives within the redelivery horizon (here:
    the 14-day repair horizon the reference re-syncs nightly), so any
    duplicate lands while its key is still in state; rows older than
    the watermark are dropped as late data rather than re-emitted,
    which is the same outcome.

    ``dropDuplicates(keys)`` without the event-time column in the key
    set is the unbounded twin: it never evicts, and on a 100 TB stream
    the state store grows with every distinct key ever seen. That plan
    survives only as the labeled ``streaming_dedup_unbounded_baseline``
    gate for comparison.
    """
    return events.withWatermark(event_time_col, watermark).dropDuplicatesWithinWatermark(list(keys))


#: Spark's RocksDB state store (public provider class, Spark 3.2+).
ROCKSDB_STATE_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def use_rocksdb_state(spark: SparkSession) -> SparkSession:
    """Switch streaming state to the RocksDB provider — for CONTINUOUS
    / multi-batch stateful streams (dedup, sessionize), not one-shot
    availableNow batches.

    The default HDFSBackedStateStoreProvider keeps state in executor
    heap maps and pays maintenance in bulk steps: when a watermark
    advance evicts a large horizon at once (the r8/r9 'eviction cliff'
    — a second micro-batch mass-evicting 10M keys measured 116s),
    everything stalls. RocksDB spills to local disk and maintains
    incrementally. Measured at sf10 (10M keys, local[32], r10 A/B in
    docs/SCALING.md): multi-batch dedup 62.0s → 19.8s (3.1×),
    multi-batch sessionize 111.3s → 86.9s (1.28×); but a SINGLE giant
    availableNow batch is 2.9× SLOWER under RocksDB (18.8s → 54.3s, DB
    write amplification with no maintenance to amortize) — so this is
    a deliberate opt-in, not the default. Set BEFORE the query starts;
    the provider is fixed per checkpoint location."""
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_STATE_PROVIDER
    )
    return spark


def state_metrics(query) -> list[dict]:
    """Per-stateful-operator metrics from the query's last progress:
    state rows total/updated/removed and memory used — the numbers an
    operator needs watched at 100 TB (unbounded state growth means a
    missing watermark or an unbounded join condition)."""
    progress = query.lastProgress
    if not progress:
        return []
    ops = progress.get("stateOperators", [])
    return [
        {
            "operator": op.get("operatorName", ""),
            "rows_total": op.get("numRowsTotal", 0),
            "rows_updated": op.get("numRowsUpdated", 0),
            "rows_removed": op.get("numRowsRemoved", 0),
            "memory_bytes": op.get("memoryUsedBytes", 0),
        }
        for op in ops
    ]


def interval_pair_join(
    probes: DataFrame,
    quotes: DataFrame,
    window_seconds: int = 300,
    watermark: str = "14 days",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream inner join: each probe event pairs
    with same-user quote events in its trailing window.

    Both sides carry watermarks and the join condition bounds event
    time on both sides — the requirements for Structured Streaming to
    know when join state can be evicted. State per side is bounded by
    (watermark + window), not the stream length. The batch twin is
    operators/range_join.py's bucketed equi-join; at cutover both
    produce the same pairs.

    ``how="left_outer"`` emits unmatched probes with null quote
    columns once the watermark passes their join window (i.e. once the
    engine can PROVE no matching quote can still arrive) — exactly the
    state-eviction point, observable via :func:`state_metrics`.
    """
    p = (
        probes.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("p_event"),
            F.col("ts").alias("p_ts"),
        )
    )
    q = (
        quotes.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("q_user"),
            F.col("event_id").alias("q_event"),
            F.col("ts").alias("q_ts"),
        )
    )
    return p.join(
        q,
        F.expr(
            f"""
            p_user = q_user AND p_event != q_event
            AND q_ts >= p_ts - INTERVAL {window_seconds} SECONDS
            AND q_ts <= p_ts
            """
        ),
        how,
    )
