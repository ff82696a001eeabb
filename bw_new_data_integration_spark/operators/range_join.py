"""Bucketed range/interval join — an engine extension.

A naive interval predicate (``r.ts BETWEEN l.ts - w AND l.ts``) is a
theta-join: Spark plans it as a broadcast nested-loop or cartesian
product, which dies at scale. The standard fix is epoch bucketing:
quantize time into ``window``-sized buckets, equi-join on
(key, bucket) with the left side probing its own AND the previous
bucket (any interval of length ≤ w spans at most two buckets), then
apply the exact range filter. The cross product never materializes —
the join is hash-partitioned on (key, bucket) and AQE handles hot
buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def count_preceding_events(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    window_seconds: int = 300,
) -> DataFrame:
    """For every event, the number of OTHER events of the same key in
    the trailing ``window_seconds`` (exclusive of self, inclusive of
    the window edge) — the interval-self-join shape behind rate
    counters, burst detection, and fraud windows.

    Timestamps compare at whole-second resolution (the engine's
    portable time arithmetic, matching the sessionize operator).
    """
    secs = F.col(ts_col).cast("long")
    base = events.select(
        F.col(key_col), F.col(id_col), secs.alias("__s"), (secs / window_seconds).cast("long").alias("__b")
    )
    # left probes its own bucket and the previous one
    probe = base.select(
        key_col,
        F.col(id_col),
        F.col("__s"),
        F.explode(F.array(F.col("__b") - 1, F.col("__b"))).alias("__b"),
    )
    right = base.select(
        F.col(key_col),
        F.col(id_col).alias("__rid"),
        F.col("__s").alias("__rs"),
        F.col("__b"),
    )
    joined = probe.join(right, [key_col, "__b"]).filter(
        (F.col("__rs") >= F.col("__s") - window_seconds)
        & (F.col("__rs") <= F.col("__s"))
        & (F.col("__rid") != F.col(id_col))
    )
    counts = joined.groupBy(key_col, id_col).agg(F.count("*").alias("n_preceding"))
    return (
        events.select(key_col, id_col)
        .join(counts, [key_col, id_col], "left")
        .select(
            key_col,
            id_col,
            F.coalesce(F.col("n_preceding"), F.lit(0)).cast("bigint").alias("n_preceding"),
        )
    )
