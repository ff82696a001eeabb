"""Broadcast Bloom-filter membership pre-filter (beyond-reference).

The continuous-ingest "seen before?" primitive at 100 TB: history's
content hashes are folded once into an m-bit Bloom filter, and each new
batch probes it with a narrow, shuffle-free scan that discards the
(typically vast) definitely-new majority. Only the maybe-hits pay the
exact verification join against history. A Bloom filter has no false
negatives by construction, so the downstream exact answer is unchanged
at ANY false-positive rate — m and k tune the maybe-rate (i.e. how much
verification work survives the pre-filter), never correctness.

Plan shape, build side: per row, k bit positions (Kirsch-Mitzenmacher
double hashing over ``xxhash64``) explode to (word, mask) pairs; a
``bit_or`` groupBy with map-side partial aggregation reduces them to at
most m/64 rows, and only that word array crosses the driver (same
driver-roundtrip class as k-means centroids, operators/kmeans.py). The
filter then rides the probe plan as a bound array literal — no join, no
shuffle, whole-stage codegen end to end.

Spark's own ``BloomFilterAggregate`` exists for runtime join filters but
is not exposed in the SQL function registry (verified: UNRESOLVED_ROUTINE
for ``bloom_filter_agg``), hence this expression-level implementation.

The reference has no equivalent (its dedup is pandas
``drop_duplicates``, modules/transformers.py); this is the Spark-first
scale shape for cross-batch / re-crawl dedup.

Sizing honesty at 100 TB: a broadcast filter at 16 bits/item carries
~2 GB per 10^9 history items, so this shape holds to ~10^9–10^10
distinct items (a few GB broadcast, well inside executor memory);
dialing ``bits_per_item`` down trades maybe-rate for size with zero
correctness risk because verification is exact. Beyond that, don't
broadcast a bigger filter — switch shapes: partition history and batch
by hash range and build one small filter per range (the probe becomes a
zip of range-local filters), or use the stored-bucket-index path that
``operators/dedup.incremental_lsh_candidates`` already implements for
the near-dup case.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 1 << i as SIGNED 64-bit words (bit 63 is the sign bit); element_at is
# 1-based, so MASKS[b] serves shift amount b via index b+1.
_MASKS = [(1 << i) if i < 63 else -(1 << 63) for i in range(64)]


def _bit_positions(col: Column, m_bits: int, k: int) -> list[Column]:
    """k bit positions in [0, m_bits) via double hashing: h1 + i*h2
    (mod m). Both hashes are reduced mod m BEFORE the combine —
    identical positions by modular arithmetic, and the sum stays far
    below 2^63 so ANSI mode (Spark 4 default) never sees an overflow."""
    m = F.lit(m_bits)
    h1 = F.pmod(F.xxhash64(col), m)
    h2 = F.pmod(F.xxhash64(col, F.lit(-7046029254386353131)), m)
    return [F.pmod(h1 + F.lit(i) * h2, m) for i in range(k)]


def sized_m_bits(n_items: int, bits_per_item: int = 16, floor: int = 1 << 14) -> int:
    """Power-of-two filter size giving ~``bits_per_item`` bits per
    distinct item (16 bits/item with k=7 → ~0.04% false positives).
    One cheap ``count()`` on the history side is the only input — the
    same sizing discipline as the IVF centroid-count invariant
    (docs/SCALING.md)."""
    m = floor
    while m < n_items * bits_per_item:
        m <<= 1
    return m


def bloom_build(
    df: DataFrame, col: str = "fp", m_bits: int = 1 << 16, k: int = 7
) -> list[int]:
    """Fold ``df[col]`` into an m-bit Bloom filter; returns the m/64
    signed-long words. Distributed build: one map-side-combined
    ``bit_or`` shuffle over at most m/64 keys, then a tiny driver
    collect of the word array."""
    pos = F.array(*_bit_positions(F.col(col), m_bits, k))
    words = (
        df.select(F.explode(pos).alias("p"))
        .selectExpr(
            "cast(p div 64 as int) AS w",
            "shiftleft(1L, cast(p % 64 as int)) AS m",
        )
        .groupBy("w")
        .agg(F.expr("bit_or(m)").alias("mask"))
        .collect()
    )
    arr = [0] * (m_bits // 64)
    for r in words:
        arr[r["w"]] = r["mask"]
    return arr


def bloom_maybe_contains(
    col: Column, words: list[int], m_bits: int, k: int = 7
) -> Column:
    """Boolean probe column: False = definitely not in the built set
    (no false negatives), True = maybe (verify exactly downstream).
    The filter and the 64-entry mask table are bound once as array
    literals; the probe is pure whole-stage-codegen expression work.

    SMALL FILTERS ONLY (m ≲ 2^16): the literal array is written into
    the generated code, so planning/codegen cost grows with m —
    measured ~10s per query at m=2^20. Production probes go through
    :func:`bloom_probe_join`, whose plan size is constant in m."""
    bf, mk = F.lit(words), F.lit(_MASKS)
    pos = F.array(*_bit_positions(col, m_bits, k))
    return F.forall(
        pos,
        lambda p: (
            F.element_at(bf, F.floor(p / 64).cast("int") + 1).bitwiseAND(
                F.element_at(mk, F.pmod(p, F.lit(64)).cast("int") + 1)
            )
            != 0
        ),
    )


def bloom_probe_join(
    batch: DataFrame,
    col: str,
    words: list[int],
    m_bits: int,
    k: int = 7,
) -> DataFrame:
    """Rows of ``batch`` that MAYBE hit the filter — the probe as a
    broadcast join against the SPARSE word table instead of a literal
    array expression.

    Why not :func:`bloom_maybe_contains` at scale: binding the filter
    as an array literal writes all m/64 words into the generated code,
    and plan/codegen cost grows with the FILTER SIZE — measured ~10s
    per query at m=2^20 before a single row is probed. Here the filter
    rides as data: only the NON-ZERO words (≤ set bits ≤ n·k) go into
    a broadcast table, each row explodes to its k (word, bit) probes,
    the broadcast join attaches the word, and a map-side-combined
    per-row conjunction keeps rows with k hits. Plan size is constant;
    probe work is O(batch·k); the only shuffle is the rid-regroup,
    batch-sized after map-side combine (all k probes of a row sit in
    one partition).
    """
    nz = [(w, wd) for w, wd in enumerate(words) if wd != 0]
    spark = batch.sparkSession
    words_df = F.broadcast(spark.createDataFrame(nz or [(0, 0)], "w int, word bigint"))
    # rid is only a regroup key within this plan; it never leaves
    b = batch.withColumn("__rid", F.monotonically_increasing_id()).localCheckpoint(
        eager=True
    )
    pos = F.array(*_bit_positions(F.col(col), m_bits, k))
    hits = (
        b.select("__rid", F.explode(pos).alias("p"))
        .selectExpr(
            "__rid",
            "cast(p div 64 as int) AS w",
            "shiftleft(1L, cast(p % 64 as int)) AS m",
        )
        .join(words_df, "w", "left")
        .groupBy("__rid")
        .agg(
            F.min(
                F.col("word").isNotNull() & (F.col("word").bitwiseAND(F.col("m")) != 0)
            ).alias("__maybe")
        )
        .filter(F.col("__maybe"))
        .select("__rid")
    )
    return b.join(hits, "__rid", "left_semi").drop("__rid")


def bloom_prefilter_dedup(
    history: DataFrame,
    batch: DataFrame,
    col: str = "fp",
    bits_per_item: int = 16,
    k: int = 7,
) -> DataFrame:
    """Rows of ``batch`` whose ``col`` value already exists in
    ``history`` — computed as bloom-probe → exact semi-join on the
    surviving maybe-rows only.

    At 100 TB the verification is sized by the DUPLICATE RATE, not the
    corpus, on BOTH sides: the left side is the maybe-subset (dups +
    ~0.04% false positives), and the history side is probed with the
    maybe-set's fingerprints BROADCAST — a broadcast semi-join that
    scans history once with NO history-wide shuffle (the naive
    ``maybe ⋉ history.distinct()`` would hash-shuffle every historical
    fingerprint just to verify a handful of hits). The surviving
    fingerprints (≤ maybe-set) then confirm the maybe rows. The answer
    is exact regardless of filter sizing. If a batch's maybe-set ever
    outgrows the broadcast threshold (pathological dup storm), drop the
    broadcast hints and AQE falls back to a shuffle join — correctness
    is unaffected."""
    n_hist = history.select(col).count()
    m_bits = sized_m_bits(n_hist, bits_per_item)
    words = bloom_build(history, col, m_bits, k)
    # materialize the (small) maybe-set once: it feeds both the
    # fingerprint probe of history and the final confirm join
    maybe = bloom_probe_join(batch, col, words, m_bits, k).localCheckpoint(eager=True)
    maybe_fps = maybe.select(col).distinct()
    confirmed_fps = (
        history.join(F.broadcast(maybe_fps), col, "left_semi")
        .select(col)
        .distinct()
    )
    return maybe.join(F.broadcast(confirmed_fps), col, "left_semi")
