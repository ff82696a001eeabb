"""Corpus sampling / packing operators for training-data assembly.

Three ops a 100 TB pretraining pipeline runs after dedup + filtering:

- ``hash_threshold_sample`` — deterministic per-group downsampling to
  target rates WITHOUT a per-group window: keep a row iff
  ``bucket(stable_hash(id)) < rate * BUCKETS``. Fully parallel (pure
  column predicate, no shuffle), reproducible across runs/partitioning,
  and composable (sampling at rate a then b ≡ rate min(a,b) because the
  kept set is a hash prefix). A ``row_number() OVER (PARTITION BY
  group)`` would funnel each group into one task — the exact-count
  version only works when groups are small; rate-based is the scale
  form.

- ``balance_mixture`` — equalize group shares (e.g. per-language) by
  computing per-group counts (one tiny aggregate) and hash-threshold
  sampling each group down to ~the smallest group's size. The rate
  table is group-cardinality-sized and broadcast.

- ``pack_sequences`` — greedy sequence packing: assign documents to
  fixed-token-budget bins (context windows). Global greedy packing is
  inherently sequential, so the distributed form packs WITHIN shards
  (training shards are independent by construction): documents are
  hash-bucketed into shards, and within each shard a running token
  cumsum assigns ``bin = floor(prefix_sum / budget)``. One shuffle on
  the shard key; each shard's window is one task sized by
  corpus/shards, tuned via ``n_shards``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: hash space for threshold sampling (md5 32-bit prefix)
_BUCKETS = 1 << 32


def _hash_bucket(c: Column) -> Column:
    """Stable uniform bucket in [0, 2^32): md5 hex prefix — identical
    in Spark and any SQL engine with md5, unlike xxhash64/rand."""
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("bigint")


def hash_threshold_sample(df: DataFrame, id_col: str, rate: float) -> DataFrame:
    """Keep ~``rate`` of rows, deterministically, with no shuffle."""
    return df.where(_hash_bucket(F.col(id_col)) < int(rate * _BUCKETS))


def balance_mixture(
    df: DataFrame, group_col: str, id_col: str, target_per_group: int | None = None
) -> DataFrame:
    """Downsample every group to ~``target_per_group`` rows (default:
    the smallest group's count) via per-group hash thresholds.

    The corpus is scanned once for the count aggregate; when the target
    is derived from it, the rate table is rebuilt driver-side from the
    already-collected counts (group-cardinality-sized) rather than
    re-evaluating the aggregate inside the join."""
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    if target_per_group is None:
        rows = counts.collect()  # one scan; group-cardinality rows
        target_per_group = min(r["__n"] for r in rows)
        rates = df.sparkSession.createDataFrame(
            [(r[group_col], min(1.0, float(target_per_group) / r["__n"])) for r in rows],
            [group_col, "__rate"],
        )
    else:
        rates = counts.select(
            group_col,
            F.least(
                F.lit(1.0), F.lit(float(target_per_group)) / F.col("__n")
            ).alias("__rate"),
        )
    return (
        df.join(F.broadcast(rates), group_col)
        .where(_hash_bucket(F.col(id_col)) < (F.col("__rate") * _BUCKETS).cast("bigint"))
        .drop("__rate")
    )


def shuffle_shards(df: DataFrame, id_col: str, n_shards: int = 1024) -> DataFrame:
    """Deterministic global shuffle for training-shard writing: the
    md5 hash of the id is simultaneously the permutation key (sorting
    by it is a reproducible pseudo-random order, independent of input
    partitioning/cluster size) and the shard assignment (bucket %
    n_shards). Adds ``shard`` and ``shuffle_key``; the writer
    repartitions by ``shard`` and sorts within partitions by
    ``shuffle_key`` — one shuffle total, no global sort (a global
    orderBy would funnel through a range-partition sampling pass;
    per-shard order + random shard membership is what data loaders
    actually need)."""
    h = _hash_bucket(F.col(id_col))
    return df.withColumn("shard", (h % n_shards).cast("int")).withColumn(
        "shuffle_key", h
    )


def chunk_documents(
    df: DataFrame,
    text_col: str,
    max_tokens: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """Split each document into fixed-token windows with overlap — the
    standard context-window prep between cleaning and packing. Chunk
    ``i`` covers tokens ``[i*stride, i*stride + max_tokens)`` where
    ``stride = max_tokens - overlap``; the last chunk is the first one
    whose window reaches the document's end (so short tails are never
    emitted as a nearly-empty duplicate of the previous chunk).

    Pure built-ins — ``split``/``sequence``/``explode``/``slice``/
    ``array_join`` — so the expansion runs inside whole-stage codegen,
    scales with output size (no shuffle at all: chunking is per-row),
    and never touches Python. Adds ``chunk_id`` (0-based),
    ``chunk_text`` and ``chunk_tokens``; empty and NULL documents yield
    one empty chunk so no row is silently dropped (NULL coalesces to ''
    up front — otherwise ``size(NULL)`` = -1 would leak a negative
    token count)."""
    if overlap >= max_tokens:
        raise ValueError(f"overlap ({overlap}) must be < max_tokens ({max_tokens})")
    stride = max_tokens - overlap
    toks = F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    toks = F.filter(toks, lambda t: t != "")  # '' splits to ['']
    n = F.size(toks)
    n_chunks = F.greatest(
        F.lit(1), F.ceil((n - F.lit(overlap)).cast("double") / F.lit(stride))
    ).cast("int")
    return (
        df.withColumn("__toks", toks)
        .withColumn("chunk_id", F.explode(F.sequence(F.lit(0), n_chunks - 1)))
        .select(
            "*",
            F.slice(
                F.col("__toks"), F.col("chunk_id") * stride + 1, max_tokens
            ).alias("__chunk_toks"),
        )
        .select(
            *[c for c in df.columns],
            F.col("chunk_id").cast("bigint").alias("chunk_id"),
            F.array_join("__chunk_toks", " ").alias("chunk_text"),
            F.size("__chunk_toks").cast("bigint").alias("chunk_tokens"),
        )
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    size_col: str,
    budget: int,
    n_shards: int = 64,
) -> DataFrame:
    """Assign each row a (shard, bin) so every bin's total ``size_col``
    is ~``budget``. Bins are segments of the per-shard running cumsum,
    so a bin's total exceeds the budget only by (part of) its last,
    straddling document; an oversized document overflows the bin it
    lands in and later documents may share that bin. Adds ``shard``
    and ``bin`` columns.

    Shards are true hash buckets (``_hash_bucket`` = md5 prefix), so
    any id type works — a numeric modulo would null out string ids and
    silently collapse the packing window into one task."""
    shard = (_hash_bucket(F.col(id_col)) % n_shards).cast("int")
    w = Window.partitionBy("shard").orderBy(F.col(id_col))
    return (
        df.withColumn("shard", shard)
        .withColumn("__csum", F.sum(F.col(size_col)).over(w))
        .withColumn(
            "bin",
            F.floor((F.col("__csum") - F.lit(1)) / F.lit(budget)).cast("bigint"),
        )
        .drop("__csum")
    )


# ---------------------------------------------------------------------------
# Salted percent-bucket sampling (round 5): the SALTED members of the
# hash-sampling family. ``hash_threshold_sample`` above draws one
# canonical hash prefix (composable: rate a then b ≡ min(a,b));
# sometimes a pipeline needs the opposite — INDEPENDENT repeated draws
# from the same key space (bootstrap resamples, disjoint eval probes).
# A salt re-keys the hash so draws with different salts overlap only by
# chance (~fraction² — pinned by tests). Buckets are 0..99 so the
# selection boundary is exactly replayable in any engine's SQL.
# ---------------------------------------------------------------------------

#: percent-bucket resolution for the salted family: fractions quantize
#: to 1/100 so Spark and any SQL oracle agree exactly on the boundary
N_PCT_BUCKETS = 100


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Stable bucket 0..99 from a key: first 8 hex chars of
    ``md5(salt ':' key)`` as an int, mod 100. ``conv`` parses hex to a
    decimal string; the bigint cast is exact (8 hex chars < 2^63)."""
    digest = F.md5(F.concat(F.lit(f"{salt}:"), key.cast("string")))
    return F.conv(F.substring(digest, 1, 8), 16, 10).cast("bigint") % N_PCT_BUCKETS


def hash_sample(df: DataFrame, key: Column, fraction: float, salt: str = "") -> DataFrame:
    """Keep a deterministic ``fraction`` of rows (quantized to 1%) —
    a pure scan-side filter: no shuffle, stable under repartitioning,
    independent across salts."""
    pct = int(round(fraction * N_PCT_BUCKETS))
    if not 0 <= pct <= N_PCT_BUCKETS:
        raise ValueError(f"fraction out of range: {fraction}")
    return df.where(hash_bucket(key, salt) < pct)


def hash_split(df: DataFrame, key: Column, eval_fraction: float, salt: str = "") -> DataFrame:
    """Tag every row 'eval' or 'train' — disjoint and exhaustive by
    construction (one bucket expression, two ranges), the
    layout-independent form of ``sampleBy``. Stratification is free:
    the hash is uniform within every stratum of any unrelated column."""
    pct = int(round(eval_fraction * N_PCT_BUCKETS))
    if not 0 <= pct <= N_PCT_BUCKETS:
        raise ValueError(f"eval_fraction out of range: {eval_fraction}")
    return df.withColumn(
        "split",
        F.when(hash_bucket(key, salt) < pct, F.lit("eval")).otherwise(F.lit("train")),
    )


def temperature_thresholds(
    counts: dict, temperature: float = 0.5, weight_quantum: int = 1_000_000
) -> dict:
    """Integer hash thresholds for temperature-scaled mixture sampling.

    Multilingual/multi-source LM training samples source ``i`` with
    probability ``p_i ∝ n_i^τ`` (τ < 1 flattens the mixture toward
    uniform; τ = 1 is natural proportions) — the standard
    low-resource-upsampling rule. This computes, per group, the largest
    integer quotas consistent with those shares without oversampling
    any group (no replication, rates ≤ 1):

    - ``w_i = floor(n_i^τ · quantum)``  (one float op, then all-integer)
    - ``T = min_i floor(n_i · W / w_i)`` with ``W = Σw`` — the largest
      total at which the binding (most-downsampled-by-share) group
      still has enough rows; that group keeps rate ~1.
    - quota ``t_i = floor(w_i · T / W)``; threshold
      ``floor(t_i · 2³² / n_i)`` for the keep-iff-bucket<threshold probe.

    All arithmetic after the single ``n^τ`` is exact Python integers
    (no overflow at any corpus size — counts collect is
    group-cardinality-sized, same driver round-trip class as
    balance_mixture's rate table). At τ = 0.5, ``n^τ`` is IEEE sqrt —
    correctly rounded and therefore bit-identical in Python, Spark and
    DuckDB, which is what lets the mixture_temperature gate replicate
    this computation in pure SQL; other τ are fine operationally but
    pow's last-ulp is not cross-engine guaranteed.
    """
    import math

    weights = {
        g: int(math.floor((math.sqrt(n) if temperature == 0.5 else n**temperature) * weight_quantum))
        for g, n in counts.items()
        if n > 0
    }
    total_w = sum(weights.values())
    cap_total = min(counts[g] * total_w // w for g, w in weights.items())
    return {
        g: (w * cap_total // total_w) * (1 << 32) // counts[g]
        for g, w in weights.items()
    }


def temperature_mixture(
    df: DataFrame, group_col: str, id_col: str, temperature: float = 0.5
) -> DataFrame:
    """Temperature-scaled mixture sampling: keep each group at the
    ``n^τ``-share quota from :func:`temperature_thresholds`, selected
    by deterministic hash threshold (no shuffle in the probe — one
    tiny count aggregate, then a broadcast rate table and a pure
    column predicate, exactly the balance_mixture plan shape)."""
    counts = {
        r[group_col]: r["__n"]
        for r in df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n")).collect()
    }
    thr = temperature_thresholds(counts, temperature)
    rates = df.sparkSession.createDataFrame(
        [(g, t) for g, t in thr.items()], [group_col, "__thr"]
    )
    return (
        df.join(F.broadcast(rates), group_col)
        .where(_hash_bucket(F.col(id_col)) < F.col("__thr"))
        .drop("__thr")
    )


def quality_percentile_filter(
    df: DataFrame,
    score_col: str,
    group_col: str,
    keep_frac: float,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-group quality cutoff: keep the top ``keep_frac`` of rows by
    ``score_col`` WITHIN each ``group_col`` (the per-domain / per-source
    quality-threshold step of web-corpus curation — a global cutoff
    would empty low-scoring domains instead of keeping their best).
    Ties break on ``id_col`` so the kept SET is deterministic across
    engines and parallelism. Quota is ``ceil(keep_frac * group_size)``
    — every non-empty group keeps at least one row.

    Scale: a single group-keyed window pass (rank and count over the
    same partitioning — one shuffle); no driver round-trips, no
    collect. Skewed domains are one partition each — for a genuinely
    degenerate group (one domain = half the corpus) pre-split by a
    salt on the sort prefix or use the approx-quantile variant."""
    w = Window.partitionBy(group_col)
    ranked = df.withColumn(
        "_r", F.row_number().over(w.orderBy(F.col(score_col).desc(), F.col(id_col)))
    ).withColumn("_n", F.count(F.lit(1)).over(w))
    return (
        ranked.where(F.col("_r") <= F.ceil(F.lit(float(keep_frac)) * F.col("_n")))
        .drop("_r", "_n")
    )
