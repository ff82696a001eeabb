"""KMV (k-minimum-values) distinct sketch — a mergeable distinct-count
summary (Bar-Yossef et al. 2002; the theta-sketch family's simplest
member), beyond-reference.

Why another sketch next to HLL++ (a8)? Two properties HLL's opaque
binary registers don't give this repo:

- **Mergeability as a value**: a KMV sketch is just the k smallest
  uniform hashes — an ``array<double>`` column. Sketches union by
  "concat, sort, take k" (pure expressions), so per-partition /
  per-day sketch TABLES can be stored in a keyed target and rolled up
  later without rescanning history — the 100 TB pattern where the
  sketch is a first-class dataset, not a query-local aggregate. Set
  algebra (intersection / Jaccard between groups) falls out of the
  same representation; HLL can only union.
- **Cross-engine determinism**: the hash is md5-derived (52 explicit
  bits → EXACT in a double), so DuckDB reproduces the estimate
  bit-for-bit and the oracle gate compares the estimate VALUE, not
  just an error bound.

Build cost is one shuffle of the distinct (group, hash) pairs — the
same first stage exact COUNT(DISTINCT) pays; the win is downstream
(constant-size mergeable summaries). Estimator: with u_(k) the k-th
smallest of n uniform hashes, E[u_(k)] = k/(n+1), and (k-1)/u_(k) is
the standard unbiased estimate (relative error ~ 1/sqrt(k-2)); a
group with fewer than k distinct values is EXACT (its sketch is the
whole hash set).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_U_SCALE = float(2**52)


def uniform_hash(c: Column) -> Column:
    """Uniform double in [0, 1): the first 13 hex chars (52 bits) of
    md5 — exactly representable in a double, and reproducible in any
    engine with md5 (DuckDB: ``CAST('0x' || substring(md5(x), 1, 13)
    AS BIGINT)``)."""
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 13), 16, 10).cast("double")
        / F.lit(_U_SCALE)
    )


def kmv_build(
    df: DataFrame, group_col: str, value_col: str, k: int = 64
) -> DataFrame:
    """(group, sketch array<double>, n_distinct_capped): the k smallest
    distinct uniform hashes per group, ascending. One distinct + one
    window pass over (group, hash) pairs."""
    u = df.select(
        F.col(group_col), uniform_hash(F.col(value_col)).alias("u")
    ).distinct()
    rn = F.row_number().over(Window.partitionBy(group_col).orderBy("u"))
    return (
        u.withColumn("rn", rn)
        .where(F.col("rn") <= k)
        .groupBy(group_col)
        .agg(F.sort_array(F.collect_list("u")).alias("sketch"))
    )


def kmv_estimate(sketch: Column, k: int = 64) -> Column:
    """Distinct estimate from a sketch array: exact when the sketch
    isn't full (fewer than k distinct values existed), else
    (k-1)/u_(k)."""
    return F.when(
        F.size(sketch) < k, F.size(sketch).cast("double")
    ).otherwise(F.lit(float(k - 1)) / F.element_at(sketch, k))


def kmv_merge(sketches: Column, k: int = 64) -> Column:
    """Union-merge an array of sketches (array<array<double>>) into
    one sketch: distinct hashes, ascending, first k. Pure expressions —
    this is what makes stored per-partition sketches roll up without
    rescanning data."""
    return F.slice(F.array_sort(F.array_distinct(F.flatten(sketches))), 1, k)


def kmv_jaccard(a: Column, b: Column, k: int = 64) -> Column:
    """Jaccard similarity estimate between two sketches: the fraction
    of the merged sketch's entries present in BOTH inputs (the
    standard KMV set-algebra estimator)."""
    merged = kmv_merge(F.array(a, b), k)
    both = F.size(F.array_intersect(F.array_intersect(merged, a), b))
    return both.cast("double") / F.size(merged)


# ---------------------------------------------------------------------------
# SpaceSaving-style heavy-hitters sketch (Metwally et al. 2005 /
# Misra-Gries 1982 family) — the frequency twin of KMV above, and the
# hot-key detector that FEEDS aggregate.salted_aggregate: at 100 TB
# the question "which keys are hot enough to salt" is itself a query,
# and a constant-size mergeable summary answers it from stored
# per-batch sketches without rescanning history.
#
# Representation (one row per group):
#   terms  array<string>   top-k keys, ordered by (count desc, key)
#   counts array<bigint>   their exact in-batch counts (aligned)
#   err    bigint          max true count a key ABSENT from the sketch
#                          can have (the (k+1)-th count of this batch,
#                          plus accumulated merge truncation)
#   n_total bigint         total rows summarized
#
# A single batch build is an exact truncation (counts exact, err =
# the first dropped count). MERGE sums matching keys, charges each
# side's err to keys the other side is missing (the SpaceSaving
# missing-key upper bound), re-truncates to k, and accumulates err —
# preserving the family's guarantee: any key with true count >
# merged err is IN the sketch, and every estimate is within [true,
# true + err]. All arithmetic is deterministic integer column algebra
# (explode + groupBy + window) — no UDAF, no RNG — so a SQL oracle
# replays the whole construction hash-exactly; the probabilistic
# guarantee is then a theorem about the replayed arithmetic, checked
# explicitly by the gate's per-term bound flags.
# ---------------------------------------------------------------------------


def topk_sketch_build(
    df: DataFrame, group_col: str, key_col: str, k: int = 32
) -> DataFrame:
    """(group, terms, counts, err, n_total): exact per-group counts,
    truncated to the top k by (count desc, key asc). One shuffle on
    (group, key) with map-side combine; the window runs on the
    group-keyed count table (vocabulary-sized), not the corpus."""
    counts = df.groupBy(group_col, key_col).agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy(group_col).orderBy(F.col("c").desc(), F.col(key_col))
    ranked = counts.withColumn("rn", F.row_number().over(w))
    return ranked.groupBy(group_col).agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("rn") <= k, F.struct(F.col("rn"), F.col(key_col).alias("t")))
                )
            ),
            lambda s: s["t"],
        ).alias("terms"),
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("rn") <= k, F.struct(F.col("rn"), F.col("c")))
                )
            ),
            lambda s: s["c"],
        ).alias("counts"),
        F.coalesce(
            F.max(F.when(F.col("rn") == k + 1, F.col("c"))), F.lit(0)
        ).cast("bigint").alias("err"),
        F.sum("c").cast("bigint").alias("n_total"),
    )


def topk_sketch_merge(
    sketches: DataFrame, group_col: str | None, k: int = 32
) -> DataFrame:
    """Merge sketch rows (optionally within ``group_col``; None merges
    ALL rows into one corpus sketch whose group is '__all__'). Estimate
    for key t = sum over sketches of (count_i(t) if present else
    err_i) — the SpaceSaving upper-bound merge — then re-truncate to
    k; merged err = sum of input errs plus the first truncated
    estimate. Explode + groupBy over sketch CONTENTS only (k entries
    per sketch row — never corpus-sized), every step deterministic
    column algebra."""
    g = group_col or "__g"
    base = (
        sketches if group_col
        else sketches.withColumn(g, F.lit("__all__"))
    ).select(g, "terms", "counts", "err", "n_total")
    if group_col:
        meta = base.groupBy(g).agg(
            F.sum("err").alias("base_err"), F.sum("n_total").alias("n_total")
        )
        attach = lambda df: df.join(F.broadcast(meta), g)  # noqa: E731
    else:
        # global merge: the group key is a CONSTANT, and an equi-join on
        # a constant folds to BroadcastNestedLoopJoin — use scalar
        # anchors instead (two bigints cross the driver, the same
        # bounded round-trip class as the kmv gate's n_total anchor).
        # Materialize the sketch rows first: the anchor collect would
        # otherwise execute the upstream build (corpus scan + shuffle +
        # window) once for the anchors and AGAIN when the merged frame
        # is consumed (review r7 finding). Sketch rows are k entries
        # per input row — never corpus-sized — so the checkpoint is tiny.
        base = base.localCheckpoint(eager=True)
        m = base.agg(F.sum("err").alias("e"), F.sum("n_total").alias("n")).collect()[0]
        be, nt = int(m["e"] or 0), int(m["n"] or 0)
        attach = lambda df: df.withColumn(  # noqa: E731
            "base_err", F.lit(be).cast("bigint")
        ).withColumn("n_total", F.lit(nt).cast("bigint"))
    # carry each sketch row's err into its exploded entries, so the
    # absent-sketch charge is (base_err - sum of errs where present)
    entries = base.select(
        g, "err", F.explode(F.arrays_zip("terms", "counts")).alias("e")
    ).select(g, "err", F.col("e.terms").alias("t"), F.col("e.counts").alias("c"))
    per_key = entries.groupBy(g, "t").agg(
        F.sum("c").alias("present"), F.sum("err").alias("present_err")
    )
    est = attach(per_key).select(
        g, "t",
        (F.col("present") + F.col("base_err") - F.col("present_err")).alias("est"),
    )
    w = Window.partitionBy(g).orderBy(F.col("est").desc(), F.col("t"))
    ranked = est.withColumn("rn", F.row_number().over(w))
    out = ranked.groupBy(g).agg(
        F.transform(
            F.array_sort(F.collect_list(F.when(F.col("rn") <= k, F.struct("rn", "t")))),
            lambda s: s["t"],
        ).alias("terms"),
        F.transform(
            F.array_sort(F.collect_list(F.when(F.col("rn") <= k, F.struct("rn", "est")))),
            lambda s: s["est"],
        ).alias("counts"),
        F.coalesce(F.max(F.when(F.col("rn") == k + 1, F.col("est"))), F.lit(0)).alias("trunc"),
    )
    return attach(out).select(
        F.col(g).alias(group_col or "group"),
        "terms",
        F.col("counts").cast("array<bigint>").alias("counts"),
        (F.col("base_err") + F.col("trunc")).cast("bigint").alias("err"),
        F.col("n_total").cast("bigint").alias("n_total"),
    )


def hot_keys(sketch_df: DataFrame, min_share: float = 0.05) -> DataFrame:
    """Salting advisor on top of a (merged) heavy-hitters sketch: the
    keys whose estimated frequency share exceeds ``min_share`` — the
    inputs a pipeline feeds to ``aggregate.salted_aggregate`` (or to
    AQE skew hints) WITHOUT scanning the corpus again. Because the
    sketch's estimates are upper bounds (est ∈ [true, true+err]), this
    list can over-report but never misses a genuinely hot key whose
    share exceeds ``min_share + err/n_total``. Pure expressions over
    the sketch row(s)."""
    e = F.explode(F.arrays_zip("terms", "counts")).alias("e")
    cols = [c for c in sketch_df.columns if c not in ("terms", "counts")]
    return (
        sketch_df.select(*cols, e)
        .select(
            *cols,
            F.col("e.terms").alias("key"),
            F.col("e.counts").cast("bigint").alias("est"),
        )
        .withColumn("share_ub", F.col("est").cast("double") / F.col("n_total"))
        .where(F.col("share_ub") >= F.lit(float(min_share)))
        .drop("err")
    )
