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
