"""Eval-set contamination check — n-gram overlap against a benchmark.

A training corpus must not contain the evaluation benchmarks it will be
scored on. The standard check (GPT-3 appendix C / Dolma / FineWeb
decontamination): shingle both corpora into word n-grams and flag every
training document sharing n-grams with any eval document.

Scale shape: the eval pool is benchmark-sized (thousands of docs —
orders of magnitude smaller than the corpus), so its distinct-shingle
set is **broadcast**; the training side streams through one shuffle-free
hash join and a per-doc aggregate. The training corpus is never
collected, never self-joined; cost is one scan of the corpus however
large it is. (If the eval side ever outgrows broadcast, drop the hint
and the same plan becomes a shuffle hash join on the shingle — the
semantics don't change.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bw_new_data_integration_spark.functions import text


def ngram_overlap(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_shared: int = 1,
) -> DataFrame:
    """Flag training docs sharing >= ``min_shared`` distinct word
    ``n``-grams with the eval pool → (doc_id, n_shared_shingles).

    Both sides are shingled identically; eval shingles are distinct-ed
    (the pool is one set — which eval doc matched is irrelevant to the
    contamination decision) and broadcast.

    The training side's per-doc dedup is ``array_distinct`` BEFORE the
    explode — a per-row expression, not a ``distinct()`` — because a
    (doc_id, shingle) distinct would shuffle every shingle of the
    corpus: at 100 TB that one Exchange dwarfs everything else in the
    plan. With it gone, the only shuffle left is the per-doc aggregate
    over the (rare) matched rows.
    """
    t_sh = train.select(
        F.col(id_col),
        F.explode(F.array_distinct(text.word_shingles(F.col(text_col), n))).alias("s"),
    )
    e_sh = (
        eval_df.select(F.explode(text.word_shingles(F.col(text_col), n)).alias("s"))
        .distinct()
    )
    shared = t_sh.join(F.broadcast(e_sh), "s")
    return (
        shared.groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared_shingles"))
        .where(F.col("n_shared_shingles") >= min_shared)
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "text_decontaminated",
) -> DataFrame:
    """The REWRITE companion of :func:`ngram_overlap` (GPT-3 appendix
    C's removal step): every k-token window of a training document
    that also appears in the eval pool is cut — matched windows merge
    into maximal spans, spans are removed, documents reassemble in
    order with original case. Returns one row per training doc:
    (id, out_col, n_tokens_kept, n_tokens_cut).

    Same scale shape as the check: the eval pool's distinct window-hash
    set is benchmark-sized and **broadcast**; the training side streams
    through one shuffle-free hash join, then pays one doc-keyed window
    pass (island merge) and one doc-keyed reassembly aggregate. The
    corpus is never collected or self-joined. Matching is
    case-insensitive (both sides hash lowered windows)."""
    from bw_new_data_integration_spark.functions.text import tokens
    from bw_new_data_integration_spark.operators.dedup import (
        cut_spans_and_rebuild,
        merge_token_spans,
    )

    gram = lambda i: F.md5(F.lower(F.array_join(F.slice("t", i, k), " ")))  # noqa: E731
    base = train.select(F.col(id_col), tokens(F.col(text_col)).alias("t"))
    t_grams = (
        base.where(F.size("t") >= k)
        .select(
            id_col,
            F.posexplode(
                F.transform(F.sequence(F.lit(1), F.size("t") - k + 1), gram)
            ).alias("pos0", "h"),
        )
        .select(id_col, (F.col("pos0") + 1).alias("s"), "h")
    )
    e_base = eval_df.select(tokens(F.col(text_col)).alias("t")).where(F.size("t") >= k)
    e_grams = e_base.select(
        F.explode(
            F.transform(F.sequence(F.lit(1), F.size("t") - k + 1), gram)
        ).alias("h")
    ).distinct()
    matched = t_grams.join(F.broadcast(e_grams), "h").select(
        id_col, "s", (F.col("s") + (k - 1)).alias("e")
    )
    cut = merge_token_spans(matched, id_col)
    return cut_spans_and_rebuild(base, cut, train, id_col, out_col)
