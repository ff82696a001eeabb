"""Corpus-level term statistics for training-data curation
(beyond-reference; the standard CCNet-style quality/salience signals).

Two operators, both pure DataFrame plans:

- :func:`tfidf_top_terms` — per-document most-salient terms. Ranking is
  deliberately **integer-lexicographic** (tf desc, df asc, term asc):
  the same order tf·idf induces when term frequencies differ, but free
  of transcendental floats, so results are bit-stable across engines
  and parallelism (the repo's determinism contract).
- :func:`unigram_rarity` — per-document average corpus frequency of
  its tokens (a unigram-LM "surprise" proxy: lower mean frequency =
  rarer vocabulary). All-rational arithmetic: integer sums and one
  double division.

Scale notes (100 TB): both are two-shuffle plans — one groupBy on the
token (vocabulary-sized, zipf-skewed: AQE skew-join handles the head
tokens, or pre-filter stopwords), one groupBy/window on doc_id. No
driver-side loops; the only collect is the 1-row corpus count
(a scalar anchor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bw_new_data_integration_spark.functions.text import tokens


def _doc_terms(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return df.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("term")
    )


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` salient terms per document.

    Output: (id, rank, term, tf, df, tfidf) where ``tf`` is the
    term's in-document count, ``df`` the number of distinct documents
    containing it, and ``tfidf = tf * ln(n_docs / df)`` (reported for
    consumers; the *ranking* uses the integer ordering ``tf desc, df
    asc, term asc`` so it is reproducible bit-for-bit).
    """
    terms = _doc_terms(df, text_col, id_col)
    # materialize tf once: dfreq derives from it, and without lineage
    # truncation Catalyst duplicates the explode+aggregate subtree —
    # the corpus would be tokenized twice (.explain showed two scans)
    tf = (
        terms.groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=True)
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = df.select(id_col).distinct().count()  # scalar anchor
    w = Window.partitionBy(id_col).orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    return (
        tf.join(dfreq, "term")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            id_col,
            F.col("rank").cast("int"),
            "term",
            "tf",
            "df",
            (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))).alias("tfidf"),
        )
    )


def unigram_rarity(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document unigram rarity: (id, n_tokens, sum_freq, mean_freq,
    min_freq) where ``freq`` is each token's total corpus count.
    ``mean_freq = sum_freq / n_tokens`` — documents full of rare
    vocabulary score low (a cheap unigram-LM perplexity stand-in used
    for quality filtering and curriculum bucketing).
    """
    terms = _doc_terms(df, text_col, id_col)
    # terms is deliberately NOT materialized here: it is corpus-sized
    # (one row per token), so recomputing the cheap scan+explode twice
    # beats writing a bigger-than-source intermediate; the vocabulary
    # aggregate it feeds is map-side combined either way
    vocab = terms.groupBy("term").agg(F.count("*").alias("freq"))
    return (
        terms.join(vocab, "term")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("freq").alias("sum_freq"),
            F.min("freq").alias("min_freq"),
        )
        .select(
            id_col,
            "n_tokens",
            "sum_freq",
            (F.col("sum_freq") / (F.col("n_tokens") * F.lit(1.0))).alias("mean_freq"),
            "min_freq",
        )
    )


def inverted_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_terms: int = 30,
    posting_cap: int = 20,
) -> DataFrame:
    """Posting lists for the corpus's ``top_terms`` highest-df terms.

    Output: (term, df, tf_total, postings) where ``df`` is distinct
    documents containing the term, ``tf_total`` its corpus occurrence
    count, and ``postings`` the ``posting_cap`` SMALLEST doc ids as a
    comma-joined string — a bounded posting *sample*, which is the
    scale-honest shape: full posting lists for head (stopword) terms
    are corpus-sized and belong in a sink table keyed by (term, doc),
    not in an aggregate's state.

    Plan: tf per (term, doc) is materialized once and reused by both
    consumers; term stats are a map-side-combined groupBy on the term
    (vocabulary-sized, zipf-skewed — AQE handles the head); postings
    are built ONLY for the surviving ``top_terms`` terms (broadcast
    semi-join first, THEN the per-term window), so the row_number
    window runs over top_terms × df rows instead of the whole corpus —
    ranking before materializing per-group detail is the same
    plan discipline as tfidf_top_terms.
    """
    terms = _doc_terms(df, text_col, id_col)
    tf = (
        terms.groupBy("term", id_col)
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=True)
    )
    stats = tf.groupBy("term").agg(
        F.count("*").cast("bigint").alias("df"),
        F.sum("tf").cast("bigint").alias("tf_total"),
    )
    top = stats.orderBy(F.col("df").desc(), F.col("term").asc()).limit(top_terms)
    w = Window.partitionBy("term").orderBy(F.col(id_col).asc())
    postings = (
        tf.join(F.broadcast(top.select("term")), "term", "left_semi")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= posting_cap)
        .groupBy("term")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.col(id_col))),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings")
        )
    )
    return top.join(postings, "term")


def remove_boilerplate_lines(
    df: DataFrame,
    min_docs: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "text_clean",
) -> DataFrame:
    """CCNet/C4-style line-level boilerplate removal: a line whose
    normalized form (lower+trim) appears in ``min_docs`` or more
    DISTINCT documents is dropped from every document (nav bars,
    cookie banners, copyright footers); surviving lines are reassembled
    in original order. One row per input document is always returned
    (a fully-boilerplate document comes back as the empty string), with
    kept/dropped line counts.

    Scale (100 TB): one explode + one groupBy on the normalized line
    (map-side combine; the line-frequency table is vocabulary-sized),
    then ONE doc-keyed shuffle that both filters and reassembles. The
    boilerplate set is broadcast — by construction each entry occurs in
    ≥ ``min_docs`` documents, so its cardinality is bounded by
    total_lines / min_docs, never corpus-sized. Zero Python UDFs.
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("norm", F.lower(F.trim(F.col("line"))))
    # the line fan-out feeds BOTH the frequency aggregate and the
    # flagged reassembly — pin it (lazy) so the upstream text plan and
    # the explode run once, not twice. Spark Connect: recompute.
    try:
        lines = lines.localCheckpoint(eager=False)
    except Exception:
        pass
    boiler = (
        lines.groupBy("norm")
        .agg(F.countDistinct(id_col).alias("line_df"))
        .where(F.col("line_df") >= F.lit(int(min_docs)))
        .select("norm", F.lit(True).alias("is_boiler"))
    )
    flagged = lines.join(F.broadcast(boiler), "norm", "left").withColumn(
        "is_boiler", F.coalesce(F.col("is_boiler"), F.lit(False))
    )
    kept_struct = F.when(
        ~F.col("is_boiler"), F.struct(F.col("pos"), F.col("line"))
    )
    return flagged.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)), lambda s: s["line"]
            ),
            "\n",
        ).alias(out_col),
        F.sum(F.when(~F.col("is_boiler"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_lines_kept"),
        F.sum(F.when(F.col("is_boiler"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_lines_dropped"),
    )
