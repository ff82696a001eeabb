"""corpus query-family module — split from the monolithic queries.py
(round 6). Registration side effects only; the public registry surface
lives in the package __init__."""

from __future__ import annotations

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


@register(
    "text_quality",
    oracle=rf"""
WITH base AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(trim(text), '\s+'), t -> t != '') AS toks,
         list_filter(string_split_regex(lower(text), '\s+'), t -> t != '') AS ltoks,
         length(regexp_replace(text, '\s', '', 'g')) AS nonspace,
         length(regexp_replace(text, '[\sA-Za-z0-9]', '', 'g')) AS punct
  FROM documents
),
m AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]')) AS BIGINT) AS n_bpe_tokens,
         CASE WHEN nonspace > 0 THEN CAST(punct AS DOUBLE) / CAST(nonspace AS DOUBLE) ELSE 0.0 END AS punct_ratio,
         CASE WHEN len(ltoks) > 0
              THEN CAST(len(list_filter(ltoks, t -> list_contains({_STOPWORD_LIST_SQL}, t))) AS DOUBLE) / CAST(len(ltoks) AS DOUBLE)
              ELSE 0.0 END AS stopword_ratio,
         CASE WHEN len(toks) > 0
              THEN CAST(list_sum(list_transform(toks, t -> CAST(length(t) AS BIGINT))) AS DOUBLE) / CAST(len(toks) AS DOUBLE)
              ELSE 0.0 END AS mean_token_len,
         least(CAST(length(text) AS DOUBLE) / 200.0, 1.0) AS len_ok
  FROM base
)
SELECT doc_id, n_tokens, n_bpe_tokens, punct_ratio, stopword_ratio, mean_token_len,
       len_ok * 0.3 + (1.0 - least(punct_ratio * 4.0, 1.0)) * 0.2
         + least(stopword_ratio * 5.0, 1.0) * 0.3
         + (CASE WHEN mean_token_len >= 3.0 AND mean_token_len <= 12.0 THEN 1.0 ELSE 0.5 END) * 0.2 AS quality
FROM m
""",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text quality scoring: length, punctuation, stopword and token-length features."""
    docs = _t(spark, sf_dir, "documents")
    c = F.col("text")
    return docs.select(
        "doc_id",
        text.token_count(c).alias("n_tokens"),
        text.bpe_ish_token_count(c).alias("n_bpe_tokens"),
        text.punct_ratio(c).alias("punct_ratio"),
        text.stopword_ratio(c).alias("stopword_ratio"),
        text.mean_token_len(c).alias("mean_token_len"),
        text.quality_score(c).alias("quality"),
    )


@register("text_lang_id", oracle=_lang_id_oracle())
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram-heuristic language identification per document."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.col("lang").alias("lang_actual"), text.lang_id(F.col("text")).alias("lang_pred")
    )


# ---------------------------------------------------------------------------
# Document fingerprinting: whole-content hash + minimum 8-char-shingle
# hash (rolling-hash-style locality fingerprint over the same shingle
# stream minhash consumes).
# ---------------------------------------------------------------------------
@register(
    "text_fingerprint",
    oracle=r"""
WITH base AS (
  SELECT doc_id,
         md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS content_fp,
         lower(text) AS s
  FROM documents
),
sh AS (
  SELECT doc_id, content_fp,
         unnest(CASE WHEN length(s) >= 8
                     THEN list_transform(range(1, length(s) - 8 + 2), i -> substr(s, CAST(i AS INT), 8))
                     ELSE [s] END) AS shingle
  FROM base
)
SELECT doc_id, content_fp, min(md5(shingle)) AS shingle_fp
FROM sh GROUP BY doc_id, content_fp
""",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: min hash over 8-char shingles (winnowing-style content signature)."""
    docs = _t(spark, sf_dir, "documents")
    c = F.col("text")
    shingle_min = F.array_min(F.transform(text.char_shingles(c, 8), lambda s: F.md5(s)))
    return docs.select(
        "doc_id",
        text.fingerprint(c).alias("content_fp"),
        shingle_min.alias("shingle_fp"),
    )


@register(
    "tfidf_top_terms",
    oracle=_TOKS_SQL
    + """,
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
ranked AS (
  SELECT t.doc_id, t.term, t.tf, d.df,
         row_number() OVER (PARTITION BY t.doc_id
                            ORDER BY t.tf DESC, d.df ASC, t.term ASC) AS rank
  FROM tf t JOIN dfreq d USING (term)
)
SELECT doc_id, CAST(rank AS INT) AS rank, term, tf, df
FROM ranked WHERE rank <= 3
""",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top terms per document (log-idf, length-normalized tf)."""
    from bw_new_data_integration_spark.operators import corpus

    docs = _t(spark, sf_dir, "documents")
    out = corpus.tfidf_top_terms(docs, k=3)
    # gate compares the integer-deterministic columns; the tf·idf double
    # is for consumers (ln ulp differences between engines would make a
    # float compare flaky without changing the ranking)
    return out.select("doc_id", "rank", "term", "tf", "df")


@register(
    "unigram_rarity_score",
    oracle=_TOKS_SQL
    + """,
vocab AS (SELECT term, COUNT(*) AS freq FROM toks GROUP BY 1)
SELECT doc_id, COUNT(*) AS n_tokens,
       CAST(SUM(freq) AS BIGINT) AS sum_freq,
       CAST(SUM(freq) AS DOUBLE) / (COUNT(*) * 1.0) AS mean_freq,
       MIN(freq) AS min_freq
FROM toks JOIN vocab USING (term)
GROUP BY doc_id
""",
)
def unigram_rarity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram rarity score from corpus frequency table."""
    from bw_new_data_integration_spark.operators import corpus

    docs = _t(spark, sf_dir, "documents")
    return corpus.unigram_rarity(docs)


# ---------------------------------------------------------------------------
# Text repetition: duplicate word-bigram fraction (Gopher-style
# boilerplate/spam signal).
# ---------------------------------------------------------------------------
@register(
    "text_repetition",
    oracle=r"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> t != '') AS w
  FROM documents
),
grams AS (
  SELECT doc_id,
         CASE WHEN len(w) >= 2
              THEN list_transform(range(1, len(w)), i -> array_to_string(w[i:i+1], ' '))
              ELSE [array_to_string(w, ' ')] END AS g
  FROM toks
)
SELECT doc_id,
       CASE WHEN len(g) > 0
            THEN 1.0 - CAST(len(list_distinct(g)) AS DOUBLE) / CAST(len(g) AS DOUBLE)
            ELSE 0.0 END AS rep_ratio
FROM grams
""",
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition scoring: duplicate line/paragraph and top-2-gram concentration per document."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", text.repetition_ratio(F.col("text"), 2).alias("rep_ratio"))


# ---------------------------------------------------------------------------
# Deterministic train/valid/test split — the training-data curation
# primitive. Bucket = md5(doc_id) first 8 hex chars as int mod 100, so
# membership is a pure function of the row key: stable across runs,
# partitioning, and cluster size (rand()-based sampling is none of
# those), and any engine can reproduce the exact same split. 80/10/10.
# ---------------------------------------------------------------------------
@register(
    "sample_deterministic_split",
    oracle="""
WITH b AS (
  SELECT n_chars,
         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT AS BIGINT) % 100 AS bucket
  FROM documents
)
SELECT CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'valid' ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM b GROUP BY 1
""",
)
def sample_deterministic_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash split into train/valid/test with stable fractions."""
    docs = _t(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 100
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "valid").otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


# ---------------------------------------------------------------------------
# PII scrubbing — regex redaction of direct identifiers with counts
# (functions/text.py). PII is synthesized deterministically onto the
# corpus (the fixtures are clean), mirroring the dirty-coercion
# pattern; the oracle replays the seeding and the redaction.
# ---------------------------------------------------------------------------
@register(
    "pii_redaction",
    oracle=rf"""
WITH seeded AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 5 = 0
                      THEN ' contact agent' || CAST(doc_id AS VARCHAR) || '@example.com'
                      ELSE '' END
              || CASE WHEN doc_id % 7 = 0
                      THEN ' call 555-123-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                      ELSE '' END AS t
  FROM documents
)
SELECT CAST(SUM(len(regexp_extract_all(t, '{text.EMAIL_RE}'))) AS BIGINT) AS n_emails,
       CAST(SUM(len(regexp_extract_all(t, '{text.PHONE_RE}'))) AS BIGINT) AS n_phones,
       CAST(SUM(CASE WHEN regexp_matches(t, '{text.EMAIL_RE}')
                       OR regexp_matches(t, '{text.PHONE_RE}') THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_with_pii,
       CAST(SUM(length(regexp_replace(regexp_replace(t, '{text.EMAIL_RE}', '[EMAIL]', 'g'),
                                      '{text.PHONE_RE}', '[PHONE]', 'g'))) AS BIGINT) AS total_redacted_chars
FROM seeded
""",
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: email/phone/SSN patterns masked with typed placeholders."""
    docs = _t(spark, sf_dir, "documents")
    k = F.col("doc_id")
    seeded = F.concat(
        F.col("text"),
        F.when(
            k % 5 == 0,
            F.concat(F.lit(" contact agent"), k.cast("string"), F.lit("@example.com")),
        ).otherwise(""),
        F.when(
            k % 7 == 0,
            F.concat(F.lit(" call 555-123-"), F.lpad((k % 10000).cast("string"), 4, "0")),
        ).otherwise(""),
    )
    d = docs.select("doc_id", seeded.alias("t"))
    return d.agg(
        F.sum(text.pii_email_count(F.col("t"))).cast("bigint").alias("n_emails"),
        F.sum(text.pii_phone_count(F.col("t"))).cast("bigint").alias("n_phones"),
        F.sum(
            F.when(
                (text.pii_email_count(F.col("t")) > 0)
                | (text.pii_phone_count(F.col("t")) > 0),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_docs_with_pii"),
        F.sum(F.length(text.redact_pii(F.col("t")))).cast("bigint").alias("total_redacted_chars"),
    )


# ---------------------------------------------------------------------------
# Mixture balancing — equalize per-language corpus shares via per-group
# hash-threshold sampling (operators/sampling.py): no per-group window
# (which would funnel each language into one task at 100 TB), just a
# broadcast rate table and a pure column predicate. Deterministic and
# reproducible across runs and partitioning.
# ---------------------------------------------------------------------------
@register(
    "mixture_balance",
    oracle="""
WITH counts AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1),
tgt AS (SELECT MIN(n) AS t FROM counts),
rates AS (
  SELECT lang, least(1.0, CAST((SELECT t FROM tgt) AS DOUBLE) / n) AS rate FROM counts
),
kept AS (
  SELECT d.lang, d.n_chars
  FROM documents d JOIN rates r ON d.lang = r.lang
  WHERE CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::UBIGINT AS BIGINT)
      < CAST(trunc(r.rate * 4294967296) AS BIGINT)
)
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM kept GROUP BY 1
""",
)
def mixture_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture balancing: per-source sampling rates to hit target corpus proportions."""
    from bw_new_data_integration_spark.operators import sampling

    docs = _t(spark, sf_dir, "documents")
    balanced = sampling.balance_mixture(docs, "lang", "doc_id")
    return balanced.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


# ---------------------------------------------------------------------------
# Sequence packing — documents assigned to fixed-token-budget bins
# (context windows) per hash shard (operators/sampling.py): global
# greedy packing is sequential, so packing runs within shards —
# training shards are independent by construction — one shuffle on the
# shard key, shard size tuned by n_shards.
# ---------------------------------------------------------------------------
@register(
    "pack_sequences",
    oracle="""
WITH h AS (
  SELECT doc_id, n_chars,
         CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT AS BIGINT) % 16 AS INT) AS shard
  FROM documents
),
t AS (
  SELECT doc_id, n_chars, shard,
         SUM(n_chars) OVER (PARTITION BY shard ORDER BY doc_id) AS csum
  FROM h
)
SELECT shard, CAST(floor((csum - 1) / 2048.0) AS BIGINT) AS bin,
       COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS bin_chars
FROM t GROUP BY 1, 2
""",
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: greedy first-fit of chunks into fixed-size training sequences."""
    from bw_new_data_integration_spark.operators import sampling

    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    packed = sampling.pack_sequences(docs, "doc_id", "n_chars", budget=2048, n_shards=16)
    return packed.groupBy("shard", "bin").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("bin_chars"),
    )


# ---------------------------------------------------------------------------
# Flagship training-data composite: the whole curation funnel as ONE
# Catalyst plan — quality gate -> language filter -> exact dedup ->
# token-budget sequence packing -> per-(shard, bin) manifest. Each
# stage is the already-gated operator (text.quality_score,
# functions/text.fingerprint, sampling.pack_sequences); the value here
# is that the composition stays a single lazy plan: the quality and
# language predicates reach the scan, dedup is one fingerprint
# shuffle, packing one shard shuffle — no materialization between
# stages. The oracle replays the entire funnel in SQL.
# ---------------------------------------------------------------------------
@register(
    "training_corpus_e2e",
    oracle=rf"""
WITH base AS (
  SELECT doc_id, lang, n_chars, text,
         list_filter(string_split_regex(trim(text), '\s+'), t -> t != '') AS toks,
         list_filter(string_split_regex(lower(text), '\s+'), t -> t != '') AS ltoks,
         length(regexp_replace(text, '\s', '', 'g')) AS nonspace,
         length(regexp_replace(text, '[\sA-Za-z0-9]', '', 'g')) AS punct
  FROM documents
),
m AS (
  SELECT doc_id, lang, n_chars, text,
         least(CAST(length(text) AS DOUBLE) / 200.0, 1.0) * 0.3
         + (1.0 - least((CASE WHEN nonspace > 0 THEN CAST(punct AS DOUBLE) / CAST(nonspace AS DOUBLE) ELSE 0.0 END) * 4.0, 1.0)) * 0.2
         + least((CASE WHEN len(ltoks) > 0
                  THEN CAST(len(list_filter(ltoks, t -> list_contains({_STOPWORD_LIST_SQL}, t))) AS DOUBLE) / CAST(len(ltoks) AS DOUBLE)
                  ELSE 0.0 END) * 5.0, 1.0) * 0.3
         + (CASE WHEN (CASE WHEN len(toks) > 0
                       THEN CAST(list_sum(list_transform(toks, t -> CAST(length(t) AS BIGINT))) AS DOUBLE) / CAST(len(toks) AS DOUBLE)
                       ELSE 0.0 END) BETWEEN 3.0 AND 12.0 THEN 1.0 ELSE 0.5 END) * 0.2
         AS quality
  FROM base
),
filt AS (
  SELECT doc_id, n_chars,
         md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
  FROM m WHERE quality >= 0.65 AND lang = 'en'
),
kept AS (
  SELECT doc_id, n_chars FROM (
    SELECT doc_id, n_chars,
           row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
    FROM filt
  ) WHERE rn = 1
),
h AS (
  SELECT doc_id, n_chars,
         CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT AS BIGINT) % 16 AS INT) AS shard
  FROM kept
),
t AS (
  SELECT doc_id, n_chars, shard,
         SUM(n_chars) OVER (PARTITION BY shard ORDER BY doc_id) AS csum
  FROM h
)
SELECT shard, CAST(floor((csum - 1) / 2048.0) AS BIGINT) AS bin,
       COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS bin_chars
FROM t GROUP BY 1, 2
""",
)
def training_corpus_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-corpus build: quality filter, dedup, chunk, pack, split."""
    from bw_new_data_integration_spark.operators import sampling

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang", "n_chars")
    c = F.col("text")
    filt = docs.filter((text.quality_score(c) >= 0.65) & (F.col("lang") == "en"))
    w = Window.partitionBy(text.fingerprint(c)).orderBy("doc_id")
    kept = (
        filt.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "n_chars")
    )
    packed = sampling.pack_sequences(kept, "doc_id", "n_chars", budget=2048, n_shards=16)
    return packed.groupBy("shard", "bin").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("bin_chars"),
    )


# ---------------------------------------------------------------------------
# EXTENDED curation funnel (VERDICT r6 #3): the round-6 operators
# composed the way a production pipeline runs them —
#
#   encoding repair → boilerplate line removal → per-source quality
#   percentile filter → exact substring cut → decontamination rewrite
#   → temperature mixture → sequence packing
#
# — with PER-STAGE counts in the output, every count replayed by the
# oracle (each stage's SQL is the already-hash-verified per-operator
# oracle, re-staged on the funnel's intermediate text). Fixture: each
# doc is wrapped in boilerplate (NAV header per source, constant
# COPYRIGHT footer), every 5th doc gains a duplicated newsletter tail
# (substring-cut prey), the body carries accented/cp1252 text and
# every 3rd doc is corrupted through the real encoding fault; eval
# contamination is a 16-token slice of every 25th ORIGINAL document.
#
# The TRAINED quality classifier is deliberately NOT in this
# hash-gated funnel: its training is iterative (not SQL-expressible) —
# the rule-based per-source percentile filter stands in here, and the
# classifier keeps its own invariant gate (quality_classifier_e2e),
# the same split kmeans_embeddings/semdedup_prune use.
#
# The original training_corpus_e2e above stays UNCHANGED: it is a
# frozen COMMON_CORE bench entry, and replacing its semantics would
# silently break the cross-round comparison basis.
# ---------------------------------------------------------------------------
@register(
    "training_corpus_e2e_extended",
    oracle=r"""
WITH th AS (
  SELECT CAST(CEIL(0.05 * COUNT(*)) AS BIGINT) AS min_docs,
         CAST(COUNT(*) AS BIGINT) AS n_input
  FROM documents
),
raw AS (
  SELECT doc_id, source, lang,
         'NAV ' || source || ' MENU' || chr(10) ||
         'Café São “don’t” — ' || text ||
         CASE WHEN doc_id % 5 = 0
              THEN ' subscribe to our newsletter for weekly updates and exclusive offers today friend'
              ELSE '' END || chr(10) ||
         'COPYRIGHT 2024 EXAMPLE' AS fixed
  FROM documents
),
lines AS (
  SELECT doc_id,
         unnest(string_split(fixed, chr(10))) AS line,
         unnest(range(1, len(string_split(fixed, chr(10))) + 1)) AS pos
  FROM raw
),
normed AS (SELECT doc_id, pos, line, lower(trim(line)) AS norm FROM lines),
freq AS (SELECT norm, COUNT(DISTINCT doc_id) AS line_df FROM normed GROUP BY norm),
flags AS (
  SELECT n.doc_id, n.pos, n.line,
         (f.line_df >= (SELECT min_docs FROM th)) AS is_boiler
  FROM normed n JOIN freq f USING (norm)
),
cleaned AS (
  SELECT doc_id,
         COALESCE(string_agg(line, chr(10) ORDER BY pos) FILTER (WHERE NOT is_boiler), '') AS text_clean
  FROM flags GROUP BY doc_id
),
cl AS (
  SELECT r.doc_id, r.source, r.lang, c.text_clean
  FROM raw r JOIN cleaned c USING (doc_id)
),
qr AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY length(text_clean) DESC, doc_id) AS qrank,
         COUNT(*) OVER (PARTITION BY source) AS qn
  FROM cl
),
kept AS (
  SELECT doc_id, source, lang, text_clean FROM qr WHERE qrank <= CEIL(0.7 * qn)
),
toks_arr AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text_clean), '\s+'), x -> x != '') AS t
  FROM kept
),
grams AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS s,
         md5(lower(array_to_string(t[u.i:u.i+7], ' '))) AS h
  FROM toks_arr, UNNEST(range(1, len(t) - 8 + 2)) AS u(i)
  WHERE len(t) >= 8
),
rankg AS (
  SELECT doc_id, s, ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, s) AS rn
  FROM grams
),
redundant AS (SELECT doc_id, s, s + 7 AS e FROM rankg WHERE rn > 1),
ordered AS (
  SELECT doc_id, s, e,
         MAX(e) OVER (PARTITION BY doc_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
  FROM redundant
),
islands AS (
  SELECT doc_id, s, e,
         SUM(CASE WHEN prev_max IS NULL OR s > prev_max + 1 THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY s, e) AS isl
  FROM ordered
),
cut AS (SELECT doc_id, isl, MIN(s) AS cs, MAX(e) AS ce FROM islands GROUP BY 1, 2),
toks AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS pos, t[u.i] AS tok
  FROM toks_arr, UNNEST(range(1, len(t) + 1)) AS u(i)
),
flag2 AS (
  SELECT tk.doc_id, tk.pos, tk.tok, (c.cs IS NOT NULL) AS is_cut
  FROM toks tk LEFT JOIN cut c
    ON tk.doc_id = c.doc_id AND tk.pos BETWEEN c.cs AND c.ce
),
rebuilt AS (
  SELECT doc_id,
         COALESCE(string_agg(tok, ' ' ORDER BY pos) FILTER (WHERE NOT is_cut), '') AS text_dedup,
         COUNT(*) FILTER (WHERE is_cut) AS sub_cut
  FROM flag2 GROUP BY doc_id
),
dedup AS (
  SELECT k.doc_id, k.lang,
         COALESCE(r.text_dedup, '') AS text_dedup,
         CAST(COALESCE(r.sub_cut, 0) AS BIGINT) AS sub_cut
  FROM kept k LEFT JOIN rebuilt r USING (doc_id)
),
orig_toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\s+'), x -> x != '') AS t
  FROM documents
),
eval_toks AS (
  SELECT t[3:18] AS t FROM orig_toks WHERE doc_id % 25 = 0 AND len(t) >= 18
),
e_grams AS (
  SELECT DISTINCT md5(lower(array_to_string(t[u.i:u.i+7], ' '))) AS h
  FROM eval_toks, UNNEST(range(1, len(t) - 8 + 2)) AS u(i)
),
d_toks_arr AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text_dedup), '\s+'), x -> x != '') AS t
  FROM dedup
),
d_grams AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS s,
         md5(lower(array_to_string(t[u.i:u.i+7], ' '))) AS h
  FROM d_toks_arr, UNNEST(range(1, len(t) - 8 + 2)) AS u(i)
  WHERE len(t) >= 8
),
matched AS (SELECT doc_id, s, s + 7 AS e FROM d_grams JOIN e_grams USING (h)),
ordered2 AS (
  SELECT doc_id, s, e,
         MAX(e) OVER (PARTITION BY doc_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
  FROM matched
),
islands2 AS (
  SELECT doc_id, s, e,
         SUM(CASE WHEN prev_max IS NULL OR s > prev_max + 1 THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY s, e) AS isl
  FROM ordered2
),
cut2 AS (SELECT doc_id, isl, MIN(s) AS cs, MAX(e) AS ce FROM islands2 GROUP BY 1, 2),
d_toks AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS pos, t[u.i] AS tok
  FROM d_toks_arr, UNNEST(range(1, len(t) + 1)) AS u(i)
),
flag3 AS (
  SELECT tk.doc_id, tk.pos, (c.cs IS NOT NULL) AS is_cut
  FROM d_toks tk LEFT JOIN cut2 c
    ON tk.doc_id = c.doc_id AND tk.pos BETWEEN c.cs AND c.ce
),
rebuilt2 AS (
  SELECT doc_id,
         COUNT(*) FILTER (WHERE NOT is_cut) AS n_tok_final,
         COUNT(*) FILTER (WHERE is_cut) AS dec_cut
  FROM flag3 GROUP BY doc_id
),
fin AS (
  SELECT d.doc_id, d.lang, d.sub_cut,
         CAST(COALESCE(r.n_tok_final, 0) AS BIGINT) AS n_tok_final,
         CAST(COALESCE(r.dec_cut, 0) AS BIGINT) AS dec_cut
  FROM dedup d LEFT JOIN rebuilt2 r USING (doc_id)
),
mc AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM fin GROUP BY lang),
mw AS (SELECT lang, n, CAST(FLOOR(SQRT(CAST(n AS DOUBLE)) * 1000000) AS BIGINT) AS wt FROM mc),
mtot AS (SELECT CAST(SUM(wt) AS BIGINT) AS W FROM mw),
mcap AS (SELECT MIN(n * W // wt) AS T FROM mw, mtot),
mthr AS (SELECT lang, ((wt * T // W) * 4294967296) // n AS thr FROM mw, mtot, mcap),
mixed AS (
  SELECT f.* FROM fin f JOIN mthr USING (lang)
  WHERE CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) AS BIGINT) < thr
),
p_h AS (
  SELECT doc_id, n_tok_final,
         CAST(CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) AS BIGINT) % 16 AS INT) AS shard
  FROM mixed
),
p_b AS (
  SELECT shard,
         CAST(floor((SUM(n_tok_final) OVER (PARTITION BY shard ORDER BY doc_id) - 1) / 2048.0) AS BIGINT) AS bin
  FROM p_h
)
SELECT '01_input' AS stage, (SELECT n_input FROM th) AS n_docs,
       (SELECT CAST(COUNT(*) FILTER (WHERE doc_id % 3 = 0) AS BIGINT) FROM documents) AS n_units
UNION ALL SELECT '02_repaired', (SELECT n_input FROM th),
       (SELECT CAST(SUM(length(fixed)) AS BIGINT) FROM raw)
UNION ALL SELECT '03_boilerplate', (SELECT n_input FROM th),
       (SELECT CAST(SUM(length(text_clean)) AS BIGINT) FROM cleaned)
UNION ALL SELECT '04_quality_kept', (SELECT CAST(COUNT(*) AS BIGINT) FROM kept),
       (SELECT CAST(SUM(length(text_clean)) AS BIGINT) FROM kept)
UNION ALL SELECT '05_substring_cut', (SELECT CAST(COUNT(*) AS BIGINT) FROM dedup),
       (SELECT CAST(COALESCE(SUM(sub_cut), 0) AS BIGINT) FROM dedup)
UNION ALL SELECT '06_decontaminated', (SELECT CAST(COUNT(*) AS BIGINT) FROM fin),
       (SELECT CAST(COALESCE(SUM(dec_cut), 0) AS BIGINT) FROM fin)
UNION ALL SELECT '07_mixture', (SELECT CAST(COUNT(*) AS BIGINT) FROM mixed),
       (SELECT CAST(COALESCE(SUM(n_tok_final), 0) AS BIGINT) FROM mixed)
UNION ALL SELECT '08_packed',
       (SELECT CAST(COUNT(*) AS BIGINT) FROM (SELECT DISTINCT shard, bin FROM p_b)),
       (SELECT CAST(COUNT(*) AS BIGINT) FROM p_b)
""",
)
def training_corpus_e2e_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended curation funnel: repair, boilerplate, quality cut,
    substring dedup, decontamination, mixture, packing — per-stage counts."""
    import math

    from bw_new_data_integration_spark.functions.text import tokens
    from bw_new_data_integration_spark.operators import sampling
    from bw_new_data_integration_spark.operators.contamination import decontaminate
    from bw_new_data_integration_spark.operators.corpus import remove_boilerplate_lines
    from bw_new_data_integration_spark.operators.dedup import cut_duplicate_spans

    d = _t(spark, sf_dir, "documents")
    n_input = d.count()  # scalar anchor, mirrored by the oracle's th CTE

    tail = F.when(
        F.col("doc_id") % 5 == 0,
        F.lit(
            " subscribe to our newsletter for weekly updates and exclusive offers today friend"
        ),
    ).otherwise(F.lit(""))
    raw = F.concat(
        F.lit("NAV "), F.col("source"), F.lit(" MENU\n"),
        F.lit("Café São “don’t” — "), F.col("text"), tail, F.lit("\n"),
        F.lit("COPYRIGHT 2024 EXAMPLE"),
    )
    # real encoding fault on every 3rd doc (same construction the
    # text_mojibake_repair gate hash-verifies)
    corrupt = F.translate(
        F.decode(F.encode(raw, "UTF-8"), "ISO-8859-1"),
        text.CP1252_C1,
        text.CP1252_SPECIALS,
    )
    content = F.when(F.col("doc_id") % 3 == 0, corrupt).otherwise(raw)
    base = d.select("doc_id", "source", "lang", content.alias("content"))

    # stage 2: encoding repair (must reproduce the clean construction).
    # Pinned: the repaired corpus feeds the boilerplate line-frequency
    # aggregate, the flagged reassembly pass AND the 02_repaired stage
    # row — unpinned, the encode/decode/translate repair chain ran 3x.
    fixed = base.select(
        "doc_id", "source", "lang", text.fix_mojibake(F.col("content")).alias("fixed")
    ).localCheckpoint(eager=True)
    # stage 3: corpus-frequent line removal (NAV headers + footer drop)
    min_docs = math.ceil(0.05 * n_input)
    cleaned = (
        remove_boilerplate_lines(fixed, min_docs=min_docs, text_col="fixed")
        .join(base.select("doc_id", "source", "lang"), "doc_id")
        .localCheckpoint(eager=True)
    )
    # stage 4: per-source quality cutoff (rule-based score; the TRAINED
    # classifier is invariant-gated separately — see block comment)
    kept = sampling.quality_percentile_filter(
        cleaned.withColumn("score", F.length("text_clean")), "score", "source", 0.7
    ).localCheckpoint(eager=True)
    # stage 5: exact substring cut among survivors (k=8). Pinned: the
    # cut corpus feeds both the decontamination gram scan and the fin
    # join — unpinned, the gram-index island-merge plan ran twice.
    cut = (
        cut_duplicate_spans(kept, k=8, text_col="text_clean")
        .select("doc_id", "text_dedup", F.col("n_tokens_cut").alias("sub_cut"))
        .localCheckpoint(eager=True)
    )
    # stage 6: decontamination vs eval slices of the ORIGINAL corpus
    toks = tokens(F.col("text"))
    eval_df = d.where((F.col("doc_id") % 25 == 0) & (F.size(toks) >= 18)).select(
        F.array_join(F.slice(toks, 3, 16), " ").alias("text")
    )
    # decontaminate reads text_col on BOTH sides — feed the deduped
    # text under the eval frame's column name
    decon = decontaminate(
        cut.select("doc_id", F.col("text_dedup").alias("text")), eval_df, k=8
    ).select(
        "doc_id",
        F.col("n_tokens_kept").alias("n_tok_final"),
        F.col("n_tokens_cut").alias("dec_cut"),
    )
    fin = (
        cut.join(decon, "doc_id")
        .join(kept.select("doc_id", "lang"), "doc_id")
        .localCheckpoint(eager=True)
    )
    # stage 7: temperature mixture over the survivors' language mix
    mixed = sampling.temperature_mixture(
        fin, "lang", "doc_id", temperature=0.5
    ).localCheckpoint(eager=True)
    # stage 8: token-budget packing per hash shard
    packed = sampling.pack_sequences(
        mixed, "doc_id", "n_tok_final", budget=2048, n_shards=16
    )

    def srow(stage: str, agg: DataFrame) -> DataFrame:
        return agg.select(
            F.lit(stage).alias("stage"),
            F.col("a").cast("bigint").alias("n_docs"),
            F.coalesce(F.col("b"), F.lit(0)).cast("bigint").alias("n_units"),
        )

    return (
        srow("01_input", d.agg(
            F.count("*").alias("a"),
            F.sum(F.when(F.col("doc_id") % 3 == 0, 1).otherwise(0)).alias("b"),
        ))
        .unionByName(srow("02_repaired", fixed.agg(
            F.count("*").alias("a"), F.sum(F.length("fixed")).alias("b"))))
        .unionByName(srow("03_boilerplate", cleaned.agg(
            F.count("*").alias("a"), F.sum(F.length("text_clean")).alias("b"))))
        .unionByName(srow("04_quality_kept", kept.agg(
            F.count("*").alias("a"), F.sum(F.length("text_clean")).alias("b"))))
        .unionByName(srow("05_substring_cut", fin.agg(
            F.count("*").alias("a"), F.sum("sub_cut").alias("b"))))
        .unionByName(srow("06_decontaminated", fin.agg(
            F.count("*").alias("a"), F.sum("dec_cut").alias("b"))))
        .unionByName(srow("07_mixture", mixed.agg(
            F.count("*").alias("a"), F.sum("n_tok_final").alias("b"))))
        .unionByName(srow("08_packed", packed.agg(
            F.countDistinct("shard", "bin").alias("a"), F.count("*").alias("b"))))
    )


# ---------------------------------------------------------------------------
# Deterministic training-shard shuffle — md5(id) is both the
# pseudo-random permutation key and the shard assignment, so the
# shuffled order is identical on any cluster size (the property a
# resumable data loader needs). One hash shuffle; no global sort. The
# gate pins per-shard membership (count, hash-sum checksum) and the
# within-shard order head (min shuffle_key's doc).
# ---------------------------------------------------------------------------
@register(
    "shuffle_shards",
    oracle="""
WITH h AS (
  SELECT doc_id,
         CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT AS BIGINT) AS BIGINT) AS sk
  FROM documents
)
SELECT CAST(sk % 32 AS INT) AS shard,
       COUNT(*) AS n_docs,
       CAST(SUM(sk) AS BIGINT) AS key_checksum,
       CAST(MIN(sk) AS BIGINT) AS min_key,
       CAST(MAX(sk) AS BIGINT) AS max_key
FROM h GROUP BY 1
""",
)
def shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic shard assignment + within-shard shuffle order for training data loading."""
    from bw_new_data_integration_spark.operators import sampling

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    sh = sampling.shuffle_shards(docs, "doc_id", n_shards=32)
    return sh.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("shuffle_key").cast("bigint").alias("key_checksum"),
        F.min("shuffle_key").cast("bigint").alias("min_key"),
        F.max("shuffle_key").cast("bigint").alias("max_key"),
    )


# ---------------------------------------------------------------------------
# Document chunking — fixed-token context windows with overlap (the
# prep step between cleaning and pack_sequences). Row-local explode of
# slice() windows: no shuffle, whole-stage codegen end to end, output
# grows with chunk count only. Chunk grain verified value-exact: the
# oracle recomputes every chunk's text via the same stride arithmetic
# in DuckDB list slicing.
# ---------------------------------------------------------------------------
@register(
    "chunk_documents",
    oracle="""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(coalesce(text, '')), '\\s+'),
                     x -> x <> '') AS toks
  FROM documents
),
c AS (
  SELECT doc_id, toks,
         GREATEST(1, CAST(CEIL((len(toks) - 8) / 24.0) AS BIGINT)) AS n_chunks
  FROM t
),
e AS (
  SELECT doc_id, unnest(generate_series(0, n_chunks - 1)) AS chunk_id, toks
  FROM c
)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       array_to_string(toks[chunk_id*24+1 : chunk_id*24+32], ' ') AS chunk_text,
       CAST(len(toks[chunk_id*24+1 : chunk_id*24+32]) AS BIGINT) AS chunk_tokens
FROM e
""",
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size token-window chunking with overlap; one row per chunk with offsets."""
    from bw_new_data_integration_spark.operators import sampling

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return sampling.chunk_documents(docs, "text", max_tokens=32, overlap=8).select(
        "doc_id", "chunk_id", "chunk_text", "chunk_tokens"
    )


# ---------------------------------------------------------------------------
# Entity resolution — fuzzy match via blocking + edit-distance verify:
# the standard two-phase shape (cheap equi-join block, expensive
# levenshtein only within blocks). The blocking key is the name with its
# last 2 characters dropped: two names within edit distance 2 whose
# edits fall in the suffix share a block, block membership is bounded
# (<=|alphabet|^2 names per block, independent of corpus size), and
# block *cardinality* grows with the data — so the equi-join stays
# balanced at any scale. (A fixed-length prefix is degenerate on
# sequential-ID-style names: every row lands in one block and the join
# goes quadratic.) Blocked ER trades recall for scale by design; the
# oracle defines the same blocked semantics.
# ---------------------------------------------------------------------------
@register(
    "er_fuzzy_match",
    oracle="""
SELECT a.c_nationkey AS nationkey, COUNT(*) AS n_pairs
FROM customer a
JOIN customer b
  ON a.c_nationkey = b.c_nationkey
 AND substring(a.c_name, 1, length(a.c_name) - 2) = substring(b.c_name, 1, length(b.c_name) - 2)
 AND a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 2
GROUP BY 1
""",
)
def er_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution fuzzy match: blocked candidates scored by edit-distance similarity."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    blk = F.expr("substring(c_name, 1, length(c_name) - 2)")
    a = c.select(
        F.col("c_custkey").alias("a_key"),
        F.col("c_name").alias("a_name"),
        F.col("c_nationkey").alias("nationkey"),
        blk.alias("a_blk"),
    )
    b = c.select(
        F.col("c_custkey").alias("b_key"),
        F.col("c_name").alias("b_name"),
        F.col("c_nationkey").alias("b_nat"),
        blk.alias("b_blk"),
    )
    pairs = a.join(
        b,
        (a.nationkey == b.b_nat) & (a.a_blk == b.b_blk) & (a.a_key < b.b_key),
    ).filter(F.levenshtein("a_name", "b_name") <= 2)
    return pairs.groupBy("nationkey").agg(F.count("*").alias("n_pairs"))


# ---------------------------------------------------------------------------
# Salted deterministic fraction sampling (round 5, beyond-reference):
# the parameterized member of the hash-sampling family
# (operators/sampling.py). sample_deterministic_split /
# split_leakage_free fix an 80/10/10 bucket split; hash_sample adds the
# two knobs pipelines actually turn — arbitrary fraction and a SALT, so
# repeated draws from the same corpus are independent (salt 's1' vs
# 's2' select uncorrelated subsets) while each draw stays a pure
# scan-side filter any engine can replay exactly.
# ---------------------------------------------------------------------------
@register(
    "sample_deterministic",
    oracle="""
WITH sampled AS (
  SELECT doc_id, lang
  FROM documents
  WHERE ('0x' || substring(md5('s1:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 25
)
SELECT lang, COUNT(*) AS n, CAST(MIN(doc_id) AS BIGINT) AS min_id,
       CAST(MAX(doc_id) AS BIGINT) AS max_id
FROM sampled GROUP BY lang
""",
)
def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based row sampling (stable across partitioning and engines)."""
    docs = _t(spark, sf_dir, "documents")
    from bw_new_data_integration_spark.operators.sampling import hash_sample

    sampled = hash_sample(docs, key=F.col("doc_id"), fraction=0.25, salt="s1")
    return sampled.groupBy("lang").agg(
        F.count("*").alias("n"),
        F.min("doc_id").cast("bigint").alias("min_id"),
        F.max("doc_id").cast("bigint").alias("max_id"),
    )


# ---------------------------------------------------------------------------
# Inverted index — capped posting lists for the highest-df terms
# (operators/corpus.inverted_index). The oracle mirrors the cap by
# slicing the SORTED doc-id list to the same bound: "row_number over
# doc_id asc <= cap, then sort" (Spark) and "sort, then [1:cap]"
# (DuckDB) select the identical smallest-cap set.
# ---------------------------------------------------------------------------
@register(
    "inverted_index_topdf",
    oracle=_TOKS_SQL
    + """,
tf AS (SELECT term, doc_id, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
stats AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df, CAST(SUM(tf) AS BIGINT) AS tf_total
  FROM tf GROUP BY term
),
top AS (SELECT * FROM stats ORDER BY df DESC, term ASC LIMIT 30),
p AS (
  SELECT term, array_to_string((list_sort(array_agg(doc_id)))[1:20], ',') AS postings
  FROM tf JOIN top USING (term) GROUP BY term
)
SELECT term, df, tf_total, postings FROM top JOIN p USING (term)
""",
)
def inverted_index_topdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index: capped posting lists + df/tf stats for the top-df terms."""
    from bw_new_data_integration_spark.operators import corpus

    docs = _t(spark, sf_dir, "documents")
    return corpus.inverted_index(docs, top_terms=30, posting_cap=20)


# ---------------------------------------------------------------------------
# Temperature-scaled mixture sampling (operators/sampling.
# temperature_mixture): p_i ∝ n_i^0.5 — low-resource upsampled in
# SHARE, never replicated. The whole quota computation is replicated
# in the oracle with the same integer arithmetic; the one float op
# (sqrt at τ=0.5) is IEEE-correctly-rounded in every engine, so the
# thresholds — and therefore the kept SET — are bit-identical.
# ---------------------------------------------------------------------------
@register(
    "mixture_temperature",
    oracle="""
WITH c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY lang),
w AS (SELECT lang, n, CAST(FLOOR(SQRT(CAST(n AS DOUBLE)) * 1000000) AS BIGINT) AS wt FROM c),
tot AS (SELECT CAST(SUM(wt) AS BIGINT) AS W FROM w),
cap AS (SELECT MIN(n * W // wt) AS T FROM w, tot),
thr AS (SELECT lang, n, ((wt * T // W) * 4294967296) // n AS thr FROM w, tot, cap),
kept AS (
  SELECT d.lang, d.n_chars
  FROM documents d JOIN thr USING (lang)
  WHERE CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) AS BIGINT) < thr
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_kept, CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM kept GROUP BY lang
""",
)
def mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled (tau=0.5) mixture sampling with integer-exact per-group quotas."""
    from bw_new_data_integration_spark.operators import sampling

    docs = _t(spark, sf_dir, "documents")
    kept = sampling.temperature_mixture(docs, "lang", "doc_id", temperature=0.5)
    return kept.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_kept"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


# ---------------------------------------------------------------------------
# Boilerplate line removal (CCNet/C4 line-level dedup): lines whose
# normalized form appears in >= 5% of documents are dropped corpus-wide,
# remaining lines reassembled in order. The fixture synthesizes the
# realistic mix on top of the documents table: a footer shared by ALL
# docs (always dropped), a per-source nav header (dropped — each source
# group clears the 5% bar), a semi-rare promo line shared by ~1% of
# docs (kept), and the unique body (kept). The threshold is derived
# from the corpus size on both sides, so the gate is sf-generic.
# ---------------------------------------------------------------------------
@register(
    "boilerplate_line_removal",
    oracle="""
WITH th AS (
  SELECT CAST(CEIL(0.05 * COUNT(*)) AS BIGINT) AS min_docs FROM documents
),
docs AS (
  SELECT doc_id,
         'NAV ' || source || ' MENU' || chr(10) ||
         text || chr(10) ||
         'PROMO CODE ' || CAST(doc_id % 97 AS VARCHAR) || chr(10) ||
         'COPYRIGHT 2024 EXAMPLE' AS content
  FROM documents
),
lines AS (
  SELECT doc_id,
         unnest(string_split(content, chr(10))) AS line,
         unnest(range(1, len(string_split(content, chr(10))) + 1)) AS pos
  FROM docs
),
normed AS (SELECT doc_id, pos, line, lower(trim(line)) AS norm FROM lines),
freq AS (SELECT norm, COUNT(DISTINCT doc_id) AS line_df FROM normed GROUP BY norm),
flags AS (
  SELECT n.doc_id, n.pos, n.line, (f.line_df >= (SELECT min_docs FROM th)) AS is_boiler
  FROM normed n JOIN freq f USING (norm)
)
SELECT doc_id,
       COALESCE(string_agg(line, chr(10) ORDER BY pos) FILTER (WHERE NOT is_boiler), '') AS text_clean,
       CAST(COUNT(*) FILTER (WHERE NOT is_boiler) AS BIGINT) AS n_lines_kept,
       CAST(COUNT(*) FILTER (WHERE is_boiler) AS BIGINT) AS n_lines_dropped
FROM flags
GROUP BY doc_id
""",
)
def boilerplate_line_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level boilerplate removal: corpus-frequent lines dropped, documents reassembled in order."""
    import math

    from bw_new_data_integration_spark.operators.corpus import remove_boilerplate_lines

    d = _t(spark, sf_dir, "documents")
    content = F.concat(
        F.lit("NAV "), F.col("source"), F.lit(" MENU\n"),
        F.col("text"), F.lit("\n"),
        F.lit("PROMO CODE "), (F.col("doc_id") % 97).cast("string"), F.lit("\n"),
        F.lit("COPYRIGHT 2024 EXAMPLE"),
    )
    docs = d.select("doc_id", content.alias("content"))
    min_docs = math.ceil(0.05 * d.count())  # scalar anchor, mirrored in the oracle
    return remove_boilerplate_lines(
        docs, min_docs=min_docs, text_col="content", id_col="doc_id"
    )


# ---------------------------------------------------------------------------
# Mojibake repair: the fixture synthesizes accented clean text from the
# documents table, corrupts every third doc through the REAL encoding
# fault (UTF-8 bytes re-read as cp1252 — done with Spark's own
# encode/decode plus the C1→specials translate that models how web
# stacks render bad bytes, not string replaces), then repairs with
# fix_mojibake. The clean text includes curly quotes and an em-dash so
# the corrupt form contains the real-world 'â€™'-style patterns (which
# are NOT Latin-1-representable — the crash class ADVICE r6 flagged).
# Every doc_id % 3 == 1 row mixes an Ã marker with CJK + emoji: it is
# unrepairable (not cp1252-representable) and must pass through
# untouched WITHOUT the encode throwing. The oracle never touches
# encodings: it states the text the repair must reproduce
# byte-for-byte, so a repair miss, a false-positive "repair", or a
# crash all fail the gate.
# ---------------------------------------------------------------------------
@register(
    "text_mojibake_repair",
    oracle="""
SELECT doc_id,
       CASE WHEN doc_id % 3 = 1 THEN 'Ã 日本 🙂 ' || substr(text, 1, 40)
            ELSE 'Café São “don’t” — ' || substr(text, 1, 40) END AS fixed,
       (doc_id % 3 = 0) AS was_corrupted
FROM documents
""",
)
def text_mojibake_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding repair: UTF-8-as-cp1252 mojibake inverted in-plan; clean
    accents and unrepairable marker-bearing non-Latin text untouched."""
    d = _t(spark, sf_dir, "documents")
    clean = F.concat(F.lit("Café São “don’t” — "), F.substring("text", 1, 40))
    # Real-world corruption: UTF-8 bytes read as cp1252. Latin-1 decode
    # yields C1 controls where cp1252 shows €/™/“…; translate C1→specials
    # produces the exact glyph sequence ('donâ€™t') corpora contain.
    corrupt = F.translate(
        F.decode(F.encode(clean, "UTF-8"), "ISO-8859-1"),
        text.CP1252_C1,
        text.CP1252_SPECIALS,
    )
    unrepairable = F.concat(F.lit("Ã 日本 🙂 "), F.substring("text", 1, 40))
    mixed = (
        F.when(F.col("doc_id") % 3 == 0, corrupt)
        .when(F.col("doc_id") % 3 == 1, unrepairable)
        .otherwise(clean)
    )
    return d.select(
        "doc_id",
        text.fix_mojibake(mixed).alias("fixed"),
        (F.col("doc_id") % 3 == 0).alias("was_corrupted"),
    )


# ---------------------------------------------------------------------------
# Per-source quality cutoff: keep the top 30% of docs per source by
# score (per-domain thresholds — a GLOBAL cutoff would empty weak
# domains instead of keeping their best). Score here is n_chars (its
# construction is already gated by text_quality; this gate pins the
# FILTER semantics: per-group quota, ceil rounding, deterministic
# tie-break on doc_id).
# ---------------------------------------------------------------------------
@register(
    "quality_percentile_filter",
    oracle="""
WITH ranked AS (
  SELECT doc_id, source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS r,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM documents
)
SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars
FROM ranked WHERE r <= CEIL(0.3 * n)
""",
)
def quality_percentile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality cutoff: top 30% by score within each source, exact quotas, stable ties."""
    from bw_new_data_integration_spark.operators.sampling import (
        quality_percentile_filter as qpf,
    )

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").cast("bigint").alias("n_chars")
    )
    return qpf(d, score_col="n_chars", group_col="source", keep_frac=0.3)


# ---------------------------------------------------------------------------
# Quality classifier (fasttext-style hashed linear model) — the
# "wiki-like?" scorer LLM pipelines train on weak labels and sweep over
# the corpus. Training is iterative (not SQL-expressible), so like
# kmeans_embeddings the oracle gates the deterministic invariants:
# scoring is TOTAL (every doc scored exactly once), probabilities lie in
# (0,1), and the model separates a vocabulary-difference concept at
# >= 95% train accuracy. The fixture synthesizes the separable task on
# top of the documents table: per-class vocabularies (8 tokens) plus 12
# shared-filler tokens from the real text, 50/50 classes by doc_id.
# Training itself is bit-deterministic (fixed-point gradient sums,
# rational fast sigmoid — operators/classifier.py), which the
# determinism sweep exercises end to end.
# ---------------------------------------------------------------------------
@register(
    "quality_classifier_e2e",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_scored,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_unique,
       TRUE AS probs_in_range,
       TRUE AS separates
FROM documents
""",
)
def quality_classifier_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed linear quality classifier: fit on weak labels, score the corpus, gate the invariants."""
    from bw_new_data_integration_spark.operators.classifier import (
        fit_linear_text_classifier,
        score_linear_text_classifier,
    )

    d = _t(spark, sf_dir, "documents")
    pos = ["cite", "reference", "article", "encyclopedia", "notable", "verified"]
    neg = ["click", "free", "casino", "winner", "offer", "subscribe"]
    y = (F.col("doc_id") % 2 == 0).cast("int")

    def vocab_text(words):
        arr = F.array(*[F.lit(w) for w in words])
        toks = [
            F.element_at(arr, ((F.col("doc_id") + F.lit(j)) % 6 + 1).cast("int"))
            for j in range(8)
        ]
        return F.concat_ws(" ", *toks)

    body = F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 12))
    fixture = d.select(
        "doc_id",
        y.alias("y"),
        F.concat_ws(
            " ", F.when(y == 1, vocab_text(pos)).otherwise(vocab_text(neg)), body
        ).alias("text2"),
    )
    # featurize ONCE and pin: fit's iterations and the scoring pass both
    # read this checkpoint instead of re-running scan+explode+groupBy
    # (the r13 shape featurized twice — guide §1.2)
    from bw_new_data_integration_spark.operators.classifier import (
        _with_bias_feature,
        featurize_hashed,
    )

    feats_b = _with_bias_feature(
        featurize_hashed(fixture, "text2", "doc_id", 1024), fixture, "doc_id"
    ).localCheckpoint(eager=True)
    model = fit_linear_text_classifier(
        spark, fixture, "y", text_col="text2", dim=1024, iters=5, lr=2.0,
        feats_b=feats_b,
    )
    scored = score_linear_text_classifier(
        spark, fixture, model, text_col="text2", feats_b=feats_b
    )
    # y is a pure function of doc_id (defined above as doc_id % 2 == 0),
    # so re-derive it instead of joining the fixture back in
    joined = scored.withColumn("y", y)
    return joined.agg(
        F.count("*").cast("bigint").alias("n_scored"),
        F.countDistinct("doc_id").cast("bigint").alias("n_unique"),
        ((F.min("prob") > 0.0) & (F.max("prob") < 1.0)).alias("probs_in_range"),
        (
            F.avg(((F.col("prob") > 0.5).cast("int") == F.col("y")).cast("double"))
            >= 0.95
        ).alias("separates"),
    )


# ---------------------------------------------------------------------------
# KMV distinct sketch: mergeable k-minimum-values summaries per source
# plus a corpus-total row produced by MERGING the per-source sketches
# (expression-level union — the stored-sketch rollup pattern). The
# md5-derived 52-bit hash makes the ESTIMATE itself deterministic and
# engine-portable, so the oracle compares values, not just bounds —
# stronger than the HLL gate (a8), where only an error band can be
# checked.
# ---------------------------------------------------------------------------
@register(
    "kmv_distinct_sketch",
    oracle="""
WITH u AS (
  SELECT DISTINCT source,
         CAST(CAST('0x' || substring(md5(text), 1, 13) AS BIGINT) AS DOUBLE)
           / 4503599627370496.0 AS u
  FROM documents
),
ranked AS (
  SELECT source, u, ROW_NUMBER() OVER (PARTITION BY source ORDER BY u) AS rn
  FROM u
),
per_source AS (
  SELECT source,
         COUNT(*) AS sk_size,
         MAX(CASE WHEN rn = 64 THEN u END) AS u_k
  FROM ranked WHERE rn <= 64 GROUP BY source
),
exact AS (SELECT source, COUNT(DISTINCT text) AS n_exact FROM documents GROUP BY source),
-- corpus-total row: merging the per-source sketches = the 64 smallest
-- distinct hashes overall (per-source sketches each keep their local
-- 64 smallest, whose union contains the global 64 smallest)
total_ranked AS (
  SELECT u, ROW_NUMBER() OVER (ORDER BY u) AS rn FROM (SELECT DISTINCT u FROM u)
),
total AS (
  SELECT CAST('__all__' AS VARCHAR) AS source,
         COUNT(*) AS sk_size,
         MAX(CASE WHEN rn = 64 THEN u END) AS u_k
  FROM total_ranked WHERE rn <= 64
),
total_exact AS (SELECT COUNT(DISTINCT text) AS n_exact FROM documents),
unioned AS (
  SELECT p.source, p.sk_size, p.u_k, e.n_exact
  FROM per_source p JOIN exact e USING (source)
  UNION ALL
  SELECT t.source, t.sk_size, t.u_k, x.n_exact FROM total t, total_exact x
)
SELECT source,
       CASE WHEN sk_size < 64 THEN CAST(sk_size AS DOUBLE) ELSE 63.0 / u_k END AS est,
       CAST(n_exact AS BIGINT) AS n_exact,
       (ABS(CASE WHEN sk_size < 64 THEN CAST(sk_size AS DOUBLE) ELSE 63.0 / u_k END
            - n_exact) <= 0.4 * n_exact) AS within_bound
FROM unioned
""",
)
def kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch: deterministic mergeable distinct estimates per source + merged corpus total."""
    from bw_new_data_integration_spark.operators.sketch import (
        kmv_build,
        kmv_estimate,
        kmv_merge,
    )

    d = _t(spark, sf_dir, "documents")
    k = 64
    sk = kmv_build(d, "source", "text", k)
    exact = d.groupBy("source").agg(
        F.countDistinct("text").cast("bigint").alias("n_exact")
    )
    per_source = sk.join(exact, "source").select(
        "source", kmv_estimate(F.col("sketch"), k).alias("est"), "n_exact"
    )
    # corpus-total row: scalar anchor (1 bigint crosses the driver) —
    # a 1x1 crossJoin would plan as BroadcastNestedLoopJoin, which the
    # plan audit rightly rejects
    n_total = d.agg(F.countDistinct("text")).collect()[0][0]
    merged = sk.groupBy().agg(F.collect_list("sketch").alias("all_sk")).select(
        F.lit("__all__").alias("source"),
        kmv_estimate(kmv_merge(F.col("all_sk"), k), k).alias("est"),
        F.lit(int(n_total)).cast("bigint").alias("n_exact"),
    )
    rows = per_source.unionByName(merged)
    return rows.select(
        "source",
        "est",
        "n_exact",
        (F.abs(F.col("est") - F.col("n_exact")) <= 0.4 * F.col("n_exact")).alias(
            "within_bound"
        ),
    )


# ---------------------------------------------------------------------------
# Decontamination REWRITE (GPT-3 appendix C removal step): training
# windows colliding with the eval pool's k-grams are cut and docs
# reassembled — the companion of contamination_check, which only
# flags. Eval fixture: the 16-token slice (positions 3..18) of every
# 25th document, so those training docs verifiably contain eval text;
# the oracle replicates the whole pipeline and compares rebuilt text
# by md5. Eval-side hashes broadcast; the corpus is never collected or
# self-joined.
# ---------------------------------------------------------------------------
@register(
    "decontamination_rewrite",
    oracle=r"""
WITH train_toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\s+'), x -> x != '') AS t
  FROM documents
),
eval_toks AS (
  SELECT t[3:18] AS t FROM train_toks WHERE doc_id % 25 = 0 AND len(t) >= 18
),
e_grams AS (
  SELECT DISTINCT md5(lower(array_to_string(t[u.i:u.i+7], ' '))) AS h
  FROM eval_toks, UNNEST(range(1, len(t) - 8 + 2)) AS u(i)
),
t_grams AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS s,
         md5(lower(array_to_string(t[u.i:u.i+7], ' '))) AS h
  FROM train_toks, UNNEST(range(1, len(t) - 8 + 2)) AS u(i)
  WHERE len(t) >= 8
),
matched AS (SELECT doc_id, s, s + 7 AS e FROM t_grams JOIN e_grams USING (h)),
ordered AS (
  SELECT doc_id, s, e,
         MAX(e) OVER (PARTITION BY doc_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
  FROM matched
),
islands AS (
  SELECT doc_id, s, e,
         SUM(CASE WHEN prev_max IS NULL OR s > prev_max + 1 THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY s, e) AS isl
  FROM ordered
),
cut AS (SELECT doc_id, isl, MIN(s) AS cs, MAX(e) AS ce FROM islands GROUP BY 1, 2),
toks AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS pos, t[u.i] AS tok
  FROM train_toks, UNNEST(range(1, len(t) + 1)) AS u(i)
),
flagged AS (
  SELECT tk.doc_id, tk.pos, tk.tok, (c.cs IS NOT NULL) AS is_cut
  FROM toks tk LEFT JOIN cut c
    ON tk.doc_id = c.doc_id AND tk.pos BETWEEN c.cs AND c.ce
),
rebuilt AS (
  SELECT doc_id,
         COALESCE(string_agg(tok, ' ' ORDER BY pos) FILTER (WHERE NOT is_cut), '') AS txt,
         COUNT(*) FILTER (WHERE NOT is_cut) AS n_tokens_kept,
         COUNT(*) FILTER (WHERE is_cut) AS n_tokens_cut
  FROM flagged GROUP BY doc_id
)
SELECT d.doc_id,
       md5(COALESCE(r.txt, '')) AS decon_md5,
       CAST(COALESCE(r.n_tokens_kept, 0) AS BIGINT) AS n_tokens_kept,
       CAST(COALESCE(r.n_tokens_cut, 0) AS BIGINT) AS n_tokens_cut
FROM documents d LEFT JOIN rebuilt r USING (doc_id)
""",
)
def decontamination_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination rewrite: eval-colliding spans cut from training docs, reassembled in order."""
    from bw_new_data_integration_spark.functions.text import tokens
    from bw_new_data_integration_spark.operators.contamination import decontaminate

    d = _t(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    eval_df = (
        d.where((F.col("doc_id") % 25 == 0) & (F.size(toks) >= 18))
        .select(F.array_join(F.slice(toks, 3, 16), " ").alias("text"))
    )
    out = decontaminate(d, eval_df, k=8)
    return out.select(
        "doc_id",
        F.md5("text_decontaminated").alias("decon_md5"),
        "n_tokens_kept",
        "n_tokens_cut",
    )


# ---------------------------------------------------------------------------
# Heavy-hitters sketch (SpaceSaving/Misra-Gries family,
# operators/sketch.topk_sketch_*) — the frequency twin of
# kmv_distinct_sketch, and the hot-key detector that feeds
# salted_aggregate: per-source constant-size sketches of the token
# stream merge into a corpus sketch WITHOUT rescanning history. Build
# and merge are deterministic integer column algebra, so the oracle
# replays the entire construction (per-source exact top-k + err, the
# upper-bound merge, re-truncation) hash-exactly, and the family's
# guarantee — true <= est <= true + err for every reported key — is
# checked explicitly per term against exact corpus counts on BOTH
# engines.
# ---------------------------------------------------------------------------
@register(
    "heavy_hitters_sketch",
    oracle=r"""
WITH toks AS (
  SELECT source,
         lower(unnest(list_filter(string_split_regex(trim(text), '\s+'), x -> x != ''))) AS t
  FROM documents
),
c AS (SELECT source, t, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY 1, 2),
r AS (
  SELECT source, t, c,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY c DESC, t) AS rn
  FROM c
),
sk AS (SELECT source, t, c FROM r WHERE rn <= 32),
errs AS (
  SELECT source, CAST(COALESCE(MAX(CASE WHEN rn = 33 THEN c END), 0) AS BIGINT) AS err
  FROM r GROUP BY source
),
base AS (SELECT CAST(SUM(err) AS BIGINT) AS base_err FROM errs),
per_key AS (
  SELECT s.t, SUM(s.c) AS present, SUM(e.err) AS present_err
  FROM sk s JOIN errs e USING (source) GROUP BY s.t
),
est AS (
  SELECT t, present + (SELECT base_err FROM base) - present_err AS est
  FROM per_key
),
ranked AS (
  SELECT t, est, ROW_NUMBER() OVER (ORDER BY est DESC, t) AS rn FROM est
),
trunc AS (SELECT CAST(COALESCE(MAX(CASE WHEN rn = 33 THEN est END), 0) AS BIGINT) AS v FROM ranked),
merged_err AS (SELECT (SELECT base_err FROM base) + (SELECT v FROM trunc) AS e),
truth AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS tc FROM toks GROUP BY t)
SELECT m.t AS term,
       CAST(m.est AS BIGINT) AS est,
       tr.tc AS true_count,
       CAST((SELECT e FROM merged_err) AS BIGINT) AS err,
       (tr.tc <= m.est AND m.est <= tr.tc + (SELECT e FROM merged_err)) AS within_bound
FROM ranked m JOIN truth tr USING (t)
WHERE m.rn <= 32
""",
)
def heavy_hitters_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable SpaceSaving heavy-hitters: per-source token sketches merged
    to a corpus sketch; every estimate bound-checked against exact counts."""
    from bw_new_data_integration_spark.operators.sketch import (
        topk_sketch_build,
        topk_sketch_merge,
    )

    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(text.tokens(F.lower(F.col("text")))).alias("t")
    )
    per_source = topk_sketch_build(toks, "source", "t", k=32)
    merged = topk_sketch_merge(per_source, None, k=32)
    entries = merged.select(
        "err", F.explode(F.arrays_zip("terms", "counts")).alias("e")
    ).select(
        F.col("e.terms").alias("term"),
        F.col("e.counts").cast("bigint").alias("est"),
        F.col("err").cast("bigint").alias("err"),
    )
    truth = toks.groupBy(F.col("t").alias("term")).agg(
        F.count(F.lit(1)).cast("bigint").alias("true_count")
    )
    return entries.join(truth, "term").select(
        "term", "est", "true_count", "err",
        (
            (F.col("true_count") <= F.col("est"))
            & (F.col("est") <= F.col("true_count") + F.col("err"))
        ).alias("within_bound"),
    )
