"""dedup query-family module — split from the monolithic queries.py
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



# ---------------------------------------------------------------------------
# Exact dedup: content-hash groupBy (keep lowest doc_id per hash).
# ---------------------------------------------------------------------------
@register(
    "dedup_exact_docs",
    oracle=r"""
SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp,
       min(doc_id) AS doc_id, count(*) AS dup_count
FROM documents GROUP BY 1
""",
)
def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on content hash: one representative row per hash, one shuffle."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.exact_dedup(docs)


# ---------------------------------------------------------------------------
# MinHash signatures (4 hash functions, word 3-gram shingles).
# ---------------------------------------------------------------------------
@register("dedup_minhash_signatures", oracle=_minhash_select_sql(4))
def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signature computation per document (shingle -> k-min hash values)."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.minhash_signatures(docs, num_hashes=4)


# ---------------------------------------------------------------------------
# Incremental LSH dedup (round 5): a new batch (doc_id % 10 == 0)
# deduped against the STORED bucket index of the rest of the corpus —
# the continuous-ingestion shape: history is never re-shingled, only
# the batch is hashed, and candidates = (new × index) ∪ (new × new).
# Oracle: full-corpus LSH candidates restricted to pairs touching the
# batch — the exact-equivalence contract for the incremental path.
# ---------------------------------------------------------------------------
@register(
    "dedup_incremental_lsh",
    oracle="SELECT a_id, b_id FROM (\n"
    + _lsh_oracle()
    + "\n) WHERE a_id % 10 = 0 OR b_id % 10 = 0",
)
def dedup_incremental_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental LSH dedup: new batch probed against a stored bucket index, no re-shingling of history."""
    docs = _t(spark, sf_dir, "documents")
    new_batch = docs.where(F.col("doc_id") % 10 == 0)
    historical = docs.where(F.col("doc_id") % 10 != 0)
    # the stored index: in production a persisted lsh_buckets table;
    # here built from the historical split and materialized once
    index = dedup.lsh_buckets(historical, num_hashes=12, bands=4).localCheckpoint(
        eager=True
    )
    return dedup.incremental_lsh_candidates(index, new_batch, num_hashes=12, bands=4)


@register("dedup_lsh_candidates", oracle=_lsh_oracle())
def dedup_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded LSH candidate pairs from MinHash signatures (bucket equi-join)."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.minhash_lsh_candidates(docs, num_hashes=12, bands=4)


@register("dedup_lsh_candidates_capped", oracle=_capped_lsh_oracle())
def dedup_lsh_candidates_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-hardened LSH: the corpus is salted with 40 identical
    boilerplate docs, forcing a degenerate bucket past the cap in every
    band; ``max_bucket_size=10`` switches those buckets to hub-star
    pairing (n-1 edges instead of n(n-1)/2) while normal buckets keep
    all-pairs — the coded form of the mitigation previously only
    documented at operators/dedup.py."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    boiler = spark.range(40).select(
        (F.col("id") + 1_000_000).alias("doc_id"), F.lit(_BOILER_TEXT).alias("text")
    )
    # rebalance the union explicitly: its partition COUNT (1 fat scan
    # partition + 32 near-empty range partitions) defeats _spread's
    # under-partitioned check, and the digest work would run in one
    # task (found as a 10x wall regression in the sf1 revalidation)
    corpus = docs.unionByName(boiler).repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    return dedup.minhash_lsh_candidates(
        corpus, num_hashes=12, bands=4, max_bucket_size=10
    )


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard similarity (threshold 0.5, all-pairs mode).
# ---------------------------------------------------------------------------
@register(
    "dedup_ngram_jaccard_exact_baseline",
    oracle=_SHINGLE_SQL
    + """,
dsh AS (SELECT DISTINCT doc_id, s FROM sh),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM dsh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_inter
  FROM dsh a JOIN dsh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT a_id, b_id,
       CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) AS jaccard
FROM inter
JOIN sizes sa ON inter.a_id = sa.doc_id
JOIN sizes sb ON inter.b_id = sb.doc_id
WHERE CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) >= 0.5
""",
)
def dedup_ngram_jaccard_exact_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT BASELINE (test-scale only): pair-less all-pairs n-gram
    Jaccard — quadratic in corpus size; the scale path is the
    LSH-candidate-restricted verifier (dedup_lsh_candidates* +
    ngram_jaccard with candidate pairs)."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.ngram_jaccard(docs, threshold=0.5)


@register("dedup_simhash", oracle=_simhash_oracle())
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprint per document with Hamming-distance near-dup pairs."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.simhash(docs)


@register("dedup_cluster_keep_list", oracle=_cluster_oracle(5))
def dedup_cluster_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clustering to a canonical keep-list (min-id representative per component)."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard(docs, threshold=0.5).select("a_id", "b_id")
    return dedup.cluster_duplicates(docs.select("doc_id"), pairs, max_iter=5)


@register("dedup_pipeline_e2e", oracle=_dedup_e2e_oracle())
def dedup_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH → verify → cluster with the hub-star cap ON (max_bucket_size
    =8, mirrored in the oracle): a degenerate bucket of n replicas
    feeds n−1 pairs into Jaccard verification instead of n²/2, so the
    verification stage stays linear in bucket size at any corpus scale
    — the sf1 fixture's replica groups previously drove a ~100×
    candidate fan-out through this composition (SCALING.md; VERDICT r5
    #10). Cluster membership is unchanged for replica groups: hub-spoke
    pairs are exact duplicates, so they pass verification and connected
    components recover the full cluster."""
    docs = _t(spark, sf_dir, "documents")
    cands = dedup.minhash_lsh_candidates(
        docs, num_hashes=12, bands=4, max_bucket_size=8
    )
    verified = dedup.ngram_jaccard(docs, pairs=cands, threshold=0.5).select("a_id", "b_id")
    return dedup.cluster_duplicates(docs.select("doc_id"), verified, max_iter=5)


# ---------------------------------------------------------------------------
# Near-dup-aware split — the STRONG leakage guarantee: split assignment
# is keyed on the duplicate CLUSTER id (LSH -> Jaccard-verify ->
# connected components), so near-duplicates — not just byte-identical
# copies — always land in the same split. split_leakage_free's
# fingerprint key only catches exact dups; a paraphrased or
# near-duplicated eval doc leaks through it, and this closes that hole.
# ---------------------------------------------------------------------------
@register(
    "split_neardup_safe",
    oracle=_dedup_e2e_oracle(
        final_select="""
SELECT CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'valid' ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       CAST(COUNT(DISTINCT lbl) AS BIGINT) AS n_clusters
FROM (
  SELECT doc_id, lbl,
         CAST(('0x' || substring(md5(CAST(lbl AS VARCHAR)), 1, 8))::UBIGINT AS BIGINT) % 100 AS bucket
  FROM {labels}
) GROUP BY 1"""
    ),
)
def split_neardup_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test split that keeps near-duplicate clusters on one side (leakage-safe)."""
    docs = _t(spark, sf_dir, "documents")
    # same hub-star verification cap as dedup_pipeline_e2e (and its
    # oracle) — split assignment is cluster-keyed, and the cap keeps
    # clusters intact for replica groups while bounding the verify stage
    cands = dedup.minhash_lsh_candidates(
        docs, num_hashes=12, bands=4, max_bucket_size=8
    )
    verified = dedup.ngram_jaccard(docs, pairs=cands, threshold=0.5).select("a_id", "b_id")
    clusters = dedup.cluster_duplicates(docs.select("doc_id"), verified, max_iter=5)
    bucket = (
        F.conv(F.substring(F.md5(F.col("cluster_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 100
    )
    split = F.when(bucket < 80, "train").when(bucket < 90, "valid").otherwise("test")
    return clusters.select(split.alias("split"), "cluster_id").groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("cluster_id").cast("bigint").alias("n_clusters"),
    )


# ---------------------------------------------------------------------------
# Leakage-free split — train/valid/test assignment keyed on the CONTENT
# fingerprint, not the doc id: exact duplicates always land in the same
# split (hash of the same fingerprint), so a memorized training doc can
# never reappear in the eval split. The split decision is a pure column
# expression — no shuffle beyond the final aggregate, stable under
# repartitioning and across runs.
# ---------------------------------------------------------------------------
@register(
    "split_leakage_free",
    oracle=r"""
WITH fp AS (
  SELECT doc_id, n_chars,
         md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS f
  FROM documents
),
b AS (
  SELECT *, CAST(('0x' || substring(md5(f), 1, 8))::UBIGINT AS BIGINT) % 100 AS bucket
  FROM fp
)
SELECT CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'valid' ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       CAST(COUNT(DISTINCT f) AS BIGINT) AS n_groups,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM b GROUP BY 1
""",
)
def split_leakage_free(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free split: exact-duplicate groups forced to a single side."""
    docs = _t(spark, sf_dir, "documents")
    f = text.fingerprint(F.col("text"))
    bucket = F.conv(F.substring(F.md5(f), 1, 8), 16, 10).cast("bigint") % 100
    split = F.when(bucket < 80, "train").when(bucket < 90, "valid").otherwise("test")
    return (
        docs.select(split.alias("split"), f.alias("f"), "n_chars")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("f").cast("bigint").alias("n_groups"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


# ---------------------------------------------------------------------------
# Eval-set contamination check (operators/contamination.py): docs with
# doc_id % 97 == 0 stand in for the benchmark pool; every training doc
# sharing >= 3 distinct word 3-grams with the pool is flagged. Eval
# shingles broadcast; the corpus is scanned once — the plan a 100 TB
# decontamination pass needs.
# ---------------------------------------------------------------------------
@register(
    "contamination_check",
    oracle=_SHINGLE_SQL
    + """,
dsh AS (SELECT DISTINCT doc_id, s FROM sh),
e AS (SELECT DISTINCT s FROM dsh WHERE doc_id % 97 = 0),
t AS (SELECT doc_id, s FROM dsh WHERE doc_id % 97 != 0)
SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared_shingles
FROM t JOIN e USING (s)
GROUP BY 1
HAVING COUNT(*) >= 3
""",
)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set n-gram contamination check: broadcast eval shingles probed against the corpus."""
    from bw_new_data_integration_spark.operators import contamination

    docs = _fanout(spark, _t(spark, sf_dir, "documents"))
    eval_pool = docs.where(F.col("doc_id") % 97 == 0)
    train = docs.where(F.col("doc_id") % 97 != 0)
    return contamination.ngram_overlap(train, eval_pool, n=3, min_shared=3)


# ---------------------------------------------------------------------------
# Bloom-filter cross-batch dedup (operators/bloom.py): the continuous-
# ingest "seen before?" primitive. History's content hashes fold into a
# broadcast Bloom filter (distributed bit_or build, only the word array
# crosses the driver); the new batch probes it shuffle-free and only the
# maybe-hits pay the exact verification semi-join. No false negatives,
# so the answer is exact at any filter sizing — the oracle is the plain
# exact EXISTS, with no Bloom reproduction needed. Fixture shapes a
# re-crawl: batch = the unseen doc_id%5==4 slice plus a re-ingested
# doc_id%97==3 slice of history.
# ---------------------------------------------------------------------------
@register(
    "dedup_bloom_prefilter",
    oracle=r"""
WITH f AS (SELECT doc_id,
                  md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
           FROM documents),
     h AS (SELECT doc_id, fp FROM f WHERE doc_id % 5 <> 4),
     b AS (SELECT doc_id, fp FROM f WHERE doc_id % 5 = 4
           UNION ALL
           SELECT doc_id, fp FROM h WHERE doc_id % 97 = 3)
SELECT CAST(b.doc_id AS BIGINT) AS doc_id, b.fp AS fp
FROM b
WHERE EXISTS (SELECT 1 FROM h WHERE h.fp = b.fp)
""",
)
def dedup_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-batch dedup via broadcast Bloom pre-filter: batch rows whose content hash was already seen in history."""
    from bw_new_data_integration_spark.operators import bloom

    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        text.fingerprint(F.col("text")).alias("fp"),
    )
    history = docs.filter(F.col("doc_id") % 5 != 4)
    batch = docs.filter(F.col("doc_id") % 5 == 4).unionByName(
        history.filter(F.col("doc_id") % 97 == 3)
    )
    return bloom.bloom_prefilter_dedup(history, batch, col="fp")


# ---------------------------------------------------------------------------
# Exact substring dedup (Lee et al. 2021): maximal duplicated token
# spans via rolling k-gram hashes — the missing dedup family between
# exact-doc (fingerprint) and near-doc (MinHash): a copied PARAGRAPH
# inside otherwise-distinct documents. Fixture appends a shared
# 12-token boilerplate tail to every 5th doc, so those docs carry one
# maximal duplicated span; the rest of each doc is word salad whose
# k-gram collisions the oracle reproduces exactly if any occur. Exact
# SQL oracle: identical tokenization (the repo's canonical \s+ split),
# identical md5 k-grams, identical overlap-or-adjacent island merge.
# ---------------------------------------------------------------------------
@register(
    "dedup_substring_spans",
    oracle=r"""
WITH docs AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 5 = 0
                      THEN ' subscribe to our newsletter for weekly updates and exclusive offers today friend'
                      ELSE '' END AS content
  FROM documents
),
toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(trim(content)), '\s+'), x -> x != '') AS t
  FROM docs
),
grams AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS s,
         md5(array_to_string(t[u.i:u.i+7], ' ')) AS h
  FROM toks, UNNEST(range(1, len(t) - 8 + 2)) AS u(i)
  WHERE len(t) >= 8
),
dup AS (SELECT h FROM grams GROUP BY h HAVING COUNT(*) > 1),
spans AS (SELECT doc_id, s, s + 7 AS e FROM grams JOIN dup USING (h)),
ordered AS (
  SELECT doc_id, s, e,
         MAX(e) OVER (PARTITION BY doc_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
  FROM spans
),
islands AS (
  SELECT doc_id, s, e,
         SUM(CASE WHEN prev_max IS NULL OR s > prev_max + 1 THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY s, e) AS isl
  FROM ordered
),
merged AS (
  SELECT doc_id, isl, MIN(s) AS span_start, MAX(e) AS span_end
  FROM islands GROUP BY 1, 2
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(SUM(span_end - span_start + 1) AS BIGINT) AS dup_tokens,
       CAST(MIN(span_start) AS BIGINT) AS first_start,
       CAST(MAX(span_end) AS BIGINT) AS last_end
FROM merged GROUP BY 1
""",
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring dedup: maximal cross-corpus duplicated token spans (rolling k-gram hashes)."""
    from bw_new_data_integration_spark.operators.dedup import duplicate_spans

    d = _t(spark, sf_dir, "documents")
    content = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.lit(
                " subscribe to our newsletter for weekly updates and exclusive offers today friend"
            ),
        ).otherwise(F.lit("")),
    )
    spans = duplicate_spans(
        d.select("doc_id", content.alias("content")), k=8, text_col="content"
    )
    return spans.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_spans"),
        F.sum(F.col("span_end") - F.col("span_start") + 1)
        .cast("bigint")
        .alias("dup_tokens"),
        F.min("span_start").cast("bigint").alias("first_start"),
        F.max("span_end").cast("bigint").alias("last_end"),
    )


# ---------------------------------------------------------------------------
# The REWRITE step of exact substring dedup: every duplicated k-gram
# keeps its first occurrence corpus-wide (min doc_id, position); merged
# redundant spans are cut and documents reassembled. Same fixture as
# dedup_substring_spans — the minimal %5 doc keeps the boilerplate
# tail, every later %5 doc loses exactly it. The oracle replicates the
# whole pipeline (tokenize, gram-hash, first-occurrence ranking, island
# merge, range-join cut, ordered reassembly); the rebuilt text is
# compared by md5 to keep the payload small.
# ---------------------------------------------------------------------------
@register(
    "dedup_substring_rewrite",
    oracle=r"""
WITH docs AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 5 = 0
                      THEN ' subscribe to our newsletter for weekly updates and exclusive offers today friend'
                      ELSE '' END AS content
  FROM documents
),
toks_arr AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(content), '\s+'), x -> x != '') AS t
  FROM docs
),
grams AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS s,
         md5(lower(array_to_string(t[u.i:u.i+7], ' '))) AS h
  FROM toks_arr, UNNEST(range(1, len(t) - 8 + 2)) AS u(i)
  WHERE len(t) >= 8
),
ranked AS (
  SELECT doc_id, s,
         ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, s) AS rn
  FROM grams
),
redundant AS (SELECT doc_id, s, s + 7 AS e FROM ranked WHERE rn > 1),
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
flagged AS (
  SELECT tk.doc_id, tk.pos, tk.tok, (c.cs IS NOT NULL) AS is_cut
  FROM toks tk LEFT JOIN cut c
    ON tk.doc_id = c.doc_id AND tk.pos BETWEEN c.cs AND c.ce
),
rebuilt AS (
  SELECT doc_id,
         COALESCE(string_agg(tok, ' ' ORDER BY pos) FILTER (WHERE NOT is_cut), '') AS text_dedup,
         COUNT(*) FILTER (WHERE NOT is_cut) AS n_tokens_kept,
         COUNT(*) FILTER (WHERE is_cut) AS n_tokens_cut
  FROM flagged GROUP BY doc_id
)
SELECT d.doc_id,
       md5(COALESCE(r.text_dedup, '')) AS dedup_md5,
       CAST(COALESCE(r.n_tokens_kept, 0) AS BIGINT) AS n_tokens_kept,
       CAST(COALESCE(r.n_tokens_cut, 0) AS BIGINT) AS n_tokens_cut
FROM docs d LEFT JOIN rebuilt r USING (doc_id)
""",
)
def dedup_substring_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-dedup rewrite: duplicated spans cut (first occurrence kept), docs reassembled."""
    from bw_new_data_integration_spark.operators.dedup import cut_duplicate_spans

    d = _t(spark, sf_dir, "documents")
    content = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.lit(
                " subscribe to our newsletter for weekly updates and exclusive offers today friend"
            ),
        ).otherwise(F.lit("")),
    )
    out = cut_duplicate_spans(
        d.select("doc_id", content.alias("content")), k=8, text_col="content"
    )
    return out.select(
        "doc_id",
        F.md5("text_dedup").alias("dedup_md5"),
        "n_tokens_kept",
        "n_tokens_cut",
    )


# ---------------------------------------------------------------------------
# Incremental substring dedup: a NEW batch (odd doc_ids) against the
# stored gram index of history (even doc_ids) — no history re-scan;
# the batch's distinct hashes broadcast against the index. Arrival-
# order semantics: history keeps (index hits cut everywhere in the
# batch), first batch occurrence keeps among batch-only duplicates.
# The boilerplate tail rides every 5th doc, so history tail-docs
# (id % 10 = 0) force cuts in batch tail-docs (id % 10 = 5). The unit
# test separately pins equivalence with the full-corpus rewrite when
# history ids precede batch ids.
# ---------------------------------------------------------------------------
@register(
    "dedup_substring_incremental",
    oracle=r"""
WITH docs AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 5 = 0
                      THEN ' subscribe to our newsletter for weekly updates and exclusive offers today friend'
                      ELSE '' END AS content
  FROM documents
),
toks_arr AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(content), '\s+'), x -> x != '') AS t
  FROM docs
),
grams AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS s,
         md5(lower(array_to_string(t[u.i:u.i+7], ' '))) AS h
  FROM toks_arr, UNNEST(range(1, len(t) - 8 + 2)) AS u(i)
  WHERE len(t) >= 8
),
hist AS (SELECT DISTINCT h FROM grams WHERE doc_id % 2 = 0),
batch AS (SELECT * FROM grams WHERE doc_id % 2 = 1),
from_history AS (SELECT doc_id, s FROM batch WHERE h IN (SELECT h FROM hist)),
ranked AS (
  SELECT doc_id, s, ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, s) AS rn
  FROM batch
),
redundant AS (
  SELECT DISTINCT doc_id, s FROM (
    SELECT doc_id, s FROM from_history
    UNION ALL SELECT doc_id, s FROM ranked WHERE rn > 1
  )
),
spans AS (SELECT doc_id, s, s + 7 AS e FROM redundant),
ordered AS (
  SELECT doc_id, s, e,
         MAX(e) OVER (PARTITION BY doc_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
  FROM spans
),
islands AS (
  SELECT doc_id, s, e,
         SUM(CASE WHEN prev_max IS NULL OR s > prev_max + 1 THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY s, e) AS isl
  FROM ordered
),
cut AS (SELECT doc_id, isl, MIN(s) AS cs, MAX(e) AS ce FROM islands GROUP BY 1, 2),
btoks AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS pos, t[u.i] AS tok
  FROM toks_arr, UNNEST(range(1, len(t) + 1)) AS u(i)
  WHERE doc_id % 2 = 1
),
flagged AS (
  SELECT tk.doc_id, tk.pos, tk.tok, (c.cs IS NOT NULL) AS is_cut
  FROM btoks tk LEFT JOIN cut c
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
       md5(COALESCE(r.txt, '')) AS dedup_md5,
       CAST(COALESCE(r.n_tokens_kept, 0) AS BIGINT) AS n_tokens_kept,
       CAST(COALESCE(r.n_tokens_cut, 0) AS BIGINT) AS n_tokens_cut
FROM (SELECT doc_id FROM documents WHERE doc_id % 2 = 1) d
LEFT JOIN rebuilt r USING (doc_id)
""",
)
def dedup_substring_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental substring dedup: batch vs stored gram index, no history re-scan."""
    from bw_new_data_integration_spark.operators.dedup import (
        gram_index,
        incremental_duplicate_spans,
    )

    d = _t(spark, sf_dir, "documents")
    content = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.lit(
                " subscribe to our newsletter for weekly updates and exclusive offers today friend"
            ),
        ).otherwise(F.lit("")),
    ).alias("content")
    hist = d.where(F.col("doc_id") % 2 == 0).select("doc_id", content)
    batch = d.where(F.col("doc_id") % 2 == 1).select("doc_id", content)
    out = incremental_duplicate_spans(
        gram_index(hist, k=8, text_col="content"), batch, k=8, text_col="content"
    )
    return out.select(
        "doc_id",
        F.md5("text_dedup").alias("dedup_md5"),
        "n_tokens_kept",
        "n_tokens_cut",
    )
