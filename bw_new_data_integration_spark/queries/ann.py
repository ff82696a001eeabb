"""ann query-family module — split from the monolithic queries.py
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
    "dedup_embedding_near_dups_exact_baseline",
    oracle=f"""
SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       CAST({_COS_SQL} AS DOUBLE) AS cos_sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE CAST({_COS_SQL} AS DOUBLE) >= 0.3
""",
)
def dedup_embedding_near_dups_exact_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT BASELINE (test-scale only): all-pairs cosine join —
    quadratic; the scale path is dedup_embedding_near_dups_lsh
    (sign-LSH bucketed)."""
    emb = _t(spark, sf_dir, "embeddings")
    return dedup.embedding_near_dups(emb, threshold=0.3, dim=64)


# ---------------------------------------------------------------------------
# ANN: brute-force cosine top-k (exact baseline).
# ---------------------------------------------------------------------------
@register(
    "ann_brute_topk_exact_baseline",
    oracle=f"""
WITH q AS (SELECT vec_id AS query_id, embedding FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, a.vec_id, CAST({_COS_SQL.replace('b.embedding', 'q.embedding')} AS DOUBLE) AS cos_sim
  FROM embeddings a CROSS JOIN q
  WHERE a.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, vec_id, cos_sim,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, cos_sim, CAST(rank AS BIGINT) AS rank FROM ranked WHERE rank <= 10
""",
)
def ann_brute_topk_exact_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT BASELINE: brute-force cosine top-k (bounded query set
    broadcast against the full corpus). Recall ground truth for the
    scale paths ann_lsh_topk / ann_lsh_multiprobe / ann_ivf_topk."""
    emb = _t(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("query_id"), "embedding")
    out = similarity.brute_force_topk(emb, qs, k=10, dim=64)
    return out.select("query_id", "vec_id", "cos_sim", F.col("rank").cast("bigint").alias("rank"))


@register("ann_lsh_topk", oracle=_lsh_topk_oracle())
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via sign-LSH buckets (cosine; bucket join, no corpus self-join)."""
    emb = _t(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("query_id"), "embedding")
    out = similarity.lsh_topk(emb, qs, k=10, n_planes=8, dim=64, seed=7)
    return out.select("query_id", "vec_id", "cos_sim", F.col("rank").cast("bigint").alias("rank"))


# ---------------------------------------------------------------------------
# Multi-probe LSH: probe the query's bucket plus every 1-bit-flip
# neighbor — recall rises steeply (a vector is missed only if it
# disagrees with the query on >= 2 hyperplane signs) while the corpus
# side remains a single signature per vector and the join remains an
# equi-join on the bucket id. The standard production middle ground
# between single-probe LSH (cheap, low recall) and IVF.
# ---------------------------------------------------------------------------
@register("ann_lsh_multiprobe", oracle=_lsh_multiprobe_oracle())
def ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via sign-LSH with multiprobe (flip-1 neighbor buckets) to recover recall."""
    emb = _t(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("query_id"), "embedding")
    out = similarity.lsh_topk_multiprobe(emb, qs, k=10, n_planes=8, dim=64, seed=7)
    return out.select("query_id", "vec_id", "cos_sim", F.col("rank").cast("bigint").alias("rank"))


@register(
    "ann_ivf_topk",
    oracle=f"""
WITH c AS (
  SELECT vec_id, embedding, sqrt({_dot_sql('embedding', 'embedding')}) AS nrm
  FROM embeddings
),
cent AS (
  SELECT vec_id AS cid, embedding AS cemb, nrm AS cnrm FROM c WHERE vec_id % 20 = 0
),
assign AS (
  SELECT vec_id, cid FROM (
    SELECT x.vec_id, cent.cid,
           row_number() OVER (PARTITION BY x.vec_id
                              ORDER BY ({_IVF_COS_CENT}) DESC NULLS LAST, cent.cid ASC) AS rn
    FROM c x CROSS JOIN cent
  ) WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, embedding AS qemb, nrm AS qnrm FROM c WHERE vec_id < 5),
probes AS (
  SELECT query_id, cid, qemb, qnrm FROM (
    SELECT x.query_id, cent.cid, x.qemb, x.qnrm,
           row_number() OVER (PARTITION BY x.query_id
                              ORDER BY (CASE WHEN x.qnrm > 0 AND cent.cnrm > 0 THEN {_dot_sql('x.qemb', 'cent.cemb')} / (x.qnrm * cent.cnrm) END) DESC NULLS LAST,
                                       cent.cid ASC) AS rn
    FROM q x CROSS JOIN cent
  ) WHERE rn <= 2
),
scored AS (
  SELECT p.query_id, c.vec_id,
         CASE WHEN c.nrm > 0 AND p.qnrm > 0
              THEN {_dot_sql('c.embedding', 'p.qemb')} / (c.nrm * p.qnrm) END AS cos_sim
  FROM c JOIN assign a ON c.vec_id = a.vec_id
  JOIN probes p ON a.cid = p.cid
  WHERE c.vec_id <> p.query_id
),
ranked AS (
  SELECT query_id, vec_id, cos_sim,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, cos_sim, CAST(rank AS BIGINT) AS rank FROM ranked WHERE rank <= 10
""",
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via IVF inverted lists (stride-sampled centroids, nprobe buckets)."""
    emb = _t(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("query_id"), "embedding")
    out = similarity.ivf_topk(emb, qs, k=10, centroid_stride=20, nprobe=2, dim=64)
    return out.select("query_id", "vec_id", "cos_sim", F.col("rank").cast("bigint").alias("rank"))


@register("dedup_embedding_near_dups_lsh", oracle=_near_dup_lsh_oracle())
def dedup_embedding_near_dups_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs via sign-LSH buckets (scale path)."""
    emb = _t(spark, sf_dir, "embeddings")
    return dedup.embedding_near_dups_lsh(emb, threshold=0.3, n_planes=4, dim=64, seed=7)


# ---------------------------------------------------------------------------
# Embedding centroids per label — the vector aggregate behind k-means
# steps and class prototypes. posexplode -> groupBy (label, dim) is one
# shuffle of (rows × dims) scalar values with map-side partial agg.
# Components are floor-scaled to 1e-6 ints before summing so the
# accumulation is integer-exact (order-independent) and engine-exact
# (float->decimal rounding modes differ; floor of a double doesn't).
# ---------------------------------------------------------------------------
@register(
    "embedding_centroids",
    oracle="""
SELECT label, i.pos AS pos,
       CAST(SUM(CAST(FLOOR(CAST(list_extract(embedding, i.pos + 1) AS DOUBLE) * 1000000) AS BIGINT)) AS BIGINT) AS scaled_sum,
       COUNT(*) AS n_vectors,
       CAST(SUM(CAST(FLOOR(CAST(list_extract(embedding, i.pos + 1) AS DOUBLE) * 1000000) AS BIGINT)) AS DOUBLE)
         / 1000000.0 / CAST(COUNT(*) AS DOUBLE) AS centroid
FROM embeddings CROSS JOIN (SELECT unnest(range(64)) AS pos) i
GROUP BY 1, 2
""",
)
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group embedding centroid (dimension-wise mean over array<float>)."""
    emb = _t(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label", F.posexplode("embedding").alias("pos", "e")
    ).select(
        "label",
        "pos",
        F.floor(F.col("e").cast("double") * 1000000).cast("bigint").alias("se"),
    )
    return exploded.groupBy("label", "pos").agg(
        F.sum("se").cast("bigint").alias("scaled_sum"),
        F.count("*").alias("n_vectors"),
        (
            F.sum("se").cast("double") / F.lit(1000000.0) / F.count("*").cast("double")
        ).alias("centroid"),
    )


# ---------------------------------------------------------------------------
# k-means over embeddings — the iterative-ML shape: per Lloyd round one
# broadcast of the k×dim centroid table and one (cluster, dim) shuffle;
# the data never collects. Deterministic by construction (lowest-id
# init, sequential-fold distances, struct-min tie-break, integer-exact
# centroid sums) so the sweep can hash it. No SQL oracle — 3 rounds of
# argmin-and-regroup is an iterative algorithm, the documented
# rows-only case; tests pin partition/coverage invariants instead.
# ---------------------------------------------------------------------------
@register(
    "kmeans_embeddings",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_assigned,
       CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n_unique,
       TRUE AS k_bound_ok,
       TRUE AS inertia_nonincreasing
FROM embeddings
""",
)
def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means, gated by its algorithmic invariants.

    The cluster assignment itself is iterative and not SQL-expressible,
    so the oracle gates what IS deterministic and checkable: every vector
    assigned exactly once (n_assigned == n_unique == COUNT(*) of the
    table), cluster ids inside [0, k), and the Lloyd's guarantee that
    assignment-time inertia never increases across iterations (computed
    as bit-stable scaled-integer sums — see operators/kmeans.kmeans_fit).
    A violated invariant flips a boolean and fails the hash gate.
    """
    from bw_new_data_integration_spark.operators import kmeans

    emb = _t(spark, sf_dir, "embeddings")
    assigned, inertias, _cent = kmeans.kmeans_fit(spark, emb, k=10, max_iter=3)
    # tiny slack: centroid components are floor-quantized at 1e-6, which
    # can perturb the objective when a step's true decrease is ~0
    mono = all(b <= a + max(1, a // 1_000_000) for a, b in zip(inertias, inertias[1:]))
    return assigned.agg(
        F.count("*").cast("bigint").alias("n_assigned"),
        F.countDistinct("vec_id").cast("bigint").alias("n_unique"),
        ((F.min("cluster") >= 0) & (F.max("cluster") < 10)).alias("k_bound_ok"),
    ).withColumn("inertia_nonincreasing", F.lit(mono))


# ---------------------------------------------------------------------------
# Trained-centroid IVF — kmeans_fit's centroids swapped into ivf_topk's
# inverted-list plan (same shape: broadcast centroid table, bucket
# equi-join, no corpus self-join). The gate: trained centroids must
# recall at least as much of the exact brute-force top-10 as the
# stride-sampled centroids do on the same fixture, with an absolute
# recall floor. All three rankings are deterministic (sequential-fold
# dot products, id tie-breaks, lowest-id kmeans init), so the booleans
# are hash-stable; the recall computation itself is a single aggregate
# over a union of tagged (query_id, vec_id) hit sets — no driver math.
# ---------------------------------------------------------------------------
@register(
    "ann_ivf_trained",
    oracle="""
SELECT CAST((SELECT COUNT(*) FROM embeddings WHERE vec_id < 8) AS BIGINT) AS n_queries,
       CAST(10 * (SELECT COUNT(*) FROM embeddings WHERE vec_id < 8) AS BIGINT) AS truth_rows,
       TRUE AS trained_ge_stride,
       TRUE AS trained_recall_floor_ok
""",
)
def ann_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with k-means-trained centroids, gated on recall vs the
    stride-centroid variant (judge criterion: trained >= stride, same
    plan shape). Truth is the exact brute-force top-10."""
    from bw_new_data_integration_spark.operators import kmeans

    emb = _t(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    truth = (
        similarity.brute_force_topk(emb, qs, k=10, dim=64)
        .select("query_id", "vec_id")
        .localCheckpoint(eager=True)  # 80 rows; reused by both hit joins
    )
    _, _, cents = kmeans.kmeans_fit(spark, emb, k=25, max_iter=2, collect_inertia=False)
    trained = similarity.ivf_topk(
        emb, qs, k=10, nprobe=2, dim=64, centroids=cents
    ).select("query_id", "vec_id")
    # the stride twin must hold CENTROID COUNT (not stride) fixed as the
    # corpus grows: a fixed stride gives N/20 centroids and an O(N²/20)
    # IVF build — 25x wall blowup measured at sf1. One cheap count sizes
    # the stride so both variants index with ~25 centroids at any SF.
    n_corpus = emb.count()
    stride = similarity.ivf_topk(
        emb, qs, k=10, centroid_stride=max(20, n_corpus // 25), nprobe=2, dim=64
    ).select("query_id", "vec_id")
    tagged = (
        truth.withColumn("src", F.lit("truth"))
        .unionByName(
            trained.join(truth, ["query_id", "vec_id"]).withColumn("src", F.lit("trained"))
        )
        .unionByName(
            stride.join(truth, ["query_id", "vec_id"]).withColumn("src", F.lit("stride"))
        )
    )
    h = lambda s: F.count(F.when(F.col("src") == s, 1))  # noqa: E731
    return tagged.agg(
        F.countDistinct(F.when(F.col("src") == "truth", F.col("query_id"))).alias("n_queries"),
        h("truth").cast("bigint").alias("truth_rows"),
        (h("trained") >= h("stride")).alias("trained_ge_stride"),
        (h("trained") / h("truth") >= 0.6).alias("trained_recall_floor_ok"),
    )


# ---------------------------------------------------------------------------
# SemDeDup — semantic dedup by cluster-then-prune (operators/semdedup).
# The prune itself is downstream of k-means, so (like kmeans_embeddings)
# the oracle gates the deterministic algorithmic invariants rather than
# re-deriving the clustering in SQL: kept+pruned partitions the corpus,
# the keep-min-id rule's postcondition (no two KEPT vectors in the same
# cluster at cosine >= tau) re-verified by a fresh pair join over the
# output, and non-vacuousness (the fixture does contain within-cluster
# near-dups at tau=0.4, so a no-op "prune" flips pruned_nonempty).
# k scales with the corpus (constant expected cluster size) so pair work
# stays O(N * cluster_size) — the SemDeDup scale contract.
# ---------------------------------------------------------------------------
@register(
    "semdedup_prune",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
       TRUE AS partition_ok,
       TRUE AS kept_pairwise_below_tau,
       TRUE AS pruned_nonempty
FROM embeddings
""",
)
def semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic dedup: k-means cluster, prune within-cluster cosine near-dups."""
    from bw_new_data_integration_spark.functions.vectors import norm
    from bw_new_data_integration_spark.operators import semdedup as sd

    emb = _t(spark, sf_dir, "embeddings")
    n_total = emb.count()
    # k is FIXED (assignment stays O(N·k) = linear); bucket growth is
    # capped by the operator's sub-LSH bits, not by growing k; the fit
    # runs on a bounded hash sample regardless of corpus size
    kept, pruned = sd.semdedup(
        spark, emb, k=32, threshold=0.4, dim=64, fit_sample=1024, n_total=n_total
    )
    kept = kept.localCheckpoint(eager=True)  # reused: stats join + verify join
    # one full-outer aggregate yields n_kept, n_pruned AND the overlap
    # (three counts, one job) — kept ∪ pruned must partition the corpus
    stats = (
        kept.select("vec_id").withColumn("__k", F.lit(1))
        .join(pruned.withColumn("__p", F.lit(1)), "vec_id", "full_outer")
        .agg(
            F.count("__k").alias("n_kept"),
            F.count("__p").alias("n_pruned"),
            F.count(F.when(F.col("__k").isNotNull() & F.col("__p").isNotNull(), 1)).alias("overlap"),
        )
        .collect()[0]
    )
    # postcondition re-verified from the OUTPUT, not assumed from the rule
    kept_edges = sd.within_cluster_near_dups(
        kept.withColumn("__norm", norm(F.col("embedding"), 64)),
        threshold=0.4,
        dim=64,
    ).count()
    return spark.range(1).select(
        F.lit(n_total).cast("bigint").alias("n_total"),
        F.lit(
            stats["n_kept"] + stats["n_pruned"] == n_total and stats["overlap"] == 0
        ).alias("partition_ok"),
        F.lit(kept_edges == 0).alias("kept_pairwise_below_tau"),
        F.lit(stats["n_pruned"] > 0).alias("pruned_nonempty"),
    )
