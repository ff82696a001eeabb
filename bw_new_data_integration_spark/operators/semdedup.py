"""Semantic deduplication: cluster-then-prune over an embedding column.

The SemDeDup shape (Abbas et al. 2023, "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication", arXiv:2303.09540):
an all-pairs cosine sweep over N embeddings is O(N²) and unrunnable at
corpus scale, so the corpus is first k-means-clustered and pairwise
cosine is computed only WITHIN clusters — O(N²/k) total pair work, and
each cluster's pair join is an equi-join on a small int key (hash
partitionable, AQE splittable), never a corpus self-join.

Spark-first decomposition:

1. ``kmeans.kmeans_fit`` assigns every vector a cluster id
   (deterministic init + integer-scaled sums; only k×dim floats ever
   cross the driver).
2. Within-cluster candidate pairs via a self-equi-join on
   ``cluster`` — the same bucket-join plan as sign-LSH near-dup
   (operators/dedup.embedding_near_dups_lsh), with the learned cluster
   id as the bucket.
3. Exact cosine (sequential-fold dot product, functions/vectors) ≥
   ``threshold`` marks a duplicate edge; the larger id of each edge is
   pruned (keep-min-id — deterministic; the paper keeps the member
   closest to the centroid, an implementation choice it reports as
   low-impact).  Keep-min-id guarantees the postcondition the gate
   verifies: for any surviving edge (a, b) with a < b, b is pruned, so
   NO two kept vectors in the same cluster are ≥ threshold.

Scale notes (100 TB): choose k ∝ N so the expected cluster size stays
constant — pair work is then O(N · cluster_size), linear in the corpus.
Cross-cluster near-dups are missed by design (recall < 1, exactly the
LSH trade); raise recall by lowering cluster count or probing
neighboring centroids. The reference has no equivalent operator (its
dedup is pandas ``drop_duplicates``, modules/transformers.py); this is
the beyond-reference semantic-dedup path for training corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def semdedup(
    spark: SparkSession,
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    threshold: float = 0.95,
    dim: int | None = None,
    max_iter: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """Cluster-then-prune semantic dedup.

    Returns ``(kept, pruned)``: ``kept`` is (id_col, vec_col, cluster)
    for the surviving representatives, ``pruned`` is (id_col,) for the
    removed near-duplicates. ``kept ∪ pruned`` partitions the corpus.
    """
    from bw_new_data_integration_spark.functions.vectors import norm
    from bw_new_data_integration_spark.operators.kmeans import kmeans_fit

    # the vector rides the assignment out of the fit (keep_vector) and
    # the last centroid-update pass is skipped (final_update=False:
    # assignments don't depend on it) — no corpus re-join, one fewer
    # corpus-wide aggregate. The assignment is already checkpointed
    # inside kmeans_fit; the norm column recomputes from it cheaply.
    assigned, _, _ = kmeans_fit(
        spark, emb, k=k, max_iter=max_iter, id_col=id_col, vec_col=vec_col,
        collect_inertia=False, keep_vector=True, final_update=False,
    )
    clustered = assigned.select(
        id_col,
        vec_col,
        "cluster",
        norm(F.col(vec_col), dim).alias("__norm"),
    )
    edges = within_cluster_near_dups(
        clustered, id_col=id_col, vec_col=vec_col, threshold=threshold, dim=dim
    )
    # materialize the pruned-id set: every consumer (the anti-join here,
    # any caller-side stats/verification) would otherwise re-run the
    # whole within-cluster pair join per action
    pruned = (
        edges.select(F.col("b_id").alias(id_col))
        .distinct()
        .localCheckpoint(eager=True)
    )
    kept = clustered.join(pruned, id_col, "left_anti").select(id_col, vec_col, "cluster")
    return kept, pruned


def within_cluster_near_dups(
    clustered: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    dim: int | None = None,
) -> DataFrame:
    """Cosine-≥-threshold pairs restricted to equal ``cluster`` ids.

    ``clustered`` must carry (id_col, vec_col, cluster, __norm) — norms
    are precomputed once (n folds), not per pair (n² folds). The join is
    an equi-join on ``cluster`` with an ``a.id < b.id`` residual, so each
    pair is emitted once and Catalyst plans a hash join on the cluster
    key.
    """
    from bw_new_data_integration_spark.functions.vectors import dot

    a = clustered.alias("a")
    b = clustered.alias("b")
    return (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("a_id"),
            F.col(f"b.{id_col}").alias("b_id"),
            F.col("a.cluster").alias("cluster"),
            F.when(
                (F.col("a.__norm") > 0) & (F.col("b.__norm") > 0),
                dot(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"), dim)
                / (F.col("a.__norm") * F.col("b.__norm")),
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
