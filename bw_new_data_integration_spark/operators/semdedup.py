"""Semantic deduplication: cluster-then-prune over an embedding column.

The SemDeDup shape (Abbas et al. 2023, "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication", arXiv:2303.09540):
an all-pairs cosine sweep over N embeddings is O(N²) and unrunnable at
corpus scale, so the corpus is clustered and pairwise cosine is
computed only WITHIN clusters.

Spark-first decomposition, LINEAR in the corpus end to end (the naive
"k ∝ N" reading of the paper makes the assignment step O(N·k) = O(N²);
this module keeps every stage's cost O(N)):

1. **Train on a bounded sample.** Centroids come from
   ``kmeans.kmeans_fit`` over a deterministic hash sample of at most
   ``fit_sample`` vectors (operators/sampling.hash_threshold_sample —
   md5-based, partition-layout independent). Fit cost is a constant independent of
   corpus size; only k×dim floats cross the driver. This is exactly how
   production coarse quantizers are trained (faiss trains IVF on a
   sample, the SemDeDup paper fits on GPUs off-line).
2. **Assign with fixed k.** ``kmeans.assign_to_centroids`` — one
   broadcast of the k×dim table, one map-side-combined argmin
   aggregate: O(N·k·dim) with k a CONSTANT, so linear.
3. **Cap bucket size with sign-LSH sub-bits.** With fixed k the
   expected cluster size N/k grows with the corpus, and the
   within-cluster pair join would go O(N²/k). When N/k exceeds
   ``target_bucket``, clusters are subdivided by
   ``ceil(log2((N/k)/target_bucket))`` hyperplane sign bits
   (operators/similarity.hyperplanes — deterministic seed): the pair
   join key becomes (cluster, sub-signature), expected bucket size
   ~``target_bucket``, pair work O(N·target_bucket) — linear. Same
   recall trade as banded LSH: near-identical vectors agree on sign
   bits with high probability; cross-bucket pairs are missed by
   design.
4. **Exact cosine ≥ threshold within buckets** (sequential-fold dot,
   functions/vectors) marks duplicate edges; the larger id of each
   edge is pruned (keep-min-id — deterministic; the paper keeps the
   member closest to the centroid, reported as low-impact). Keep-min-id
   guarantees the gate's postcondition: no two KEPT vectors share a
   bucket at cosine ≥ threshold.

The reference has no equivalent operator (its dedup is pandas
``drop_duplicates``, modules/transformers.py); this is the
beyond-reference semantic-dedup path for training corpora.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def semdedup(
    spark: SparkSession,
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 64,
    threshold: float = 0.95,
    dim: int | None = None,
    max_iter: int = 2,
    fit_sample: int = 8192,
    target_bucket: int = 64,
    n_total: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Cluster-then-prune semantic dedup, linear in the corpus.

    Returns ``(kept, pruned)``: ``kept`` is (id_col, vec_col, cluster)
    for the surviving representatives — ``cluster`` is the final pair-
    join bucket id (coarse cluster, plus sub-LSH bits when the corpus
    outgrows ``k × target_bucket``) — and ``pruned`` is (id_col,) for
    the removed near-duplicates, already materialized (checkpointed).
    ``kept ∪ pruned`` partitions the corpus. Pass ``n_total`` if the
    caller already counted the corpus (saves the sizing job).
    """
    from bw_new_data_integration_spark.functions.vectors import norm
    from bw_new_data_integration_spark.operators.kmeans import (
        assign_to_centroids,
        kmeans_fit,
    )
    from bw_new_data_integration_spark.operators.sampling import (
        hash_threshold_sample,
    )
    from bw_new_data_integration_spark.operators.similarity import (
        hyperplanes,
        signature_col,
    )

    n = emb.count() if n_total is None else n_total
    sample = (
        emb
        if n <= fit_sample
        # 2^32-granular hash threshold: the expected sample stays
        # ~fit_sample at ANY corpus size (no percent quantization)
        else hash_threshold_sample(emb, id_col, fit_sample / n)
    )
    k_eff = min(k, max(1, min(n, fit_sample)))
    _, _, cents = kmeans_fit(
        spark, sample, k=k_eff, max_iter=max_iter, id_col=id_col, vec_col=vec_col,
        # final_update=False: centroids are only a fixed coarse quantizer
        # here (we re-assign the FULL corpus against them next), so the
        # second-to-last-update centroids are equally valid and the fit
        # saves its most expensive job — the last posexplode+collect pass
        collect_inertia=False, final_update=False,
    )
    assigned = assign_to_centroids(
        spark, emb, cents, id_col=id_col, vec_col=vec_col, keep_vector=True
    )

    # sub-bucket oversized clusters so pair work stays linear
    extra_bits = max(0, math.ceil(math.log2(max(1.0, (n / k_eff) / target_bucket))))
    if extra_bits and dim is not None:
        planes = hyperplanes(dim, extra_bits, seed=11)
        bucket = F.col("cluster").cast("bigint") * (1 << extra_bits) + signature_col(
            vec_col, planes
        ).cast("bigint")
    else:
        bucket = F.col("cluster").cast("bigint")

    clustered = assigned.select(
        id_col,
        vec_col,
        bucket.alias("cluster"),
        norm(F.col(vec_col), dim).alias("__norm"),
        # reused by the pair join (both sides) and the anti-join
    ).localCheckpoint(eager=True)

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
