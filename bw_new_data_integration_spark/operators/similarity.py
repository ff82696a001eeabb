"""Similarity search over embedding columns (beyond-reference).

Two tiers:

- **brute-force top-k** — exact cosine against every corpus vector,
  ranked per query by a window. Correctness baseline and perfectly
  fine when the query set is small (the corpus scan is one pass).
- **LSH-bucketed ANN** — random-hyperplane signatures bucket the
  corpus; a query only scores vectors sharing its bucket (or a
  neighboring probe). At 100 TB the corpus side is hash-partitioned by
  bucket and the bucket join replaces the all-pairs cross join.

Hyperplanes are generated from a seeded RNG on the driver (a few KB)
and broadcast as literal arrays — deterministic, no Python in the row
path.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bw_new_data_integration_spark.functions.vectors import dot


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    Cross join (queries broadcast — the small side) → cosine → per-query
    row_number. Ties broken by corpus id for determinism. Self-matches
    (same id) are excluded when the id columns collide.
    """
    from bw_new_data_integration_spark.functions.vectors import norm

    # norms precomputed per row (not per pair) — identical fold, ~dim× faster
    q = F.broadcast(
        queries.select(
            F.col(query_id_col), F.col(vec_col).alias("__qvec"), norm(F.col(vec_col), dim).alias("__qnorm")
        )
    )
    c = corpus.select(id_col, vec_col, norm(F.col(vec_col), dim).alias("__cnorm"))
    scored = c.crossJoin(q).filter(F.col(id_col) != F.col(query_id_col))
    scored = scored.select(
        F.col(query_id_col),
        F.col(id_col),
        F.when(
            (F.col("__cnorm") > 0) & (F.col("__qnorm") > 0),
            dot(F.col(vec_col), F.col("__qvec"), dim) / (F.col("__cnorm") * F.col("__qnorm")),
        ).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def hyperplanes(dim: int, n_planes: int, seed: int = 7) -> list[list[float]]:
    """Seeded random hyperplanes for sign-LSH (driver-side, tiny)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def signature_col(vec_col, planes: list[list[float]]):
    """Sign-LSH bucket id: one bit per hyperplane (int)."""
    sig = F.lit(0).cast("bigint")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(
            dot(F.col(vec_col) if isinstance(vec_col, str) else vec_col, plane, len(p)) >= 0, 1
        ).otherwise(0)
        sig = sig + (bit.cast("bigint") * F.lit(1 << i))
    return sig


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's
    sign-LSH bucket. Recall < 1.0 by design; raise recall with fewer
    planes (bigger buckets) or multi-probe. The join is an equi-join on
    the bucket id — shuffle on a small int key instead of a cross join.
    """
    from bw_new_data_integration_spark.functions.vectors import norm

    planes = hyperplanes(dim, n_planes, seed)
    c = corpus.select(
        id_col,
        vec_col,
        norm(F.col(vec_col), dim).alias("__cnorm"),
        signature_col(vec_col, planes).alias("__bucket"),
    )
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qvec"),
        norm(F.col(vec_col), dim).alias("__qnorm"),
        signature_col(vec_col, planes).alias("__bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "__bucket")
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            F.col(query_id_col),
            F.col(id_col),
            F.when(
                (F.col("__cnorm") > 0) & (F.col("__qnorm") > 0),
                dot(F.col(vec_col), F.col("__qvec"), dim) / (F.col("__cnorm") * F.col("__qnorm")),
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def lsh_topk_multiprobe(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Multi-probe sign-LSH top-k: each query scores its own bucket
    PLUS every bucket one bit-flip away (the vectors most likely to
    have landed just across one hyperplane). Recall rises steeply —
    a vector is missed only if it differs from the query in ≥2 signs —
    while the corpus side is untouched: still one signature per vector,
    still an equi-join on the bucket id. The query side fans out
    ``n_planes + 1`` probe rows per query (tiny — queries are the
    bounded side), and since every probe bucket is distinct, a
    (query, corpus) pair can match at most once: no dedup step.
    """
    from bw_new_data_integration_spark.functions.vectors import norm

    planes = hyperplanes(dim, n_planes, seed)
    c = corpus.select(
        id_col,
        vec_col,
        norm(F.col(vec_col), dim).alias("__cnorm"),
        signature_col(vec_col, planes).alias("__bucket"),
    )
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qvec"),
        norm(F.col(vec_col), dim).alias("__qnorm"),
        signature_col(vec_col, planes).alias("__b0"),
    )
    probes = q.select(
        query_id_col,
        "__qvec",
        "__qnorm",
        F.explode(
            F.array(
                F.col("__b0"),
                *[F.col("__b0").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)],
            )
        ).alias("__bucket"),
    )
    scored = (
        c.join(F.broadcast(probes), "__bucket")
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            F.col(query_id_col),
            F.col(id_col),
            F.when(
                (F.col("__cnorm") > 0) & (F.col("__qnorm") > 0),
                dot(F.col(vec_col), F.col("__qvec"), dim) / (F.col("__cnorm") * F.col("__qnorm")),
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    centroid_stride: int = 20,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int | None = None,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-style ANN: inverted lists per centroid, probe the nearest
    ``nprobe`` lists per query.

    By default centroids are a deterministic corpus subset (every
    ``centroid_stride``-th id) rather than k-means — the *distribution
    pattern* is the point: the corpus is hash-partitioned by centroid
    id (the inverted index), a query scores only the lists it probes,
    and the centroid table is broadcast (thousands of rows at 100 TB).
    SCALE INVARIANT: size ``centroid_stride`` to hold the CENTROID
    COUNT roughly fixed (stride ≈ N/k) — a fixed stride makes the
    centroid table grow with the corpus and the IVF build cost
    O(N²/stride) (25× wall blowup measured at a 10× scale-up).
    Passing trained ``centroids`` (e.g. ``kmeans_fit``'s third return
    value — a k×dim driver-side list, the same scale of object every
    IVF index ships) changes recall, not the plan shape: same broadcast
    centroid table, same inverted-list equi-join, no corpus self-join.

    Build cost: |corpus| × |centroids| broadcast-local dot products,
    no shuffle of the corpus beyond the final per-query top-k.
    """
    from bw_new_data_integration_spark.functions.vectors import norm

    c = corpus.select(id_col, vec_col, norm(F.col(vec_col), dim).alias("__nrm"))
    if centroids is not None:
        cent = corpus.sparkSession.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(centroids)],
            "__cid bigint, __cemb array<double>",
        ).select("__cid", "__cemb", norm(F.col("__cemb"), dim).alias("__cnrm"))
    else:
        cent = c.filter((F.col(id_col) % centroid_stride) == 0).select(
            F.col(id_col).alias("__cid"),
            F.col(vec_col).alias("__cemb"),
            F.col("__nrm").alias("__cnrm"),
        )

    def cos(vec, nrm, cvec=F.col("__cemb"), cnrm=F.col("__cnrm")):
        return F.when((nrm > 0) & (cnrm > 0), dot(vec, cvec, dim) / (nrm * cnrm))

    # inverted index: each corpus vector files under its nearest centroid
    w_assign = Window.partitionBy(id_col).orderBy(
        cos(F.col(vec_col), F.col("__nrm")).desc_nulls_last(), F.col("__cid").asc()
    )
    assign = (
        c.crossJoin(F.broadcast(cent))
        .withColumn("__rn", F.row_number().over(w_assign))
        .filter(F.col("__rn") == 1)
        .select(id_col, "__cid")
    )
    inv = c.join(assign, id_col)

    # each query probes its nprobe nearest centroids
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("__qvec"), norm(F.col(vec_col), dim).alias("__qnrm")
    )
    w_probe = Window.partitionBy(query_id_col).orderBy(
        cos(F.col("__qvec"), F.col("__qnrm")).desc_nulls_last(), F.col("__cid").asc()
    )
    probes = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("__rn", F.row_number().over(w_probe))
        .filter(F.col("__rn") <= nprobe)
        .select(query_id_col, "__cid", "__qvec", "__qnrm")
    )

    scored = (
        inv.join(F.broadcast(probes), "__cid")
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            F.col(query_id_col),
            F.col(id_col),
            F.when(
                (F.col("__nrm") > 0) & (F.col("__qnrm") > 0),
                dot(F.col(vec_col), F.col("__qvec"), dim) / (F.col("__nrm") * F.col("__qnrm")),
            ).alias("cos_sim"),
        )
    )
    w_rank = Window.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
    return scored.withColumn("rank", F.row_number().over(w_rank)).filter(F.col("rank") <= k)
