"""Hashed linear text classifier (fasttext-style) for quality/domain
scoring — the "wiki-like?" document scorer LLM data pipelines train on
weak labels and sweep over the whole corpus (beyond-reference;
GPT-3/LLaMA-class curation step).

Design, mirroring ``operators/kmeans.py``'s distributed-iterative
pattern:

- **Features**: hashing trick — unigram tokens map to ``pmod(
  xxhash64(token), dim)`` buckets; per-doc term frequencies normalized
  by document length. No vocabulary object, no driver-side dictionary:
  the feature space is fixed at ``dim`` and the transform is pure
  column expressions.
- **Model**: weights live on the DRIVER (``dim`` floats + bias — the
  same k×dim-class round-trip MLlib itself does); each iteration
  broadcasts them as a tiny (idx, w) table and computes margins with an
  equi-join + doc-keyed aggregate, then the gradient with an idx-keyed
  aggregate. Two shuffles per iteration, no corpus collect ever.
- **Determinism**: every cross-row float sum is accumulated as
  floor-scaled integers (bit-stable under any partial-agg order /
  parallelism — the repo's determinism contract), and the link
  function is the RATIONAL fast sigmoid ``0.5 + z/(2(1+|z|))`` (exact
  in IEEE for identical inputs on any engine; no libm exp whose last
  ULP differs across platforms). Training is therefore bit-reproducible
  across runs and cluster layouts.

At 100 TB: the featurize explode is map-local; per iteration the plan
is one broadcast-join + groupBy(doc) and one groupBy(idx) with map-side
combine onto at most ``dim`` keys — both partial-aggregate before the
shuffle, so wire volume per iteration is O(docs + dim), not O(tokens).
Scoring is a single such pass with the final weights.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bw_new_data_integration_spark.functions.text import tokens

# fixed-point scale for cross-partition sums: floor(x * SCALE) summed as
# longs. 2^40 keeps per-term quantization ~1e-12 while a billion-row sum
# stays far inside int64 for |x| <= ~8e3.
_SCALE = float(2**40)


def _fast_sigmoid(z: float) -> float:
    """Rational sigmoid 0.5 + z / (2(1+|z|)): monotone, bounded (0,1),
    and free of transcendental libm calls — bit-identical everywhere."""
    return 0.5 + z / (2.0 * (1.0 + abs(z)))


def featurize_hashed(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 4096,
    mode: str = "binary",
) -> DataFrame:
    """(id, idx, x): hashed-unigram features. ``mode="binary"`` (the
    default, and what a presence-concept classifier needs — a tf/len
    feature for a token that is 0.5%% of a long document carries
    almost no gradient) sets x = 1 per distinct bucket; ``mode="tf"``
    gives length-normalized term frequency. Both are rational, so
    downstream fixed-point sums are deterministic."""
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("term")
    )
    by_idx = toks.groupBy(
        id_col, F.pmod(F.xxhash64("term"), F.lit(dim)).cast("int").alias("idx")
    ).agg(F.count("*").alias("cnt"))
    if mode == "binary":
        return by_idx.select(id_col, "idx", F.lit(1.0).alias("x"))
    if mode != "tf":
        raise ValueError(f"featurize_hashed: unknown mode {mode!r}")
    total = by_idx.groupBy(id_col).agg(F.sum("cnt").alias("len"))
    return by_idx.join(total, id_col).select(
        id_col, "idx", (F.col("cnt") / F.col("len")).cast("double").alias("x")
    )


def _with_bias_feature(feats: DataFrame, df: DataFrame, id_col: str) -> DataFrame:
    """Append the intercept as feature idx = -1 with x = 1 for EVERY
    document (including token-less ones, which featurize drops): the
    bias then rides the same margin aggregate and the same gradient
    groupBy as every weight — one plan, no second bias job."""
    bias_rows = df.select(
        F.col(id_col), F.lit(-1).alias("idx"), F.lit(1.0).alias("x")
    )
    return feats.unionByName(bias_rows)


def _margins(
    spark: SparkSession, feats_b: DataFrame, w: list[float], b: float, id_col: str
) -> DataFrame:
    """(id, z): fixed-point-summed linear margin w·x + b, with the bias
    as the idx = -1 row of the broadcast weight table."""
    wdf = F.broadcast(
        spark.createDataFrame(
            [(i, w[i]) for i in range(len(w))] + [(-1, float(b))], "idx int, w double"
        )
    )
    return (
        feats_b.join(wdf, "idx")
        .groupBy(id_col)
        .agg(
            F.sum(F.floor(F.col("x") * F.col("w") * _SCALE).cast("bigint")).alias("zs")
        )
        .select(id_col, (F.col("zs") / _SCALE).alias("z"))
    )


def fit_linear_text_classifier(
    spark: SparkSession,
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 4096,
    iters: int = 8,
    lr: float = 2.0,
    mode: str = "binary",
) -> dict:
    """Full-batch gradient training of a linear classifier with the
    logistic update rule ``grad = (sigma(z) - y) * x`` (rational fast
    sigmoid). Returns ``{"w": [dim floats], "b": float, "dim": int,
    "mode": str, "n": int}`` — the whole model is dim+1 driver-side floats.

    Per iteration: broadcast weights in, margins via ONE doc-keyed
    aggregate, per-feature gradient via ONE idx-keyed aggregate
    (map-side combine onto <= dim keys), a dim-row collect, and a
    driver-side weight update. Deterministic end to end: fixed-point
    sums + rational link + driver-held float state."""
    feats_b = _with_bias_feature(
        featurize_hashed(df, text_col, id_col, dim, mode), df, id_col
    ).localCheckpoint(eager=True)
    labels = df.select(id_col, F.col(label_col).cast("double").alias("y"))
    n = labels.count()
    if n == 0:
        raise ValueError("fit_linear_text_classifier: empty input")
    w = [0.0] * dim
    b = 0.0
    for _ in range(iters):
        z = _margins(spark, feats_b, w, b, id_col)
        err = (
            z.join(labels, id_col)
            # fast sigmoid + error, expressed in-plan on the quantized z
            .select(
                id_col,
                (
                    F.lit(0.5)
                    + F.col("z") / (F.lit(2.0) * (F.lit(1.0) + F.abs(F.col("z"))))
                    - F.col("y")
                ).alias("err"),
            )
        )
        # ONE idx-keyed aggregate per iteration covers every weight AND
        # the bias (idx = -1); <= dim+1 rows cross the driver
        grad_rows = (
            feats_b.join(err, id_col)
            .groupBy("idx")
            .agg(
                F.sum(
                    F.floor(F.col("err") * F.col("x") * _SCALE).cast("bigint")
                ).alias("gs")
            )
            .collect()
        )
        for r in grad_rows:
            g = lr * (r["gs"] / _SCALE) / n
            if r["idx"] < 0:
                b -= g
            else:
                w[r["idx"]] -= g
    return {"w": w, "b": b, "dim": dim, "mode": mode, "n": n}


def score_linear_text_classifier(
    spark: SparkSession,
    df: DataFrame,
    model: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "prob",
) -> DataFrame:
    """(id, prob): fast-sigmoid probability under the trained model —
    one broadcast join + one doc-keyed aggregate over the corpus. The
    bias feature rides every document (including token-less ones), so
    scoring is total: every input id comes back exactly once."""
    feats_b = _with_bias_feature(
        featurize_hashed(df, text_col, id_col, model["dim"], model.get("mode", "binary")),
        df,
        id_col,
    )
    z = _margins(spark, feats_b, model["w"], model["b"], id_col)
    return z.select(
        id_col,
        (
            F.lit(0.5) + F.col("z") / (F.lit(2.0) * (F.lit(1.0) + F.abs(F.col("z"))))
        ).alias(out_col),
    )
