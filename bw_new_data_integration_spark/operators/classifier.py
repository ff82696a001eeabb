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
  same k×dim-class round-trip MLlib itself does); each iteration they
  enter the plan as ONE pre-folded array<double> literal and the margin
  rides a doc-partitioned window sum over the cached feature layout,
  then the gradient an idx-keyed aggregate. No join anywhere in the
  loop, one tiny shuffle per iteration, no corpus collect ever.
- **Determinism**: every cross-row float sum is accumulated as
  floor-scaled integers (bit-stable under any partial-agg order /
  parallelism — the repo's determinism contract), and the link
  function is the RATIONAL fast sigmoid ``0.5 + z/(2(1+|z|))`` (exact
  in IEEE for identical inputs on any engine; no libm exp whose last
  ULP differs across platforms). Training is therefore bit-reproducible
  across runs and cluster layouts.

At 100 TB: the featurize explode is map-local; the features are hash-
partitioned and sorted by doc ONCE (the only feature-sized shuffle of
the whole fit); per iteration the plan is a window sum reusing that
cached layout plus one groupBy(idx) whose map-side combine reduces to
at most ``dim`` keys per partition — wire volume per iteration is
O(dim × partitions), not O(tokens) or O(docs). Scoring is one
doc-keyed aggregate pass with the final weights.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame, SparkSession, Window
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
    """(id, z): fixed-point-summed linear margin w·x + b.

    The weights enter the plan as ONE array literal of dim+1 doubles
    ([b, w_0, ..., w_dim-1], looked up per row with ``element_at`` at
    position idx+2, bias idx=-1 -> position 1). The r13 shape — a
    broadcast-joined (idx, w) table rebuilt per iteration — cost a
    driver createDataFrame, a BroadcastExchange job and a join stage
    every iteration; the literal is a few KB riding the task binary
    and leaves the margin as a single scan+aggregate (guide §1.2/§3:
    the optimizer can never pick a worse strategy than "no join").
    Arithmetic unchanged: x * w[idx] on the same doubles, same
    fixed-point floor/sum — bit-identical margins."""
    wx = F.col("x") * F.element_at(_weight_array(w, b), F.col("idx") + F.lit(2))
    return (
        feats_b.groupBy(id_col)
        .agg(F.sum(F.floor(wx * _SCALE).cast("bigint")).alias("zs"))
        .select(id_col, (F.col("zs") / _SCALE).alias("z"))
    )


def _weight_array(w: list[float], b: float):
    """array<double> literal [b, w_0, ..., w_dim-1], constructed as ONE
    pre-folded JVM Literal.

    Why not the obvious spellings (both measured at dim=1024):
    ``F.lit(list)`` crosses py4j element by element (~0.7 s per call —
    would dwarf the join it replaces), and an ``F.expr("array(...)")``
    string parses fast but yields an UNFOLDED CreateArray with dim+1
    child literals that every analyzer pass then walks (~0.3-1.0 s of
    driver time per iteration). Packing the doubles into a bytearray
    (ONE py4j transfer), bulk-converting to double[] via a ByteBuffer,
    and calling Scala ``functions.lit(double[])`` produces a single
    already-folded Literal leaf — microseconds to analyze. Bit-exact
    by construction (raw IEEE bytes, no decimal round-trip). Sessions
    without a py4j gateway (Spark Connect) fall back to the expr
    string, whose decimal round-trip is also exact (python repr is the
    shortest round-tripping decimal; parseDouble is correctly
    rounded)."""
    vals = [float(b)] + [float(v) for v in w]
    try:
        from pyspark.sql import SparkSession
        from pyspark.sql.classic.column import Column as _ClassicColumn

        spark = SparkSession.getActiveSession()
        jvm = spark._jvm
        gw = spark.sparkContext._gateway
        bb = jvm.java.nio.ByteBuffer.wrap(
            bytearray(struct.pack(f"<{len(vals)}d", *vals))
        )
        bb.order(jvm.java.nio.ByteOrder.LITTLE_ENDIAN)
        jarr = gw.new_array(jvm.double, len(vals))
        bb.asDoubleBuffer().get(jarr)
        return _ClassicColumn(jvm.org.apache.spark.sql.functions.lit(jarr))
    except Exception:
        return F.expr(
            "array(" + ",".join(repr(v) + "D" for v in vals) + ")"
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
    feats_b: DataFrame | None = None,
) -> dict:
    """Full-batch gradient training of a linear classifier with the
    logistic update rule ``grad = (sigma(z) - y) * x`` (rational fast
    sigmoid). Returns ``{"w": [dim floats], "b": float, "dim": int,
    "mode": str, "n": int}`` — the whole model is dim+1 driver-side floats.

    ``feats_b`` optionally supplies the precomputed
    ``featurize_hashed(...) + _with_bias_feature(...)`` frame for the
    SAME (df, text_col, id_col, dim, mode) — callers that also score
    the training frame featurize once and share the pin (guide §1.2).
    Ids must be unique per document (they are keys).

    The iteration plan is join-free (r14; the r13 shape paid a weight
    broadcast-join, a label join and an err join-back EVERY iteration —
    ~6 Spark jobs each): the features+label frame is hash-partitioned
    and sorted by id ONCE and cached (``persist`` — unlike
    ``localCheckpoint`` it keeps outputPartitioning/ordering, so the
    planner re-uses the layout; MEMORY_AND_DISK spills gracefully at
    scale; unpersisted before returning), the margin rides a
    ``sum() OVER (PARTITION BY id)`` window that needs NO exchange and
    NO sort over the cached layout, err is a per-row expression, and
    the per-feature gradient is ONE idx-keyed aggregate (map-side
    combine onto <= dim keys, a dim-row collect). Iteration 1 skips
    even the window: with w = 0, b = 0 every margin is exactly 0
    (floor(x*0*SCALE) = 0 for all finite x), so err = 0.5 - y.
    Deterministic end to end: fixed-point sums + rational link +
    driver-held float state; per-row doubles identical to the joined
    form, so the fitted weights are bit-identical."""
    if feats_b is None:
        feats_b = _with_bias_feature(
            featurize_hashed(df, text_col, id_col, dim, mode), df, id_col
        )
    labels = df.select(id_col, F.col(label_col).cast("double").alias("y"))
    # one cached frame carries features AND the label, laid out by id
    feats_y = (
        feats_b.join(labels, id_col)
        .repartition(id_col)
        .sortWithinPartitions(id_col)
        .persist()
    )
    try:
        n = feats_y.where(F.col("idx") == -1).count()  # fills the cache
        if n == 0:
            raise ValueError("fit_linear_text_classifier: empty input")
        win = Window.partitionBy(id_col)
        w = [0.0] * dim
        b = 0.0
        for it in range(iters):
            if it == 0 and b == 0.0:
                err = F.lit(0.5) - F.col("y")
            else:
                wx = F.col("x") * F.element_at(
                    _weight_array(w, b), F.col("idx") + F.lit(2)
                )
                z = F.sum(F.floor(wx * _SCALE).cast("bigint")).over(win) / _SCALE
                # fast sigmoid + error on the quantized z, per row
                err = (
                    F.lit(0.5) + z / (F.lit(2.0) * (F.lit(1.0) + F.abs(z)))
                    - F.col("y")
                )
            # ONE idx-keyed aggregate per iteration covers every weight
            # AND the bias (idx = -1); <= dim+1 rows cross the driver
            grad_rows = (
                feats_y.select(
                    "idx",
                    F.floor(err * F.col("x") * _SCALE).cast("bigint").alias("gg"),
                )
                .groupBy("idx")
                .agg(F.sum("gg").alias("gs"))
                .collect()
            )
            for r in grad_rows:
                g = lr * (r["gs"] / _SCALE) / n
                if r["idx"] < 0:
                    b -= g
                else:
                    w[r["idx"]] -= g
    finally:
        feats_y.unpersist()
    return {"w": w, "b": b, "dim": dim, "mode": mode, "n": n}


def score_linear_text_classifier(
    spark: SparkSession,
    df: DataFrame,
    model: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "prob",
    feats_b: DataFrame | None = None,
) -> DataFrame:
    """(id, prob): fast-sigmoid probability under the trained model —
    one doc-keyed aggregate over the corpus (weights enter as an array
    literal, see ``_margins``). The bias feature rides every document
    (including token-less ones), so scoring is total: every input id
    comes back exactly once. ``feats_b`` optionally reuses the
    featurize output already built (and typically pinned) by
    ``fit_linear_text_classifier`` on the same inputs — the corpus is
    then featurized once per fit+score pipeline, not twice."""
    if feats_b is None:
        feats_b = _with_bias_feature(
            featurize_hashed(
                df, text_col, id_col, model["dim"], model.get("mode", "binary")
            ),
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
