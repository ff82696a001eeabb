"""Query registry: one entry per implemented operator (SURVEY.md §2).

Each query is a ``(spark, sf_dir) -> DataFrame`` callable built from the
engine's operator/function modules, paired with an ANSI-SQL oracle that
DuckDB executes on the same parquet tables. The driver (and
tests/test_oracle_parity.py) hash-compares the two — so every
expression here follows the cross-engine determinism rules:

- aggregates of doubles go through **exact decimal** accumulation and
  surface as double (partial-agg order can't flip bits),
- integer outputs are ``bigint`` on both sides,
- hashes are md5-hex (identical in Spark and DuckDB),
- event timestamps are microsecond-truncated on both sides
  (see catalog.load),
- ties in any ranking are broken by a unique key.

Naming: ``a*/f*/j*/k*/p*/c*/o*`` follow SURVEY.md §2's operator IDs;
``dedup_* / ann_* / text_*`` are the beyond-reference training-data
operators.
"""

from __future__ import annotations

from collections.abc import Callable

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
from bw_new_data_integration_spark.session import tune_for_oracle_parity

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _REGISTRY[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def registry() -> dict[str, QueryFn]:
    return dict(_REGISTRY)


def oracles() -> dict[str, str]:
    return dict(_ORACLES)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune_for_oracle_parity(spark)
    return catalog.load(spark, sf_dir, name)


def _fanout(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Spread a CPU-bound mapInPandas input across every core. A
    small parquet table arrives as ONE scan partition, which would run
    the Python decode kernels in a single task; the rows-only shuffle
    is trivial next to the per-row codec work. Same discipline at
    cluster scale: repartition decode inputs to the executor count."""
    return df.repartition(spark.sparkContext.defaultParallelism)


def _collect_capped(df: DataFrame, cap: int, what: str) -> list:
    """Driver-side collect with a hard row cap for FIXTURE SEEDING only
    (synthesizing an in-memory OData server / Excel workbook from a
    parquet table). Fails loud instead of OOM-ing the driver if someone
    points a fixture query at a high SF: collect(cap+1) bounds driver
    memory to cap+1 rows even in the failure case."""
    rows = df.limit(cap + 1).collect()
    if len(rows) > cap:
        raise ValueError(
            f"{what}: fixture-seeding collect exceeds cap ({cap} rows) — "
            "this query synthesizes a driver-side fixture and is bench-SF "
            "only; run it at sf<=0.1 or raise the cap deliberately"
        )
    return rows


# ===========================================================================
# Beyond-reference: training-data pipeline operators over documents /
# embeddings. Oracle SQL for the hash-based ops is GENERATED from the
# same constants the Spark operators use, so both engines execute the
# same algorithm definition.
# ===========================================================================

_SHINGLE_SQL = r"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> t != '') AS w
  FROM documents
),
sh AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(len(w) - 2, 1) + 1),
                               i -> array_to_string(w[i:i+2], ' '))) AS s
  FROM toks
)
"""


def _minhash_select_sql(num_hashes: int) -> str:
    # mirrors dedup.minhash_signatures: hash i = 32-bit hex chunk i of
    # md5(shingle) for i<4, of sha256(shingle) for i>=4
    mins = ",\n       ".join(
        (
            f"min(substr(md5(s), {i * 8 + 1}, 8)) AS mh_{i}"
            if i < 4
            else f"min(substr(sha256(s), {(i - 4) * 8 + 1}, 8)) AS mh_{i}"
        )
        for i in range(num_hashes)
    )
    return _SHINGLE_SQL + f"SELECT doc_id, {mins}\nFROM sh GROUP BY doc_id"


# ---------------------------------------------------------------------------
# Banded minhash LSH candidate pairs (12 hashes, 4 bands of 3).
# ---------------------------------------------------------------------------
def _lsh_oracle(num_hashes: int = 12, bands: int = 4) -> str:
    rpb = num_hashes // bands
    band_structs = ", ".join(
        "{{'band': {b}, 'bh': md5(concat_ws('|', {parts}))}}".format(
            b=b, parts=", ".join(f"mh_{b * rpb + r}" for r in range(rpb))
        )
        for b in range(bands)
    )
    return (
        _minhash_select_sql(num_hashes).replace("WITH toks", "WITH sig AS (\nWITH toks", 1)
        + """),
buckets AS (
  SELECT doc_id, unnest([{band_structs}], recursive := true)
  FROM sig
)
SELECT DISTINCT l.doc_id AS a_id, r.doc_id AS b_id
FROM buckets l JOIN buckets r
  ON l.band = r.band AND l.bh = r.bh AND l.doc_id < r.doc_id
""".format(band_structs=band_structs)
    )


# ---------------------------------------------------------------------------
# LSH skew guard: degenerate buckets (boilerplate) capped to hub-star
# pairing — output and task time linear in bucket size, component
# reachability preserved (operators/dedup.py minhash_lsh_candidates
# max_bucket_size).
# ---------------------------------------------------------------------------
_BOILER_TEXT = (
    "terms of service boilerplate all rights reserved "
    "contact us for more information about this product"
)


def _capped_lsh_oracle(
    num_hashes: int = 12, bands: int = 4, cap: int = 10, n_boiler: int = 40
) -> str:
    rpb = num_hashes // bands
    band_structs = ", ".join(
        "{{'band': {b}, 'bh': md5(concat_ws('|', {parts}))}}".format(
            b=b, parts=", ".join(f"mh_{b * rpb + r}" for r in range(rpb))
        )
        for b in range(bands)
    )
    corpus = (
        "SELECT doc_id, text FROM documents UNION ALL\n"
        f"  SELECT 1000000 + i AS doc_id, '{_BOILER_TEXT}' AS text FROM range({n_boiler}) t(i)"
    )
    base = _minhash_select_sql(num_hashes).replace("FROM documents", "FROM corpus", 1)
    base = base.replace(
        "WITH toks", f"WITH sig AS (\nWITH corpus AS (\n  {corpus}\n),\ntoks", 1
    )
    return (
        base
        + """),
buckets AS (
  SELECT doc_id, unnest([{band_structs}], recursive := true) FROM sig
),
sized AS (
  SELECT doc_id, band, bh,
         COUNT(*) OVER (PARTITION BY band, bh) AS bn,
         MIN(doc_id) OVER (PARTITION BY band, bh) AS hub
  FROM buckets
)
SELECT DISTINCT a_id, b_id FROM (
  SELECT l.doc_id AS a_id, r.doc_id AS b_id
  FROM sized l JOIN sized r
    ON l.band = r.band AND l.bh = r.bh AND l.doc_id < r.doc_id AND l.bn <= {cap}
  UNION ALL
  SELECT hub AS a_id, doc_id AS b_id FROM sized WHERE bn > {cap} AND doc_id <> hub
) p
""".format(band_structs=band_structs, cap=cap)
    )


# ---------------------------------------------------------------------------
# SimHash (60-bit, md5-derived token hashes) — generated bit-vote SQL.
# ---------------------------------------------------------------------------
def _simhash_oracle(bits: int = 60) -> str:
    votes = ",\n       ".join(
        f"SUM(CASE WHEN (th & (1::BIGINT << {b})) <> 0 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(bits)
    )
    fp = " + ".join(f"CASE WHEN v{b} > 0 THEN (1::BIGINT << {b}) ELSE 0 END" for b in range(bits))
    return rf"""
WITH toks AS (
  SELECT DISTINCT doc_id, t AS tok
  FROM (SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> x != '')) AS t
        FROM documents)
),
hashed AS (
  SELECT doc_id, CAST(('0x' || substring(md5(tok), 1, 15))::UBIGINT AS BIGINT) AS th FROM toks
),
voted AS (
  SELECT doc_id, {votes}
  FROM hashed GROUP BY doc_id
)
SELECT doc_id, {fp} AS simhash FROM voted
"""


# ---------------------------------------------------------------------------
# Embedding-cosine near-duplicate pairs (threshold 0.3 — the synthetic
# embeddings top out around cos 0.51).
# ---------------------------------------------------------------------------
# DuckDB dot product mirroring Spark's sequential left-fold in double —
# list_inner_product is NOT bit-stable vs the fold (different summation
# order), so the oracle spells out the same zip→cast→multiply→sum.
def _dot_sql(x: str, y: str) -> str:
    return (
        f"list_sum(list_transform(list_zip({x}, {y}), "
        "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
    )


_COS_SQL = (
    f"{_dot_sql('a.embedding', 'b.embedding')}"
    f" / (sqrt({_dot_sql('a.embedding', 'a.embedding')})"
    f" * sqrt({_dot_sql('b.embedding', 'b.embedding')}))"
)


# ---------------------------------------------------------------------------
# Text quality scoring: length/punct/stopword/token-length heuristics.
# ---------------------------------------------------------------------------
_STOPWORD_LIST_SQL = "[" + ", ".join(f"'{w}'" for w in text.EN_STOPWORDS) + "]"


# ---------------------------------------------------------------------------
# Language ID: stopword-marker argmax, deterministic tie-break.
# ---------------------------------------------------------------------------
def _lang_id_oracle() -> str:
    langs = sorted(text.LANG_MARKERS)
    score_cols = ",\n         ".join(
        "len(list_filter(w, t -> list_contains([{m}], t))) AS s_{lang}".format(
            m=", ".join(f"'{w}'" for w in text.LANG_MARKERS[lang]), lang=lang
        )
        for lang in langs
    )
    best = "'und'"
    best_score = "0"
    for lang in langs:
        best = f"CASE WHEN s_{lang} > ({best_score}) THEN '{lang}' ELSE ({best}) END"
        best_score = f"CASE WHEN s_{lang} > ({best_score}) THEN s_{lang} ELSE ({best_score}) END"
    return rf"""
WITH toks AS (
  SELECT doc_id, lang, list_filter(string_split_regex(lower(text), '\s+'), t -> t != '') AS w
  FROM documents
),
scores AS (
  SELECT doc_id, lang,
         {score_cols}
  FROM toks
)
SELECT doc_id, lang AS lang_actual, {best} AS lang_pred FROM scores
"""


# ===========================================================================
# Config-compiled pipelines (the reference's core workflow): YAML spec →
# Catalyst plan → typed, keyed output. These two entries prove the
# whole compiler chain — aggregate grain, type coercion, business-key
# template, filters — against SQL oracles.
# ===========================================================================

import os as _os

# three dirnames: _shared.py lives in the queries/ subpackage since the
# round-6 split, so the repo root is one level further up
_PIPELINES_YAML = _os.path.join(
    _os.path.dirname(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    ),
    "pipelines",
    "pipelines.yaml",
)


def _pipeline(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from bw_new_data_integration_spark.plans import pipeline as plans

    tune_for_oracle_parity(spark)
    specs = plans.load_pipelines(_PIPELINES_YAML)
    return plans.run_pipeline(spark, specs, name, sf_dir)


# ---------------------------------------------------------------------------
# ANN, scale path: sign-LSH bucketed top-k. The oracle SQL is GENERATED
# from the same seeded hyperplanes the Spark operator uses, so both
# engines execute the identical algorithm (bucket assignment included).
# ---------------------------------------------------------------------------
def _lsh_topk_oracle(k: int = 10, n_planes: int = 8, dim: int = 64, seed: int = 7) -> str:
    planes = similarity.hyperplanes(dim, n_planes, seed)
    sig_terms = []
    for i, p in enumerate(planes):
        arr = "[" + ", ".join(repr(float(x)) for x in p) + "]"
        sig_terms.append(
            f"(CASE WHEN {_dot_sql('embedding', arr)} >= 0 THEN {1 << i} ELSE 0 END)"
        )
    sig = "\n           + ".join(sig_terms)
    return f"""
WITH c AS (
  SELECT vec_id, embedding,
         sqrt({_dot_sql('embedding', 'embedding')}) AS nrm,
         {sig} AS bucket
  FROM embeddings
),
q AS (
  SELECT vec_id AS query_id, embedding AS qemb, nrm AS qnrm, bucket
  FROM c WHERE vec_id < 5
),
scored AS (
  SELECT q.query_id, c.vec_id,
         CASE WHEN c.nrm > 0 AND q.qnrm > 0
              THEN {_dot_sql('c.embedding', 'q.qemb')} / (c.nrm * q.qnrm) END AS cos_sim
  FROM c JOIN q ON c.bucket = q.bucket AND c.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, vec_id, cos_sim,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, cos_sim, CAST(rank AS BIGINT) AS rank FROM ranked WHERE rank <= {k}
"""


def _lsh_multiprobe_oracle(k: int = 10, n_planes: int = 8, dim: int = 64, seed: int = 7) -> str:
    """Same generated-signature technique as _lsh_topk_oracle, plus a
    probe fan-out CTE: probe 0 is the query's own bucket, probe i is
    the bucket with bit i-1 flipped (xor)."""
    planes = similarity.hyperplanes(dim, n_planes, seed)
    sig_terms = []
    for i, p in enumerate(planes):
        arr = "[" + ", ".join(repr(float(x)) for x in p) + "]"
        sig_terms.append(
            f"(CASE WHEN {_dot_sql('embedding', arr)} >= 0 THEN {1 << i} ELSE 0 END)"
        )
    sig = "\n           + ".join(sig_terms)
    return f"""
WITH c AS (
  SELECT vec_id, embedding,
         sqrt({_dot_sql('embedding', 'embedding')}) AS nrm,
         {sig} AS bucket
  FROM embeddings
),
q AS (
  SELECT vec_id AS query_id, embedding AS qemb, nrm AS qnrm, bucket
  FROM c WHERE vec_id < 5
),
probes AS (
  SELECT q.query_id, q.qemb, q.qnrm,
         CASE WHEN t.r = 0 THEN q.bucket
              ELSE xor(q.bucket, CAST(power(2, t.r - 1) AS BIGINT)) END AS pbucket
  FROM q, range(0, {n_planes + 1}) t(r)
),
scored AS (
  SELECT p.query_id, c.vec_id,
         CASE WHEN c.nrm > 0 AND p.qnrm > 0
              THEN {_dot_sql('c.embedding', 'p.qemb')} / (c.nrm * p.qnrm) END AS cos_sim
  FROM c JOIN probes p ON c.bucket = p.pbucket AND c.vec_id <> p.query_id
),
ranked AS (
  SELECT query_id, vec_id, cos_sim,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, cos_sim, CAST(rank AS BIGINT) AS rank FROM ranked WHERE rank <= {k}
"""


def _xmla_cube_fixture(spark: SparkSession, sf_dir: str):
    """Shared fake-SOAP cube for the S1 queries: per-fiscal-year canned
    responses derived from orders, plus the slice MDX map. Returns
    (execute, mdx_by_slice)."""
    import re as _re

    from bw_new_data_integration_spark.operators import aggregate as _agg

    o = _t(spark, sf_dir, "orders")
    agg_rows = (
        o.groupBy(F.year("o_orderdate").alias("fy"), "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            _agg.exact_sum("o_totalprice").alias("sum_totalprice"),
        )
        .orderBy("fy", "o_orderpriority")
        .collect()
    )
    by_year: dict[int, list] = {}
    for r in agg_rows:
        by_year.setdefault(r["fy"], []).append(r)
    measures = ["n_orders", "sum_totalprice"]

    def execute(mdx: str) -> str:
        from bw_new_data_integration_spark.sources.xmla import render_mddataset

        y = int(_re.search(r"\[FY(\d+)\]", mdx).group(1))
        rows = by_year[y]
        return render_mddataset(
            measures,
            [[("[Order].[Priority]", r["o_orderpriority"])] for r in rows],
            [[repr(r[m]) for m in measures] for r in rows],
        )

    mdx_by_slice = {
        str(y): f"SELECT ... ON COLUMNS, ... ON ROWS FROM [Cube] WHERE [Time].[FY{y}]"
        for y in sorted(by_year)
    }
    return execute, mdx_by_slice


# ---------------------------------------------------------------------------
# ANN, IVF variant: inverted lists under deterministic centroids,
# nprobe nearest lists scored per query. The oracle is the same
# algorithm in SQL — centroids come from the table itself, so no
# generated constants are needed.
# ---------------------------------------------------------------------------
_IVF_COS_CENT = (
    f"CASE WHEN x.nrm > 0 AND cent.cnrm > 0 THEN "
    f"{_dot_sql('x.embedding', 'cent.cemb')} / (x.nrm * cent.cnrm) END"
)


# ---------------------------------------------------------------------------
# Embedding near-dups, scale path: candidates restricted to sign-LSH
# buckets, exact cosine verification inside. Oracle generated from the
# same seeded hyperplanes.
# ---------------------------------------------------------------------------
def _near_dup_lsh_oracle(threshold: float = 0.3, n_planes: int = 4, dim: int = 64, seed: int = 7) -> str:
    planes = similarity.hyperplanes(dim, n_planes, seed)
    sig_terms = []
    for i, p in enumerate(planes):
        arr = "[" + ", ".join(repr(float(x)) for x in p) + "]"
        sig_terms.append(
            f"(CASE WHEN {_dot_sql('embedding', arr)} >= 0 THEN {1 << i} ELSE 0 END)"
        )
    sig = "\n           + ".join(sig_terms)
    return f"""
WITH s AS (
  SELECT vec_id, embedding,
         sqrt({_dot_sql('embedding', 'embedding')}) AS nrm,
         {sig} AS bucket
  FROM embeddings
)
SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       {_dot_sql('a.embedding', 'b.embedding')} / (a.nrm * b.nrm) AS cos_sim
FROM s a JOIN s b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE a.nrm > 0 AND b.nrm > 0
  AND {_dot_sql('a.embedding', 'b.embedding')} / (a.nrm * b.nrm) >= {threshold}
"""


# ---------------------------------------------------------------------------
# Corpus term statistics (operators/corpus.py): per-doc salient terms
# and unigram rarity — the CCNet-style curation signals. Ranking and
# the gate's output columns are integer/rational only, so the oracle
# match is bit-exact (no transcendental floats in the compare).
# ---------------------------------------------------------------------------
_TOKS_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'), t -> t != '')) AS term
  FROM documents
)
"""


# ---------------------------------------------------------------------------
# Duplicate clustering + keep-list: verified near-dup pairs (n-gram
# Jaccard >= 0.5) grouped into connected components by min-label
# propagation; canonical doc = cluster minimum. The oracle unrolls the
# same fixed number of propagation rounds in SQL.
# ---------------------------------------------------------------------------
def _cluster_oracle(max_iter: int = 5) -> str:
    jaccard_pairs = (
        _SHINGLE_SQL
        + """,
dsh AS (SELECT DISTINCT doc_id, s FROM sh),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM dsh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_inter
  FROM dsh a JOIN dsh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT a_id, b_id FROM inter
  JOIN sizes sa ON inter.a_id = sa.doc_id
  JOIN sizes sb ON inter.b_id = sb.doc_id
  WHERE CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) >= 0.5
),
edges AS (
  SELECT a_id AS u, b_id AS v FROM pairs UNION ALL SELECT b_id AS u, a_id AS v FROM pairs
),
l0 AS (SELECT doc_id, doc_id AS lbl FROM documents)"""
    )
    steps = []
    for i in range(max_iter):
        steps.append(
            f""",
l{i + 1} AS (
  SELECT d.doc_id,
         least(d.lbl, coalesce(min(x.lbl), d.lbl)) AS lbl
  FROM l{i} d
  LEFT JOIN edges e ON e.u = d.doc_id
  LEFT JOIN l{i} x ON x.doc_id = e.v
  GROUP BY d.doc_id, d.lbl
)"""
        )
    return (
        jaccard_pairs
        + "".join(steps)
        + f"""
SELECT doc_id, lbl AS cluster_id, lbl = doc_id AS is_canonical FROM l{max_iter}
"""
    )


# ---------------------------------------------------------------------------
# End-to-end dedup pipeline — the 100 TB composition: LSH candidate
# generation (never all-pairs) -> exact Jaccard verification on
# candidates only -> connected-component clustering -> keep-list.
# One generated oracle replays every stage.
# ---------------------------------------------------------------------------
def _dedup_e2e_oracle(
    num_hashes: int = 12,
    bands: int = 4,
    threshold: float = 0.5,
    max_iter: int = 5,
    final_select: str | None = None,
    cap: int | None = 8,
) -> str:
    rpb = num_hashes // bands
    mins = ",\n       ".join(
        (
            f"min(substr(md5(s), {i * 8 + 1}, 8)) AS mh_{i}"
            if i < 4
            else f"min(substr(sha256(s), {(i - 4) * 8 + 1}, 8)) AS mh_{i}"
        )
        for i in range(num_hashes)
    )
    band_structs = ", ".join(
        "{{'band': {b}, 'bh': md5(concat_ws('|', {parts}))}}".format(
            b=b, parts=", ".join(f"mh_{b * rpb + r}" for r in range(rpb))
        )
        for b in range(bands)
    )
    prop = []
    for i in range(max_iter):
        prop.append(
            f""",
l{i + 1} AS (
  SELECT d.doc_id, least(d.lbl, coalesce(min(x.lbl), d.lbl)) AS lbl
  FROM l{i} d
  LEFT JOIN edges e ON e.u = d.doc_id
  LEFT JOIN l{i} x ON x.doc_id = e.v
  GROUP BY d.doc_id, d.lbl
)"""
        )
    # candidate CTE: uncapped all-pairs, or the hub-star skew cap
    # (buckets past `cap` pair every member with the bucket min only —
    # identical to minhash_lsh_candidates(max_bucket_size=cap))
    if cap is None:
        cand_sql = """cand AS (
  SELECT DISTINCT l.doc_id AS a_id, r.doc_id AS b_id
  FROM buckets l JOIN buckets r ON l.band = r.band AND l.bh = r.bh AND l.doc_id < r.doc_id
),"""
    else:
        cand_sql = f"""sized AS (
  SELECT doc_id, band, bh,
         COUNT(*) OVER (PARTITION BY band, bh) AS bn,
         MIN(doc_id) OVER (PARTITION BY band, bh) AS hub
  FROM buckets
),
cand AS (
  SELECT DISTINCT a_id, b_id FROM (
    SELECT l.doc_id AS a_id, r.doc_id AS b_id
    FROM sized l JOIN sized r
      ON l.band = r.band AND l.bh = r.bh AND l.doc_id < r.doc_id AND l.bn <= {cap}
    UNION ALL
    SELECT hub AS a_id, doc_id AS b_id FROM sized WHERE bn > {cap} AND doc_id <> hub
  ) p
),"""
    return (
        _SHINGLE_SQL
        + f""",
sig AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
buckets AS (
  SELECT doc_id, unnest([{band_structs}], recursive := true) FROM sig
),
{cand_sql}
dsh AS (SELECT DISTINCT doc_id, s FROM sh),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM dsh GROUP BY doc_id),
inter AS (
  SELECT c.a_id, c.b_id, count(*) AS n_inter
  FROM cand c
  JOIN dsh a ON a.doc_id = c.a_id
  JOIN dsh b ON b.doc_id = c.b_id AND b.s = a.s
  GROUP BY 1, 2
),
pairs AS (
  SELECT a_id, b_id FROM inter
  JOIN sizes sa ON inter.a_id = sa.doc_id
  JOIN sizes sb ON inter.b_id = sb.doc_id
  WHERE CAST(n_inter AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) >= {threshold}
),
edges AS (
  SELECT a_id AS u, b_id AS v FROM pairs UNION ALL SELECT b_id AS u, a_id AS v FROM pairs
),
l0 AS (SELECT doc_id, doc_id AS lbl FROM documents)"""
        + "".join(prop)
        + "\n"
        + (
            final_select
            or f"SELECT doc_id, lbl AS cluster_id, lbl = doc_id AS is_canonical FROM l{max_iter}"
        ).format(labels=f"l{max_iter}")
        + "\n"
    )


# ---------------------------------------------------------------------------
# Table profiling — per-column null count / distinct / min / max. See
# operators/profiling.py for the two plan shapes (approx HLL++ single
# pass = scale default; exact = per-column pruned branches, avoiding
# the Expand row-multiplication of a multi-countDistinct). Numeric
# extremes go through DECIMAL(18,2) before stringifying: Java 17's
# Double.toString is not shortest-roundtrip, so raw double->string
# differs per engine.
# ---------------------------------------------------------------------------
def _profile_cols() -> dict:
    s = lambda x: x.cast("string")  # noqa: E731
    d2s = lambda x: x.cast("decimal(18,2)").cast("string")  # noqa: E731
    return {
        "o_orderkey": s,
        "o_custkey": s,
        "o_orderstatus": s,
        "o_totalprice": d2s,
        "o_orderdate": s,
        "o_orderpriority": s,
    }
