"""Serve YAML pipelines from incrementally-maintained rollups.

The reference recomputes every pipeline's aggregate from scratch per
sync (modules/olap_sync.py re-pulls and re-aggregates the full slice;
pipelines/pipelines.yaml declares the grain). Here the same YAML
``aggregate`` block compiles into :func:`operators.matview.
maintain_rollup` arguments, so a pipeline's grain is kept current from
the landing table's change feed — O(churn) per sync instead of
O(source) — and the unchanged post-aggregate stages
(:func:`plans.pipeline.finish_plan`: 'All' filter, coercion/rename,
business key, required-key gate, NON EMPTY) run over the maintained
rollup. A user switches a pipeline from recompute to maintenance
without touching its YAML.

Measure translation (AggSpec → maintained state):

- ``agg: sum``   → exact-decimal signed sum (bit-equal to recompute)
- ``agg: count`` of ``*`` → the rollup's row count
- ``agg: count`` of an expression → signed sum of its non-null 0/1
- ``agg: min`` / ``max`` → monotone fold + group-scoped recompute
- ``agg: avg``  → maintained (sum, non-null count) pair, derived at read

The landing (staging) table must MATERIALIZE the grain columns: dims
are row-level expressions (``CAST(l_shipdate AS DATE)``), evaluated
once at ingest by :func:`staging_frame` — the change feed then carries
them, keeping the fold a plain column groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bw_new_data_integration_spark.operators.matview import (
    finish_rollup,
    maintain_rollup,
)
from bw_new_data_integration_spark.plans.pipeline import PipelineSpec, finish_plan
from bw_new_data_integration_spark.sources.parquet_target import ParquetKeyedTable

#: count_col used when the pipeline declares no count(*) measure of its
#: own — the rollup still needs a row count for dead-group deletion.
_HIDDEN_COUNT = "__mv_rows"


def staging_frame(df: DataFrame, spec: PipelineSpec) -> DataFrame:
    """Project a source increment into the landing-table schema: every
    source column plus the pipeline's materialized dim columns (name
    collisions resolve to the dim — it is the same expression)."""
    agg = spec.aggregate
    if agg is None:
        raise ValueError(f"pipeline {spec.name!r} has no aggregate block")
    passthrough = [c for c in df.columns if c not in agg.dims]
    return df.select(
        *passthrough, *(F.expr(src).alias(name) for name, src in agg.dims.items())
    )


def _translate_measures(spec: PipelineSpec):
    agg = spec.aggregate
    sums: dict[str, str] = {}
    mins: dict[str, str] = {}
    maxs: dict[str, str] = {}
    avgs: dict[str, str] = {}
    ratios: dict[str, tuple[str, str]] = {}
    count_col = None
    int_sums: set[str] = set()  # stored as decimal, presented as bigint
    for name, m in agg.measures.items():
        kind = m.get("agg", "sum")
        raw = m.get("expr", name)
        if kind == "count" and raw == "*":
            if count_col is None:
                count_col = name
            else:  # a second count(*): a signed sum of ones
                sums[name] = "1"
                int_sums.add(name)
        elif kind == "count":
            sums[name] = f"CASE WHEN ({raw}) IS NOT NULL THEN 1 ELSE 0 END"
            int_sums.add(name)
        elif kind == "sum":
            sums[name] = raw
        elif kind == "min":
            mins[name] = raw
        elif kind == "max":
            maxs[name] = raw
        elif kind == "avg":
            avgs[name] = raw
        elif kind == "ratio":
            # {agg: ratio, num: expr, den: expr} — maintained as the
            # component-sum pair (matview ratio_measures), derived at
            # read; the cube's calculated-member vocabulary
            ratios[name] = (m["num"], m["den"])
        else:
            raise ValueError(f"measure {name!r}: unsupported agg {kind!r}")
    return sums, mins, maxs, avgs, ratios, count_col or _HIDDEN_COUNT, int_sums


def maintain_pipeline_rollup(
    spark: SparkSession,
    spec: PipelineSpec,
    base: ParquetKeyedTable,
    rollup: ParquetKeyedTable,
) -> dict:
    """Bring the pipeline's grain rollup up to date with the landing
    table's current version (see :func:`operators.matview.
    maintain_rollup` for the feed/exactness/crash-recovery contract)."""
    sums, mins, maxs, avgs, ratios, count_col, _ = _translate_measures(spec)
    return maintain_rollup(
        spark,
        base,
        rollup,
        group_cols=list(spec.aggregate.dims),
        sum_measures=sums,
        count_col=count_col,
        min_measures=mins,
        max_measures=maxs,
        avg_measures=avgs,
        ratio_measures=ratios,
    )


def serve_pipeline_from_matview(
    spark: SparkSession,
    spec: PipelineSpec,
    rollup: ParquetKeyedTable,
    audit_ts: bool = False,
) -> DataFrame:
    """The pipeline's OUTPUT (same columns, same types, same gates as
    ``run_pipeline``) read from the maintained rollup instead of a
    source re-aggregation. Sum measures surface as doubles (AggSpec
    casts its exact-decimal sums to double), counts as bigint, AVG as
    the derived sum/count double."""
    sums, _mins, _maxs, avgs, ratios, count_col, int_sums = _translate_measures(spec)
    df = finish_rollup(rollup.read(spark), avg_measures=avgs, ratio_measures=ratios)
    cols = []
    for name in spec.aggregate.dims:
        cols.append(F.col(name))
    for name, m in spec.aggregate.measures.items():
        kind = m.get("agg", "sum")
        if name == count_col and kind == "count":
            cols.append(F.col(name).cast("bigint").alias(name))
        elif name in int_sums:
            cols.append(F.col(name).cast("bigint").alias(name))
        elif name in sums:
            cols.append(F.col(name).cast("double").alias(name))
        else:  # min/max keep their stored type; avg is already derived
            cols.append(F.col(name))
    agged = df.select(*cols)
    return finish_plan(agged, spec, audit_ts=audit_ts)
