"""Grouped aggregation operators (SURVEY.md §2.4, A1-A5).

The reference pushes all aggregation into an OLAP cube via MDX
(``CrossJoin(dims) × measures, NON EMPTY, WHERE slicer``); here the
same semantics are a declarative ``groupBy(dims).agg(measures)`` plan —
Catalyst compiles it to partial (map-side) + final hash aggregation
with whole-stage codegen, which is exactly the distributed execution
the cube was doing internally.

Numeric policy for oracle parity: measures aggregate in **decimal**
(exact, associative — immune to partial-agg ordering) and surface as
double. At 100 TB the decimal sum costs a little over a double sum but
guarantees run-to-run determinism, which the hash-compare gate needs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_sum(c: Column | str, scale: int = 6) -> Column:
    """Order-independent sum: cast to decimal, sum exactly, emit double."""
    col = F.col(c) if isinstance(c, str) else c
    return F.sum(col.cast(f"decimal(27,{scale})")).cast("double")


def exact_avg(c: Column | str, scale: int = 6) -> Column:
    """avg = exact decimal sum / count, divided in double."""
    col = F.col(c) if isinstance(c, str) else c
    return F.sum(col.cast(f"decimal(27,{scale})")).cast("double") / F.count(col).cast("double")


def ratio(num: Column, den: Column) -> Column:
    """Post-aggregation ratio measure (A3): null on zero denominator."""
    return F.when(den != 0, num / den)


def grouped_multi_measure(
    df: DataFrame,
    dims: Sequence[str],
    measures: dict[str, Column],
    non_empty: bool = True,
) -> DataFrame:
    """The cube query shape: group by dimension tuple, compute measure
    map, optionally drop all-null measure rows (MDX ``NON EMPTY``, F3).

    ``measures`` maps output name -> aggregate expression.
    """
    aggs = [expr.alias(name) for name, expr in measures.items()]
    out = df.groupBy(*dims).agg(*aggs)
    if non_empty:
        cond = None
        for name in measures:
            c = F.col(name).isNotNull()
            cond = c if cond is None else (cond | c)
        if cond is not None:
            out = out.filter(cond)
    return out


def drop_rollup_rows(df: DataFrame, dims: Sequence[str], token: str = "All") -> DataFrame:
    """Drop cube rollup rows where any dimension equals the literal
    ``'All'`` (F2, reference ``modules/pipeline_runner.py:159-166``)."""
    out = df
    for d in dims:
        out = out.filter(F.col(d) != token)
    return out


def union_all(dfs: Sequence[DataFrame]) -> DataFrame:
    """Union of partial results by column name (A5/O3). The reference
    concatenated per-fiscal-year frames; in Spark, prefer *not*
    splitting at all — but backfill orchestration still unions slices.
    """
    from functools import reduce

    return reduce(DataFrame.unionByName, dfs)


def year_over_year(
    df: DataFrame,
    keys: Sequence[str],
    year_col: str,
    measure_cols: Sequence[str],
) -> DataFrame:
    """YoY measures (A4): for each key×year, attach last year's values
    as ``ly_<measure>``.

    The reference gets TY/LY/L2Y/L3Y as pre-computed cube members; here
    it's a window ``lag`` over the year dimension — one shuffle on
    (keys), no self-join, no second scan.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(F.col(year_col))
    out = df
    for m in measure_cols:
        out = out.withColumn(
            f"ly_{m}",
            F.when(
                F.lag(year_col).over(w) == F.col(year_col) - 1,
                F.lag(m).over(w),
            ),
        )
    return out


def salted_aggregate(
    df: DataFrame,
    dims: Sequence[str],
    measures: dict[str, tuple[Column, str]],
    salt_buckets: int = 32,
    hot_only: Column | None = None,
) -> DataFrame:
    """Two-phase aggregation for skewed grouping keys.

    When one dimension value dominates (the reference's data skews
    hard toward a handful of high-volume stores; at 100 TB a hot key
    turns the final agg into one straggler task), salt the key with a
    uniform bucket, pre-aggregate at (dims, salt) grain — spreading the
    hot key over ``salt_buckets`` tasks — then combine per dims.

    ``measures`` maps output name -> (phase-1 aggregate expression,
    phase-2 combiner name: 'sum'|'min'|'max'). Only decomposable
    aggregates belong here (sum/count/min/max — count combines by sum).
    AQE's skew handling covers joins; this covers aggregation, which
    AQE does not re-split.

    ``hot_only`` (boolean Column, e.g. ``F.col(dim).isin(advised)``
    from the ``sketch.hot_keys`` advisor): salt ONLY rows where it
    holds; the long tail keeps salt 0, so its phase-1 grain — and the
    phase-2 combine input — stays one row per key. One pass either
    way; this is the advisor-driven hybrid plan as a single aggregate.
    """
    salt = (F.rand(seed=7) * salt_buckets).cast("int")
    if hot_only is not None:
        salt = F.when(hot_only, salt).otherwise(F.lit(0))
    salted = df.withColumn("__salt", salt)
    phase1 = salted.groupBy(*dims, "__salt").agg(
        *[expr.alias(name) for name, (expr, _comb) in measures.items()]
    )
    combiners = {"sum": F.sum, "min": F.min, "max": F.max}
    phase2 = phase1.groupBy(*dims).agg(
        *[combiners[comb](name).alias(name) for name, (_expr, comb) in measures.items()]
    )
    return phase2


#: Cost gate for the sketch→advisor→salted composition (VERDICT r8 #4):
#: below this much scanned input, the advisor's FIXED overhead (the
#: sketch pass plus the driver round-trip for the hot set) costs more
#: than the skew it would cure — measured: at sf0.1 (11 MB lineitem)
#: the advised plan ran 1.19s vs 0.30s plain, while at sf1 (184 MB) it
#: wins 1.6× and at sf10 1.8×. 64 MB splits those decades cleanly.
ADVISOR_MIN_INPUT_BYTES = 64 << 20


def plan_input_bytes(df: DataFrame) -> int | None:
    """Upper-bound estimate of the bytes a plan scans, from the public
    ``inputFiles()`` surface (the same signal the keyed table's write
    sizing uses). ``None`` when the plan is not file-backed — callers
    must not skip work on a guess."""
    import os

    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    total = 0
    for uri in set(files):
        p = uri[7:] if uri.startswith("file://") else uri
        try:
            total += os.path.getsize(p)
        except OSError:
            pass
    return total


def advised_aggregate(
    df: DataFrame,
    dims: Sequence[str],
    measures: dict[str, tuple[Column, str]],
    salt_buckets: int = 32,
    min_share: float = 0.2,
    sketch_k: int = 32,
    min_input_bytes: int = ADVISOR_MIN_INPUT_BYTES,
    stored_sketches: DataFrame | None = None,
) -> DataFrame:
    """Cost-gated advisor-driven aggregate (VERDICT r8 #4): the full
    sketch → ``hot_keys`` → hybrid-salted composition, engaged only
    when the input-size estimate clears ``min_input_bytes``; smaller
    inputs fall through to the plain one-phase GROUP BY, whose single
    shuffle beats the advisor's fixed overhead until data dominates.

    The advisor sketches the FIRST dim (the major skew term) with
    per-partition SpaceSaving summaries merged corpus-wide — no extra
    shuffle shape beyond the sketch's own vocabulary-sized exchange —
    and salts only the advised keys. An empty advice set also falls
    through to plain (nothing to cure, skip the second phase).

    ``stored_sketches``: ingest-time per-batch sketch rows (maintained
    as batches land, like the incremental LSH bucket index); when
    given, the advisor merges them instead of re-sketching ``df``, so
    the advice costs one vocabulary-sized merge, no corpus pass.
    Without them the advisor path scans ``df`` twice (sketch pass +
    aggregate); callers whose input is expensive to recompute should
    persist or checkpoint it first (the gated queries localCheckpoint).
    """
    est = plan_input_bytes(df)
    plain = df.groupBy(*dims).agg(
        *[expr.alias(name) for name, (expr, _comb) in measures.items()]
    )
    if est is not None and est < min_input_bytes:
        return plain
    from bw_new_data_integration_spark.operators import sketch as _sketch

    key = dims[0]
    per_part = (
        stored_sketches
        if stored_sketches is not None
        else _sketch.topk_sketch_build(
            df.select(key).withColumn("__part", F.spark_partition_id()),
            "__part",
            key,
            k=sketch_k,
        )
    )
    merged = _sketch.topk_sketch_merge(per_part, None, k=sketch_k)
    hot = [r["key"] for r in _sketch.hot_keys(merged, min_share=min_share).collect()]
    if not hot:
        return plain
    return salted_aggregate(
        df, dims, measures, salt_buckets=salt_buckets,
        hot_only=F.col(key).isin(hot),
    )


def time_rollup(
    df: DataFrame,
    ts_col: str,
    grain_seconds: int,
    group_cols: Sequence[str] = (),
    value_col: str = "value",
) -> DataFrame:
    """Finest-grain time rollup (hypertable continuous-aggregate
    style): bucket timestamps to ``grain_seconds``, keep decomposable
    partials (count + exact decimal sum) so coarser grains derive from
    THIS table instead of rescanning raw events.
    """
    bucket = F.timestamp_seconds(
        (F.col(ts_col).cast("long") / grain_seconds).cast("long") * grain_seconds
    )
    return (
        df.groupBy(bucket.alias("bucket"), *group_cols)
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col(value_col).cast("decimal(27,6)")).alias("sum_value"),
        )
    )


def rollup_up(
    finer: DataFrame,
    coarser_grain_seconds: int,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Derive a coarser rollup purely from a finer one — partials
    re-aggregate (sum of counts, sum of decimal sums), raw data is
    never rescanned. At 100 TB this is the difference between reading
    the 1-minute table (~1/60th the rows) and the raw events."""
    bucket = F.timestamp_seconds(
        (F.col("bucket").cast("long") / coarser_grain_seconds).cast("long")
        * coarser_grain_seconds
    )
    return (
        finer.groupBy(bucket.alias("bucket"), *group_cols)
        .agg(F.sum("n").alias("n"), F.sum("sum_value").alias("sum_value"))
    )
