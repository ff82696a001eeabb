"""Table profiling — per-column null count, distinct count, min, max.

Re-expresses the reference's ad-hoc validity checks
(modules/pipeline_runner.py:158-226 required-key / type sanity loops) as a
first-class profiling operator, generalized to the report shape a data-quality
framework produces.

Two execution modes, chosen for the 100 TB plan:

* ``approx=True`` (default): ONE scan, ONE ordinary hash aggregate —
  ``approx_count_distinct`` (HyperLogLog++) carries per-column sketch state
  through map-side partial aggregation, so there is no Expand, no
  row-multiplication, and the shuffle is a handful of sketch bytes per
  partition. This is the only profile plan that survives a 100 TB table.

* ``approx=False``: exact distincts. A single multi-``countDistinct``
  aggregate would make Catalyst plan an Expand (rows × profiled-columns
  through one shuffle — the scan output is multiplied 6× for a 6-column
  profile). Instead each column gets its own branch:
  ``select(c).where(notNull).distinct()`` → count. Each branch's scan is
  pruned to one column (columnar parquet reads just that column) and the
  shuffle after map-side partial dedup carries only distinct values. The
  branches and the one nulls/min/max pass are unioned into a single plan so
  one action runs them all; at scale this is N pruned scans with small
  shuffles instead of one scan with an N×-multiplied shuffle.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Render = Callable[[Column], Column]


def _string(c: Column) -> Column:
    return c.cast("string")


def profile(
    df: DataFrame,
    cols: dict[str, Render] | list[str],
    *,
    approx: bool = True,
    rsd: float = 0.05,
) -> DataFrame:
    """Profile ``cols`` of ``df`` → rows (col_name, n_nulls, n_distinct, min_str, max_str).

    ``cols`` maps column name → render function for min/max stringification
    (defaults to a plain string cast; pass e.g. a decimal-then-string cast
    for doubles, where Java's Double.toString is not shortest-roundtrip and
    differs across engines). ``approx`` selects the HLL++ sketch plan (the
    scale default); ``approx=False`` selects exact distincts via per-column
    pruned branches.
    """
    if not isinstance(cols, dict):
        cols = {c: _string for c in cols}

    def stats_exprs(distinct_fn) -> list[Column]:
        out = []
        for c, render in cols.items():
            out.append((F.count("*") - F.count(c)).alias(f"nn_{c}"))
            if distinct_fn is not None:
                out.append(distinct_fn(c).alias(f"nd_{c}"))
            out.append(render(F.min(F.col(c))).alias(f"mn_{c}"))
            out.append(render(F.max(F.col(c))).alias(f"mx_{c}"))
        return out

    if approx:
        prof = df.agg(*stats_exprs(lambda c: F.approx_count_distinct(c, rsd)))
        stack = ", ".join(f"'{c}', nn_{c}, nd_{c}, mn_{c}, mx_{c}" for c in cols)
        return prof.selectExpr(
            f"stack({len(cols)}, {stack}) AS (col_name, n_nulls, n_distinct, min_str, max_str)"
        )

    # Exact mode: one nulls/min/max pass (no distincts → ordinary agg) ...
    base = df.agg(*stats_exprs(None))
    stack = ", ".join(f"'{c}', nn_{c}, mn_{c}, mx_{c}" for c in cols)
    stats = base.selectExpr(
        f"stack({len(cols)}, {stack}) AS (col_name, n_nulls, min_str, max_str)"
    )
    # ... plus one pruned distinct branch per column, unioned.
    branches = None
    for c in cols:
        b = (
            df.select(c)
            .where(F.col(c).isNotNull())
            .distinct()
            .agg(F.count("*").alias("n_distinct"))
            .select(F.lit(c).alias("col_name"), "n_distinct")
        )
        branches = b if branches is None else branches.unionByName(b)
    return stats.join(branches, "col_name").select(
        "col_name", "n_nulls", "n_distinct", "min_str", "max_str"
    )
