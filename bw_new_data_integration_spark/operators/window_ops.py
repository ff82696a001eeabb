"""Slicers, trailing windows, and ranking operators.

The reference's incremental model is "re-sync a trailing window with
idempotent upsert" (SURVEY.md §2.9): MyView 81/82 = last 7/14 days
(reference ``modules/mdx_queries.py:13-18``), fiscal-year and
13×28-day fiscal-period slicers spliced into MDX WHERE clauses
(``modules/olap_sync.py:263-296``). Here slicers are plain filters —
on a date/fiscal partition column they become partition pruning at the
parquet/Delta scan, i.e. the 100 TB table is never read outside the
slice.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def trailing_window(
    df: DataFrame, ts_col: str, days: int, anchor: Column | None = None
) -> DataFrame:
    """Trailing N-day slice (F6). ``anchor`` defaults to the dataset
    max — deterministic over fixed fixtures (tests), while production
    passes ``F.current_date()``.

    The max-anchor path computes the max in a separate tiny aggregate
    and injects it as a literal so the main scan still gets a pushable
    predicate.
    """
    if anchor is None:
        anchor_val = df.agg(F.max(ts_col)).collect()[0][0]
        anchor = F.lit(anchor_val)
    cutoff = F.date_sub(anchor.cast("date"), days)
    return df.filter(F.col(ts_col) >= cutoff)


def fiscal_year_start(
    date_col: Column, fy_start_month: int = 1, fy_start_day: int = 1
) -> Column:
    """First day of the fiscal year containing ``date_col``.

    The reference's 13-4 calendar runs on the franchise fiscal year —
    ``[d_Year]&[y],[d_Period]&[p]`` bind against a cube calendar whose
    FY start is not Jan-1 (``modules/olap_sync.py:264-274``). The
    anchor is configurable as a month/day pair; dates before this
    year's anchor belong to the prior fiscal year.
    """
    this_year = F.make_date(F.year(date_col), F.lit(fy_start_month), F.lit(fy_start_day))
    prior_year = F.make_date(
        F.year(date_col) - 1, F.lit(fy_start_month), F.lit(fy_start_day)
    )
    return F.when(date_col >= this_year, this_year).otherwise(prior_year)


def fiscal_year_of(
    date_col: Column, fy_start_month: int = 1, fy_start_day: int = 1
) -> Column:
    """Fiscal year label (F4): the calendar year in which the fiscal
    year STARTS. With a January-1 anchor this is the calendar year."""
    if fy_start_month == 1 and fy_start_day == 1:
        return F.year(date_col)
    return F.year(fiscal_year_start(date_col, fy_start_month, fy_start_day))


def fiscal_period_of(date_col: Column, fy_start: Column | str) -> Column:
    """13-period (28-day) fiscal calendar period number, 1-13 (F5).

    ``fy_start`` is the first day of the fiscal year; days 0-27 are
    period 1, etc. Period 13 absorbs the remainder (day 364/365).
    """
    start = F.col(fy_start) if isinstance(fy_start, str) else fy_start
    day_of_fy = F.datediff(date_col, start)
    return F.least(F.floor(day_of_fy / 28) + 1, F.lit(13)).cast("int")


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    rank_name: str = "rk",
) -> DataFrame:
    """Top-K per group via row_number window. One shuffle on the group
    key; with AQE, skewed groups split. Deterministic only if
    ``order_cols`` form a total order — callers append a tiebreaker.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return df.withColumn(rank_name, F.row_number().over(w)).filter(F.col(rank_name) <= k)


def sessionize(
    df: DataFrame, user_col: str, ts_col: str, gap_minutes: int = 30
) -> DataFrame:
    """Sessionization: new session when the gap to the previous event
    exceeds ``gap_minutes``. lag + conditional cumsum — two window
    passes over one shuffle on the user key.
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col("event_id"))
    gap = F.col(ts_col).cast("long") - F.lag(F.col(ts_col).cast("long")).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    return df.withColumn("session_seq", F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)))


def fill_gaps_linear(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    partition_cols: Sequence[str],
) -> DataFrame:
    """Densify a sparse per-key daily series and linearly interpolate
    the missing days (beyond-reference; the repair step between raw
    event feeds and models that assume a regular grid).

    Scale shape — everything stays declarative:

    - the calendar skeleton is built PER KEY from one small aggregate
      (min/max date) + ``sequence``/``explode`` — no driver loop, no
      global calendar cross join; skeleton size is the true output
      size;
    - the observed rows left-join onto the skeleton (one shuffle on
      (key, date));
    - previous/next anchors are ``last(..., ignoreNulls)`` /
      ``first(..., ignoreNulls)`` windows partitioned by key — no
      self-joins, no per-gap iteration.

    The skeleton is bounded by each key's observed min/max, so every
    gap has both anchors and the output carries no nulls. Emits
    (partition_cols..., ts_col, value_col, is_interpolated).
    """
    keys = [F.col(c) for c in partition_cols]
    span = df.groupBy(*keys).agg(
        F.min(F.col(ts_col).cast("date")).alias("__min_d"),
        F.max(F.col(ts_col).cast("date")).alias("__max_d"),
    )
    skeleton = span.select(
        *partition_cols,
        F.explode(F.sequence("__min_d", "__max_d")).alias(ts_col),
    )
    observed = df.select(
        *partition_cols,
        F.col(ts_col).cast("date").alias(ts_col),
        F.col(value_col).cast("double").alias(value_col),
    )
    joined = skeleton.join(observed, [*partition_cols, ts_col], "left")
    w_prev = (
        Window.partitionBy(*keys)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy(*keys)
        .orderBy(ts_col)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    anchor = F.when(
        F.col(value_col).isNotNull(), F.struct(F.col(ts_col).alias("d"), F.col(value_col).alias("v"))
    )
    prev = F.last(anchor, ignorenulls=True).over(w_prev)
    nxt = F.first(anchor, ignorenulls=True).over(w_next)
    frac = F.datediff(F.col(ts_col), prev["d"]).cast("double") / F.datediff(
        nxt["d"], prev["d"]
    ).cast("double")
    interpolated = prev["v"] + (nxt["v"] - prev["v"]) * frac
    return joined.select(
        *partition_cols,
        ts_col,
        F.coalesce(F.col(value_col), interpolated).alias(value_col),
        F.col(value_col).isNull().alias("is_interpolated"),
    )
