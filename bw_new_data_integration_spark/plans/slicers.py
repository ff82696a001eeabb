"""Slicer construction — the reference's MDX WHERE-clause vocabulary
as pushable Column predicates (SURVEY.md §2.3 F4-F6).

The reference binds one of three slicers into each MDX template
(``modules/olap_sync.py:246-339``): a fiscal-year member, a fiscal
year+period member pair (13×28-day calendar), or a trailing 7/14-day
"MyView". Here each becomes a plain predicate on the source frame —
over a date/fiscal partition column these prune partitions at the scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from bw_new_data_integration_spark.operators.window_ops import fiscal_period_of, fiscal_year_of


def fiscal_year(date_col: str, year: int) -> Column:
    """F4: ``WHERE [Fiscal_Year].&[YYYY]``."""
    return fiscal_year_of(F.col(date_col).cast("date")) == year


def fiscal_period(date_col: str, year: int, period: int) -> Column:
    """F5: ``WHERE [d_Year].&[y], [d_Period].&[p]`` (13×28-day calendar)."""
    d = F.col(date_col).cast("date")
    fy_start = F.make_date(F.year(d), F.lit(1), F.lit(1))
    return (fiscal_year_of(d) == year) & (fiscal_period_of(d, fy_start) == period)


def trailing_days(date_col: str, days: int, anchor: Column | None = None) -> Column:
    """F6: MyView 81/82 — last 7/14 days. ``anchor`` defaults to
    ``current_date()`` (production); tests pass the dataset max."""
    if anchor is None:
        anchor = F.current_date()
    return F.col(date_col).cast("date") >= F.date_sub(anchor.cast("date"), days)
