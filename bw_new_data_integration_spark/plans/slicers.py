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

from bw_new_data_integration_spark.operators.window_ops import (
    fiscal_period_of,
    fiscal_year_of,
    fiscal_year_start,
)


def fiscal_year(
    date_col: str, year: int, fy_start_month: int = 1, fy_start_day: int = 1
) -> Column:
    """F4: ``WHERE [Fiscal_Year].&[YYYY]``. ``fy_start_*`` anchor the
    fiscal calendar (reference cube FY start, not necessarily Jan-1)."""
    d = F.col(date_col).cast("date")
    return fiscal_year_of(d, fy_start_month, fy_start_day) == year


def fiscal_period(
    date_col: str,
    year: int,
    period: int,
    fy_start_month: int = 1,
    fy_start_day: int = 1,
) -> Column:
    """F5: ``WHERE [d_Year].&[y], [d_Period].&[p]`` (13×28-day calendar).

    Periods count from the configurable fiscal-year anchor — the
    reference's 13-4 calendar starts at the franchise FY start
    (``modules/olap_sync.py:264-274``), so e.g. with a Feb-1 anchor,
    Jan dates fall in period 12/13 of the PRIOR fiscal year.
    """
    d = F.col(date_col).cast("date")
    fy_start = fiscal_year_start(d, fy_start_month, fy_start_day)
    return (fiscal_year_of(d, fy_start_month, fy_start_day) == year) & (
        fiscal_period_of(d, fy_start) == period
    )


def mdx_member_13_4(year: int, period: int | None = None) -> str:
    """The 13-4-calendar slicer MEMBER STRING bound into MDX backfill
    templates (``${slicer}``), byte-identical to the reference's
    (modules/olap_sync.py:264-274). Used by the XMLA backfill path;
    in-engine slicing uses :func:`fiscal_period` predicates instead."""
    if period is not None:
        if not 1 <= period <= 13:
            raise ValueError("period must be between 1 and 13")
        return (
            f"[13-4 Calendar].[d_Year].[d_Year].&[{int(year)}],"
            f"[13-4 Calendar].[d_Period].[d_Period].&[{int(period)}]"
        )
    return f"[13-4 Calendar].[d_Year].[d_Year].&[{int(year)}]"


def mdx_member_fiscal_year(year: int) -> str:
    """Regular-calendar FY slicer member (modules/olap_sync.py:280)."""
    return f"[Calendar].[Calendar Hierarchy].[Fiscal_Year].&[{int(year)}]"


def trailing_days(date_col: str, days: int, anchor: Column | None = None) -> Column:
    """F6: MyView 81/82 — last 7/14 days. ``anchor`` defaults to
    ``current_date()`` (production); tests pass the dataset max."""
    if anchor is None:
        anchor = F.current_date()
    return F.col(date_col).cast("date") >= F.date_sub(anchor.cast("date"), days)
