"""Incremental sync: scheduled batch re-sync of a trailing window with
idempotent keyed upsert — the reference's incrementality model
(SURVEY.md §2.9).

The reference's cron runs a daily 2-week-window sync and a weekly full
sync (``truenas/cron-jobs.txt:12,15``); re-upserting the window daily
means late-arriving data up to 14 days old is repaired automatically,
and the alternate key makes re-runs idempotent
(``modules/dataverse.py:88``). Also ports the full-refresh path
(delete + backfill with interlocks, ``full_refresh_fy2023_2025.py``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from bw_new_data_integration_spark.sources.parquet_target import ParquetKeyedTable


def sync_trailing_window(
    spark: SparkSession,
    source: DataFrame,
    target: ParquetKeyedTable,
    date_col: str,
    days: int,
    anchor: Column | None = None,
    order_by: Sequence[str] | None = None,
) -> dict[str, int]:
    """Daily incremental: slice the trailing ``days`` window from the
    source and upsert by key. Idempotent — running twice produces the
    same target version content.
    """
    if anchor is None:
        anchor = F.current_date()
    window = source.filter(F.col(date_col).cast("date") >= F.date_sub(anchor.cast("date"), days))
    n = window.count()
    target.upsert(spark, window, order_by=order_by)
    return {"window_rows": n}


def full_refresh(
    spark: SparkSession,
    source_by_slice: dict[str, DataFrame],
    target: ParquetKeyedTable,
    confirm_delete: bool = False,
    dry_run: bool = False,
) -> dict[str, int]:
    """Destructive rebuild: delete-all then backfill slice by slice
    (per fiscal year/period, bounding each unit of work exactly like
    the reference's 39-slice backfill).

    Interlocks mirror the reference (``--confirm-delete``,
    ``--dry-run``: ``full_refresh_fy2023_2025.py:210-234,291-294``) —
    a destructive run must be explicitly confirmed.
    """
    counts = {name: df.count() for name, df in source_by_slice.items()}
    if dry_run:
        return {"dry_run": 1, **counts}
    if not confirm_delete:
        raise PermissionError("full refresh deletes the target; pass confirm_delete=True")

    first = True
    for _name, df in source_by_slice.items():
        if first:
            target.overwrite(df.dropDuplicates(target.key_cols))
            first = False
        else:
            target.upsert(spark, df)
    return counts
