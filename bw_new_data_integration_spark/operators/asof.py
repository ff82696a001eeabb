"""As-of (backward-looking temporal) join — an engine extension.

The reference has only equi-key joins (SURVEY.md §2.5), but temporal
alignment — "match each event to the most recent quote at or before
its timestamp" — is a standard need the moment clock/punch data meets
master data. Implemented the scalable way: tag both sides, union, one
window pass per key with ``last(..., ignorenulls=True)`` carrying the
latest right-side values forward. One shuffle on the key, no range
cross-join, no per-key quadratic blowup — at 100 TB the window state
per task is a single row of carried values.

DuckDB's native ``ASOF JOIN`` provides the oracle semantics
(``l.ts >= r.ts``, greatest matching ``r.ts``). The right side must be
unique per (key, ts) — dedupe first, exactly as both engines require
for a well-defined answer.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Sequence[str] = (),
    prefix: str = "asof_",
) -> DataFrame:
    """Backward as-of join: each left row gets the right row with the
    greatest ``right_ts <= left_ts`` per key (ties at equal timestamps
    match, per the standard ``>=`` convention).

    Output: all left columns + ``<prefix><right_ts>`` +
    ``<prefix><col>`` for each value column (null when no right row
    precedes the left row).
    """
    on = list(on)
    carried = [right_ts, *value_cols]

    r = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        *[F.col(c).alias(f"__r_{c}") for c in carried],
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
            for c in left.columns
            if c not in on
        ],
    )
    l = left.select(  # noqa: E741
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in carried],
        *[F.col(c).alias(f"__l_{c}") for c in left.columns if c not in on],
    )
    # right rows sort before left rows at the same timestamp, so an
    # equal-ts quote is visible to the probe (the >= convention)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = l.unionByName(r).select(
        *on,
        "__ts",
        "__tag",
        *[F.col(f"__l_{c}") for c in left.columns if c not in on],
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__f_{c}") for c in carried],
    )
    out = filled.filter(F.col("__tag") == 1).select(
        *on,
        F.col("__ts").alias(left_ts),
        *[F.col(f"__l_{c}").alias(c) for c in left.columns if c not in on and c != left_ts],
        *[F.col(f"__f_{c}").alias(f"{prefix}{c}") for c in carried],
    )
    return out
