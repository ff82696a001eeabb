"""Skyline (Pareto-dominance) query over two minimized dimensions.

Motivated by "Integration of Skyline Queries into Spark SQL" (EDBT
2023, see PAPERS.md): the naive formulation is a NOT EXISTS self-join —
O(N²) and a BroadcastNestedLoopJoin in Spark — but the 2-D min/min
skyline has a classic O(N log N) form (sort-filter skyline): after
sorting by x, a point is Pareto-optimal iff its y is strictly below the
best y seen at any smaller x, and equal to the best y at its own x.

Plan here (no self-join, no UDF):

1. ``groupBy(x).min(y)`` — one map-side-combined shuffle; the result
   has one row per DISTINCT x value.
2. Running prefix minimum of that per-x minimum via a window ordered by
   x; ``lag`` of the cumulative min gives the strict-prefix min (best y
   among x' < x).
3. Join the (distinct-x-sized) dominance frame back and keep rows with
   ``y == min_y_at_x`` and ``prefix_min > y``.

Dominance semantics: b dominates a iff b.x ≤ a.x ∧ b.y ≤ a.y with at
least one strict; duplicate (x, y) points do not dominate each other,
so all copies of a skyline point survive. Rows with NULL in either
coordinate are excluded (dominance is undefined for them).

Scale note (100 TB): the only non-local structure is the window over
DISTINCT x values — after step 1 that frame is value-cardinality-sized,
not corpus-sized. When distinct-x itself is huge, the standard
distributed skyline applies: range-partition by x, run this operator
per partition, then filter each partition by the running min of the
partitions to its left (a tiny per-partition summary join) — same
two-phase shape as the paper's grid partitioning. The join in step 3
is a plain hash join on x (broadcastable when the dominance frame is
small).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Rows not Pareto-dominated under (minimize ``x_col``, minimize
    ``y_col``). Preserves all input columns; drops NULL-coordinate rows."""
    pts = df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    gx = pts.groupBy(x_col).agg(F.min(y_col).alias("__ymin"))
    w = Window.orderBy(x_col)
    gx = gx.withColumn(
        "__cum", F.min("__ymin").over(w.rowsBetween(Window.unboundedPreceding, 0))
    ).withColumn("__before", F.lag("__cum").over(w))
    return (
        pts.join(gx, x_col)
        .where(
            (F.col(y_col) == F.col("__ymin"))
            & (F.col("__before").isNull() | (F.col("__before") > F.col(y_col)))
        )
        .drop("__ymin", "__cum", "__before")
    )
