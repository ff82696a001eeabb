"""Z-order (Morton-curve) clustering for multi-column pruning
(beyond-reference).

A table sorted on one column prunes scans on THAT column only: parquet
min/max row-group stats on the second column span the whole domain in
every file. Interleaving the bits of both keys (the Morton / Z-order
curve) makes files cover small RECTANGLES of the key space instead of
stripes, so a box predicate on any subset of the z-ordered columns
skips most files — the standard lakehouse layout trick (Delta OPTIMIZE
ZORDER BY, Hudi/Iceberg clustering) for 100 TB fact tables queried on
several dimensions.

Everything is a plain column expression (shift/mask/or — whole-stage
codegen, SQL-replayable) plus one ``repartitionByRange`` on the
z-value; no UDFs, no collect. ``tests/test_invariants.py`` pins the
locality win: a box query touches ~3× fewer files under z-order than
under a linear sort at the same file count.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton interleave of the low ``bits`` bits of two non-negative
    int columns: z = ... y1 x1 y0 x0. 2*bits <= 62 keeps the result a
    positive bigint."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits out of range: {bits}")
    xl, yl = x.cast("bigint"), y.cast("bigint")
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(xl, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(yl, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return reduce(Column.bitwiseOR, terms)


def zorder_sql(x: str, y: str, bits: int = 16) -> str:
    """The identical interleave as ANSI-ish SQL (DuckDB oracle twin)."""
    terms = [
        f"((({x} >> {i}) & 1) << {2 * i}) | ((({y} >> {i}) & 1) << {2 * i + 1})"
        for i in range(bits)
    ]
    return "(" + " | ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    n_files: int = 16,
    bits: int = 16,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered on the
    Morton curve of (x_col, y_col): range-partition on the z-value
    (one sampling pass picks balanced cut points — the same mechanism
    a global orderBy uses, but stopping at partition granularity) and
    sort within each file so row-group min/max stats stay tight on
    both columns.

    Both columns must already FIT in ``bits`` bits: the interleave
    takes the low bits, so a wider value aliases every ``2**bits``
    units and loses locality. Quantize wide-range columns to the bit
    budget over their observed min/max first —
    ``ParquetKeyedTable.compact(zorder_by=...)`` does exactly that
    before calling the interleave."""
    z = z_value(F.col(x_col), F.col(y_col), bits).alias("__z")
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
