"""File sources: CSV with the reference's dirty-input discipline, plus
an Excel reader gated behind openpyxl availability.

The reference's CSV path (``load_csv.py:41-81``,
``tests/load_csv_to_dataverse.py:349-410``) reads header-row CSV as
strings and cleans per-row: multi-format dates, ``'' '-' 'NULL' ' '``
null tokens, comma-grouped decimals, int truncation. Here the scan is
``spark.read.csv`` with an all-string schema (never inferSchema — the
dirty values ARE strings) and the cleaning is the coercion expression
vocabulary, applied lazily so Catalyst fuses scan+clean into one stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv_raw(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
    delimiter: str = ",",
) -> DataFrame:
    """Header CSV -> all-string DataFrame (the reference's DictReader
    stage). Column list optional: when given, enforces presence and
    order; otherwise the header is trusted.
    """
    reader = (
        spark.read.option("header", "true")
        .option("delimiter", delimiter)
        .option("mode", "PERMISSIVE")
    )
    if columns:
        schema = T.StructType([T.StructField(c, T.StringType(), True) for c in columns])
        df = reader.schema(schema).csv(path)
    else:
        df = reader.csv(path)  # all columns default to string without inferSchema
    return df


def normalize_headers(df: DataFrame, rename: dict[str, str]) -> DataFrame:
    """Reference-style header mapping, e.g. ``'Store Number Label' ->
    'store_number'`` (``tests/load_csv_to_dataverse.py:8-18``)."""
    out = df
    for src, dst in rename.items():
        if src in out.columns:
            out = out.withColumnRenamed(src, dst)
    return out


def read_excel(
    spark: SparkSession,
    path: str,
    sheet: str | int = 0,
    header_row: int = 0,
) -> DataFrame:
    """Excel scan (reference ``load_store_hours.py:64-108``): openpyxl
    via pandas on the driver (workbooks are master-data-sized), then
    ``createDataFrame`` over Arrow. Raises a clear error when openpyxl
    is absent from the image.
    """
    try:
        import openpyxl  # noqa: F401
    except ImportError as exc:  # pragma: no cover - env dependent
        raise NotImplementedError(
            "Excel source requires openpyxl, which is not in this image; "
            "convert the workbook to CSV or install openpyxl"
        ) from exc
    import pandas as pd

    pdf = pd.read_excel(path, sheet_name=sheet, header=header_row, dtype=str)
    pdf = pdf.dropna(how="all")
    return spark.createDataFrame(pdf)
