"""Coercion parity against an independent Python model of the
reference's semantics (modules/pipeline_runner.py:81-130,
load_csv.py:44-63, load_store_hours.py:33-61): the Spark expressions
and the row-at-a-time model must agree on an edge-case corpus.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bw_new_data_integration_spark.functions import coercion

NULL_TOKENS = {"", "-", "NULL", "null", "N/A", "n/a"}

CORPUS = [
    "1,234.9",
    "-1,234.9",
    "0",
    "42",
    "  77  ",
    "-",
    "NULL",
    "null",
    "N/A",
    "n/a",
    "",
    "   ",
    "999999999.99",
    "-0.5",
    "3.999",
    "not-a-number",
    "12,345,678.01",
    "1e3",
]

DATES = [
    "2024-01-31",
    "1/5/1995",
    "12/31/2024",
    "1/5/95",
    "2024-06-15T13:45:00",
    "6/15/2024T00:00:00",
    "not-a-date",
    "2024-13-45",
    "",
    "-",
]

TIMES = ["100", "1100", "9:30", "09:30:00", "23:59", "0", "  8:15 ", ""]


def model_int(s: str):
    """int coercion: strip commas, int(float(x)), null tokens -> None."""
    s = s.strip()
    if s in NULL_TOKENS:
        return None
    try:
        return int(float(s.replace(",", "")))
    except ValueError:
        return None


def model_decimal(s: str):
    s = s.strip()
    if s in NULL_TOKENS:
        return None
    try:
        return round(float(s.replace(",", "")), 2)
    except ValueError:
        return None


def model_date(s: str):
    s = s.strip()
    if s in NULL_TOKENS:
        return None
    s = s.split("T")[0]
    for fmt in ("%Y-%m-%d", "%m/%d/%Y", "%m/%d/%y"):
        try:
            return datetime.strptime(s, fmt).date()
        except ValueError:
            continue
    return None


def model_hhmm(s: str):
    s = s.strip()
    if not s:
        return None
    if ":" in s:
        h, m = s.split(":")[0], s.split(":")[1]
        return f"{h.zfill(2)}:{m}"
    digits = "".join(ch for ch in s if ch.isdigit()).zfill(4)
    return f"{digits[:2]}:{digits[2:4]}"


@pytest.mark.parametrize(
    "corpus,spark_fn,model",
    [
        (CORPUS, coercion.to_int_truncating, model_int),
        (CORPUS, coercion.to_decimal, model_decimal),
        (DATES, coercion.to_date_multiformat, model_date),
        (TIMES, coercion.time_to_hhmm, model_hhmm),
    ],
    ids=["int", "decimal", "date", "hhmm"],
)
def test_coercion_matches_reference_model(spark, corpus, spark_fn, model):
    df = spark.createDataFrame(
        [(s,) for s in corpus], T.StructType([T.StructField("raw", T.StringType(), True)])
    )
    got = [r["out"] for r in df.select(spark_fn(F.col("raw")).alias("out")).collect()]
    for raw, g in zip(corpus, got):
        e = model(raw)
        if isinstance(e, float) and g is not None:
            assert abs(float(g) - e) < 1e-9, f"{raw!r}: spark={g!r} model={e!r}"
        else:
            assert (g is None and e is None) or str(g) == str(e), (
                f"{raw!r}: spark={g!r} model={e!r}"
            )
