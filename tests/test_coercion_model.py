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
    """decimal(13,2) coercion model. Ties round HALF_UP — Spark's
    decimal-cast rounding (and SQL convention) — NOT Python's
    round-half-even; 5.125 -> 5.13, not 5.12. (Caught by the
    hypothesis test below: the old round(float, 2) model silently
    agreed on every non-tie input.)"""
    import decimal

    s = s.strip()
    if s in NULL_TOKENS:
        return None
    try:
        f = float(s.replace(",", ""))
    except ValueError:
        return None
    return float(
        decimal.Decimal(repr(f)).quantize(
            decimal.Decimal("0.01"), rounding=decimal.ROUND_HALF_UP
        )
    )


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


def test_coercion_matches_model_on_generated_dirt(spark):
    """Property-based extension of the corpus test: hypothesis
    GENERATES dirty numeric strings (grouped digits, null tokens,
    whitespace padding, stray text, exponent forms) and the Spark
    expressions must agree with the Python reference model on every
    one. Batched: each hypothesis example is a whole list evaluated in
    ONE Spark job, so shrinking still isolates a minimal failing
    string without a job per string."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    digits = st.integers(0, 10**9).map(str)
    grouped = st.integers(1000, 10**9).map(lambda v: f"{v:,}")
    frac = st.tuples(st.integers(-(10**6), 10**6), st.integers(0, 999)).map(
        lambda t: f"{t[0]}.{t[1]:03d}"
    )
    token = st.sampled_from(sorted(NULL_TOKENS))
    junk = st.text(
        alphabet="abcXYZ!@# .,-", min_size=1, max_size=8
    )
    expo = st.tuples(st.integers(-99, 99), st.integers(-5, 5)).map(
        lambda t: f"{t[0]}e{t[1]}"
    )
    pad = st.sampled_from(["", " ", "  ", "\t"])
    dirty = st.tuples(
        pad, st.one_of(digits, grouped, frac, token, junk, expo), pad
    ).map(lambda t: t[0] + t[1] + t[2])

    @settings(max_examples=12, deadline=None)
    @given(st.lists(dirty, min_size=1, max_size=40))
    def prop(xs):
        df = spark.createDataFrame(
            [(s,) for s in xs],
            T.StructType([T.StructField("raw", T.StringType(), True)]),
        )
        got = df.select(
            coercion.to_int_truncating(F.col("raw")).alias("i"),
            coercion.to_decimal(F.col("raw")).alias("d"),
        ).collect()
        for raw, r in zip(xs, got):
            ei, ed = model_int(raw), model_decimal(raw)
            assert (r["i"] is None) == (ei is None), f"{raw!r}: {r['i']} vs {ei}"
            if ei is not None:
                assert int(r["i"]) == ei, f"{raw!r}: {r['i']} vs {ei}"
            assert (r["d"] is None) == (ed is None), f"{raw!r}: {r['d']} vs {ed}"
            if ed is not None:
                assert abs(float(r["d"]) - ed) < 1e-9, f"{raw!r}: {r['d']} vs {ed}"

    prop()


def test_temperature_quota_properties():
    """Property sweep over the integer quota math (no Spark): for any
    positive group counts, every threshold stays in [0, 2^32], no
    group's quota exceeds its size (thresholds never ask for more rows
    than exist), at least one group is kept whole (the binder), and
    tau=0.5 shares are at least as flat as natural shares."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from bw_new_data_integration_spark.operators.sampling import (
        temperature_thresholds,
    )

    @given(
        st.dictionaries(
            st.text(alphabet="abcdefgh", min_size=1, max_size=3),
            st.integers(min_value=1000, max_value=10**12),
            min_size=1,
            max_size=8,
        )
    )
    @settings(max_examples=300, deadline=None)
    def check(counts):
        thr = temperature_thresholds(counts)
        assert set(thr) == set(counts)
        assert all(0 <= t <= 1 << 32 for t in thr.values())
        quotas = {g: (thr[g] * counts[g]) >> 32 for g in counts}
        # no oversampling: the quota a threshold implies fits the group
        assert all(quotas[g] <= counts[g] for g in counts)
        # some group (the binder) is kept ~whole — quota within 2 of
        # its size (two integer floors in the T and quota divisions)
        # plus the hash-bucket quantization (threshold resolution is
        # 1/2^32 of the group, i.e. n>>32 rows — relative error 2^-32)
        assert any(quotas[g] >= counts[g] - 3 - (counts[g] >> 32) for g in counts)
        # flattening: the largest group's post-sampling share never
        # exceeds its natural share beyond floor-rounding slack (each
        # of the <=8 groups' quotas loses <1 row to its floor, and
        # T >= min count >= 1000, so the slack is ~1%)
        if len(counts) > 1:
            tq = sum(quotas.values())
            tn = sum(counts.values())
            gmax = max(counts, key=lambda g: (counts[g], g))
            if tq > 0:
                assert quotas[gmax] / tq <= counts[gmax] / tn * 1.05 + 1e-6

    check()
