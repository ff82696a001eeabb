"""Streaming heavy hitters — SpaceSaving (Metwally et al. 2005) as a
stateful streaming operator, the streaming twin of
``operators/sketch.topk_sketch_build``.

Shape: keys hash into ``n_buckets`` DISJOINT buckets (md5-derived, the
engine's deterministic bucket function), and each bucket key holds ONE
capacity-``k`` SpaceSaving summary as stream state. Because buckets
partition the key space, the global answer is the plain union of
bucket summaries (no cross-sketch upper-bound charging as in the batch
merge): a key's estimate is its bucket's estimate, and the global
absent-key bound is the max bucket err. State size is
O(n_buckets × capacity) — constant in stream length, the whole point.

Determinism: each micro-batch is pre-aggregated per key and folded in
(increment desc, key asc) order, so the summary depends only on the
multiset of events per batch, not on row order within the batch; the
eviction victim is the (count, key)-minimum. The exactness property —
capacity >= a bucket's distinct keys ⇒ the summary IS the exact count
table (err stays 0) — is what lets the registry gate hash-compare the
streaming output against a plain SQL GROUP BY; the eviction path's
guarantee (true <= est <= true + err, no key with true > err absent)
is pinned by pytest on an over-capacity stream.

Engine: dual, like tws.py's ledger (VERDICT r7 #7) —
``transformWithStateInPandas`` (the Spark-4 forward path: named
ValueState, not tied to the deprecated-path API) where pyspark's
protobuf runtime is importable, ``applyInPandasWithState`` (no extra
deps) otherwise; ``engine="auto"`` feature-detects and both engines
fold batches through the same ``_topk_fold`` code object, so their
per-batch arithmetic cannot drift.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("terms", T.ArrayType(T.StringType()), True),
        T.StructField("counts", T.ArrayType(T.LongType()), True),
        T.StructField("err", T.LongType(), True),
        T.StructField("n_total", T.LongType(), True),
    ]
)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("terms", T.ArrayType(T.StringType()), True),
        T.StructField("counts", T.ArrayType(T.LongType()), True),
        T.StructField("err", T.LongType(), True),
        T.StructField("n_total", T.LongType(), True),
    ]
)


def _topk_fold(
    terms: list, counts: list, err: int, n_total: int, pdf: pd.DataFrame,
    capacity: int, key_col: str,
) -> tuple[list, list, int, int]:
    """One micro-batch folded into a SpaceSaving summary. Shared by any
    engine so per-batch arithmetic cannot drift. Batch rows are
    pre-aggregated and applied in (increment desc, key asc) order —
    the summary is a function of the batch's key multiset only."""
    d = dict(zip(terms, counts))
    incs = pdf.groupby(key_col).size()
    n_total += int(incs.sum())
    for key, inc in sorted(incs.items(), key=lambda kv: (-kv[1], kv[0])):
        key, inc = str(key), int(inc)
        if key in d:
            d[key] += inc
        elif len(d) < capacity:
            d[key] = err + inc  # err == 0 until the first eviction
        else:
            victim = min(d, key=lambda t: (d[t], t))
            mn = d[victim]
            del d[victim]
            err = mn  # any absent key may have had up to mn
            d[key] = mn + inc
    items = sorted(d.items(), key=lambda kv: (-kv[1], kv[0]))
    return [k for k, _ in items], [int(v) for _, v in items], int(err), n_total


class TopKProcessor(StatefulProcessor):
    """SpaceSaving bucket summary in a named ValueState — the
    ``transformWithStateInPandas`` engine. Same fold, same output row
    shape as the applyInPandasWithState twin below."""

    def __init__(self, capacity: int) -> None:
        self._capacity = capacity

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("topk", _STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        if self._state.exists():
            terms, counts, err, n_total = self._state.get()
            terms, counts = list(terms), list(counts)
        else:
            terms, counts, err, n_total = [], [], 0, 0
        for pdf in rows:
            terms, counts, err, n_total = _topk_fold(
                terms, counts, err, n_total, pdf, self._capacity, "__k"
            )
        self._state.update((terms, counts, err, n_total))
        yield pd.DataFrame(
            {
                "bucket": [key[0]],
                "terms": [terms],
                "counts": [counts],
                "err": [err],
                "n_total": [n_total],
            }
        )

    def close(self) -> None:
        pass


def _hh_apply_in_pandas(keyed: DataFrame, capacity: int) -> DataFrame:
    """The same summary on the applyInPandasWithState engine (one
    opaque state tuple per bucket — this operator needs exactly one
    named state variable, so the engines are semantically identical)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        terms, counts, err, n_total = (
            state.get if state.exists else ([], [], 0, 0)
        )
        terms, counts = list(terms), list(counts)
        for pdf in pdfs:
            terms, counts, err, n_total = _topk_fold(
                terms, counts, err, n_total, pdf, capacity, "__k"
            )
        state.update((terms, counts, err, n_total))
        yield pd.DataFrame(
            {
                "bucket": [key[0]],
                "terms": [terms],
                "counts": [counts],
                "err": [err],
                "n_total": [n_total],
            }
        )

    return keyed.groupBy("bucket").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_heavy_hitters(
    events: DataFrame,
    key_col: str,
    capacity: int = 32,
    n_buckets: int = 8,
    engine: str = "auto",
) -> DataFrame:
    """Wire the SpaceSaving fold over a streaming frame. Update mode:
    each bucket's latest emission is its current summary. Bucket
    assignment is the engine's md5 bucket (replayable in any SQL
    engine), so a gate can reconstruct bucket membership exactly.

    ``engine``: ``"tws"`` = transformWithStateInPandas (named state,
    needs the protobuf runtime), ``"apply_in_pandas"`` =
    applyInPandasWithState (no extra deps), ``"auto"`` = tws where
    available, else the fallback — the same seam, availability probe,
    and shared-fold discipline as tws.stream_running_ledger."""
    from bw_new_data_integration_spark.streaming.tws import tws_available

    bucket = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10)
        .cast("bigint") % n_buckets
    ).cast("int")
    keyed = events.select(bucket.alias("bucket"), F.col(key_col).alias("__k"))
    if engine == "auto":
        engine = "tws" if tws_available() else "apply_in_pandas"
    if engine == "apply_in_pandas":
        return _hh_apply_in_pandas(keyed, capacity)
    if engine != "tws":
        raise ValueError(f"unknown engine {engine!r}")
    return keyed.groupBy("bucket").transformWithStateInPandas(
        statefulProcessor=TopKProcessor(capacity),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
