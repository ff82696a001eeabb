"""Stateful streaming on the Spark-4 ``transformWithStateInPandas``
API (beyond-reference).

``applyInPandasWithState`` (streaming/sessionize.py) carries ONE
opaque state tuple per key. The transformWithState processor model
generalizes it — named state variables (value/list/map state), TTL,
and event/processing-time timers — and is the forward path for custom
stateful operators in Spark 4. This module implements the pipeline
shape the batch engine's K1 sink needs continuously: a per-key running
upsert ledger (how many events, running measure total, last event
time), emitted per micro-batch in update mode.

Scale shape: state lives in the state store keyed by user — memory is
O(distinct keys), not O(events); rows stream through Arrow batches,
one group per call. Run with ``availableNow`` the final per-key totals
equal the batch aggregate (cutover contract; totals are monotone, so
``max`` over the per-batch emissions recovers the final row even when
availableNow splits the input into several micro-batches).

ENVIRONMENT NOTE: transformWithStateInPandas drives its state server
over protobuf — pyspark's generated ``StateMessage_pb2`` imports the
FULL ``google.protobuf`` runtime (descriptor pool + builder, runtime-
version-validated at import), so a vendored mini wire-format encoder
cannot stand in for it. Where that runtime is absent,
``stream_running_ledger`` transparently falls back to an
``applyInPandasWithState`` engine with IDENTICAL semantics and output
schema (``engine="auto"``, the default, feature-detects; pass
``engine="tws"``/``engine="apply_in_pandas"`` to pin). The semantics
contract is therefore testable on every environment; the TWS wiring
itself additionally exercises wherever protobuf is installed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("sum_value", T.DoubleType(), False),
        T.StructField("last_ts_s", T.LongType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType(), True),
        T.StructField("sum_value", T.DoubleType(), True),
        T.StructField("last_ts_s", T.LongType(), True),
    ]
)


class RunningLedgerProcessor(StatefulProcessor):
    """Per-key (n_events, sum_value, last_ts_s) ledger in a named
    ValueState; one updated row per key per micro-batch."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("ledger", _STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        if self._state.exists():
            n, total, last_s = self._state.get()
        else:
            n, total, last_s = 0, 0.0, 0
        for pdf in rows:
            n, total, last_s = _ledger_fold(n, total, last_s, pdf)
        self._state.update((n, total, last_s))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value": [total],
                "last_ts_s": [last_s],
            }
        )

    def close(self) -> None:
        pass


def tws_available() -> bool:
    """True when pyspark's transformWithState protobuf runtime is
    importable (the generated pb2 module hard-requires it)."""
    import importlib.util

    try:
        # find_spec imports the parent package, so a missing `google`
        # namespace raises instead of returning None
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        return False


def _ledger_fold(n: int, total: float, last_s: int, pdf: pd.DataFrame):
    """One micro-batch of rows folded into the ledger tuple — shared by
    both engines so they cannot drift."""
    n += len(pdf)
    total += float(pdf["value"].sum())
    ts = pdf["ts"]
    # Arrow may deliver s/ms/us/ns resolution; normalize to whole
    # seconds the same way the batch twin casts to long
    unit_div = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[
        str(ts.dtype).split("[")[1].rstrip("]")
    ] if "[" in str(ts.dtype) else 1
    batch_last = int(ts.astype("int64").max()) // unit_div
    return n, total, max(last_s, batch_last)


def _ledger_apply_in_pandas(events: DataFrame) -> DataFrame:
    """The same running ledger on the applyInPandasWithState engine
    (one opaque state tuple per key — sufficient for this operator's
    single named state variable)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total, last_s = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n, total, last_s = _ledger_fold(n, total, last_s, pdf)
        state.update((n, total, last_s))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value": [total],
                "last_ts_s": [last_s],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_running_ledger(events: DataFrame, engine: str = "auto") -> DataFrame:
    """Wire the ledger over a streaming events frame (cols: user_id,
    ts, value). Update mode: the latest emission per key is the
    current ledger row.

    ``engine``: ``"tws"`` = transformWithStateInPandas (named state,
    the Spark-4 forward path; needs the protobuf runtime),
    ``"apply_in_pandas"`` = applyInPandasWithState (no extra deps),
    ``"auto"`` = tws where available, else the fallback. Both engines
    share ``_ledger_fold``, so their per-batch arithmetic is the same
    code object.
    """
    if engine == "auto":
        engine = "tws" if tws_available() else "apply_in_pandas"
    if engine == "apply_in_pandas":
        return _ledger_apply_in_pandas(events)
    if engine != "tws":
        raise ValueError(f"unknown engine {engine!r}")
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningLedgerProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
