"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState``.

The batch twin (operators/window_ops.sessionize) is a window function;
continuously, per-user session state must live across micro-batches —
exactly the shape Structured Streaming's arbitrary-state API exists
for. State per user = (last event time, sessions so far); a new
session starts when the gap since the last event exceeds the
threshold. Arrow-batched: the Python function sees pandas frames, one
group per call, and the state store scales with distinct users, not
events.

Run with an ``availableNow`` trigger this computes the same answer as
the batch operator — the cutover contract between scheduled-batch and
continuous mode.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_sessions", T.LongType(), False),
    ]
)

#: (last event whole seconds, session count)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_s", T.LongType(), True),
        T.StructField("n_sessions", T.LongType(), True),
    ]
)


def stream_sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-user running session count over an event-time stream.

    Emits one (user_id, n_sessions) row per user per micro-batch in
    update mode; the latest row per user is the current count.
    """
    gap_s = gap_minutes * 60

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_s, n_sessions = state.get
        else:
            last_s, n_sessions = None, 0
        # whole-second truncation per event matches the batch operator
        # (ts.cast('long')) — streaming and batch must agree exactly.
        # Arrow may deliver ns or us resolution; divide by the actual unit.
        ts = pd.concat([pdf["ts"] for pdf in pdfs])
        per_sec = {"datetime64[ns]": 1_000_000_000, "datetime64[us]": 1_000_000}[str(ts.dtype)]
        ts_s = (ts.astype("int64") // per_sec).sort_values()
        for t in ts_s:
            if last_s is None or t - last_s > gap_s:
                n_sessions += 1
            last_s = int(t)
        state.update((last_s, n_sessions))
        yield pd.DataFrame({"user_id": [key[0]], "n_sessions": [n_sessions]})

    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
