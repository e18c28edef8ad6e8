"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState``.

Where ``operators/sessions.sessionize`` answers the batch/SQL shape, this is
the *unbounded-stream* shape: per-key session state lives in the state
store, closed sessions are emitted in append mode, and an event-time timeout
(watermark-driven) closes idle sessions so state is bounded — the custom
stateful-operator capability the engine brief names explicitly.

Semantics match the batch operator exactly on closed sessions: a session
closes when the next event of the key arrives MORE than gap after the
previous one (session_window merges at the exact boundary), or when the
watermark passes last_event + gap.

Scale shape: state is per-key O(1) (four scalars), keys are hash-partitioned
by the state store, and each micro-batch touches only keys with new rows or
expiring timers — the same contract Flink keyed process functions and the
reference's bounded in-heap per-prefix maps (DefaultInvertedIndex.java:
133-136) rely on.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_epoch", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

# (session_start_ns, last_event_ns, n_events, sum_value)
_STATE_SCHEMA = StructType(
    [
        StructField("start_ns", LongType()),
        StructField("last_ns", LongType()),
        StructField("n", LongType()),
        StructField("s", DoubleType()),
    ]
)


def _session_fn(gap_seconds: int):
    gap_ns = int(gap_seconds) * 1_000_000_000

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        def emit(start_ns: int, n: int, s: float) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "user_id": [int(key[0])],
                    "session_start_epoch": [start_ns // 1_000_000_000],
                    "n_events": [int(n)],
                    "sum_value": [round(float(s), 4)],
                }
            )

        if state.hasTimedOut:
            start_ns, _last, n, s = state.get
            state.remove()
            yield emit(start_ns, n, s)
            return

        batches = [p for p in pdfs if len(p)]
        rows = pd.concat(batches) if batches else pd.DataFrame()
        open_state: tuple[Any, ...] | None = (
            tuple(state.get) if state.exists else None
        )
        if len(rows):
            rows = rows.sort_values("ts", kind="stable")
            ts_ns = (
                pd.to_datetime(rows["ts"]).astype("datetime64[ns]")
                .astype("int64").to_numpy()
            )
            vals = rows["value"].astype(float).to_numpy()
            for t, v in zip(ts_ns.tolist(), vals.tolist()):
                if open_state is None:
                    open_state = (t, t, 1, v)
                elif t - open_state[1] > gap_ns:
                    # gap exceeded: the running session closes here
                    yield emit(open_state[0], open_state[2], open_state[3])
                    open_state = (t, t, 1, v)
                else:
                    open_state = (
                        open_state[0], t, open_state[2] + 1,
                        open_state[3] + v,
                    )
        if open_state is not None:
            state.update(open_state)
            # event-time timer: close the session when the watermark passes
            # last_event + gap (must stay ahead of the current watermark)
            timeout_ms = open_state[1] // 1_000_000 + gap_seconds * 1000
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(timeout_ms, wm + 1))

    return fn


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 21600,
    watermark: str = "1 second",
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming sessionization: append-mode stream of CLOSED sessions.

    ``events`` is a streaming DataFrame with (ts timestamp, user_id long,
    value double).  Open sessions remain in the state store until a later
    event of the same key closes them or the event-time timer fires.
    """
    from pyspark.sql import functions as F

    stream = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            _session_fn(gap_seconds),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
