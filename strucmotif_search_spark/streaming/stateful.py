"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState``.

Where ``operators/sessions.sessionize`` answers the batch/SQL shape, this is
the *unbounded-stream* shape: per-key session state lives in the state
store, closed sessions are emitted in append mode, and an event-time timeout
(watermark-driven) closes idle sessions so state is bounded — the custom
stateful-operator capability the engine brief names explicitly.

Semantics match the batch operator exactly on closed sessions, INCLUDING
out-of-order arrival within the watermark: state holds the key's OPEN
session intervals (parallel arrays — every session whose ``last + gap`` is
still ahead of the watermark), each micro-batch's events are folded into
intervals and gap-merged against them (late events extend a session
backward; one batch can bridge two previously separate sessions), and a
session is emitted only once the watermark passes ``last_event + gap`` —
the point after which no admissible event can merge into it.  Eagerly
emitting anything younger would double-count a session that a later
in-watermark event extends.

State is bounded: open sessions per key <= watermark_delay/gap + 1, since
any older interval is emitted as soon as the watermark passes it.

Timezone: ``applyInPandasWithState`` delivers timestamps as tz-naive wall
time in ``spark.sql.session.timeZone`` while the state store's watermark is
true epoch millis, so the operator REQUIRES a UTC session timezone (checked
loudly at construction) — under any other zone every timeout comparison
would be offset by the zone's UTC delta and idle sessions would close on the
wrong micro-batch.

Scale shape: keys are hash-partitioned by the state store, and each
micro-batch touches only keys with new rows or expiring timers — the same
contract Flink keyed process functions and the reference's bounded in-heap
per-prefix maps (DefaultInvertedIndex.java:133-136) rely on.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
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

# parallel arrays over the key's OPEN sessions, ordered by start_ns
_STATE_SCHEMA = StructType(
    [
        StructField("start_ns", ArrayType(LongType())),
        StructField("last_ns", ArrayType(LongType())),
        StructField("n", ArrayType(LongType())),
        StructField("s", ArrayType(DoubleType())),
    ]
)

_UTC_ZONES = {"UTC", "Etc/UTC", "GMT", "Etc/GMT", "+00:00", "Z"}

Interval = tuple[int, int, int, float]  # (start_ns, last_ns, n, sum)


def _round4(x: float) -> float:
    """HALF_UP at 4 dp — matches Spark's F.round, NOT Python's round()
    (banker's half-even), so closed-session values agree with the batch
    operator on exact midpoints."""
    return float(Decimal(repr(float(x))).quantize(
        Decimal("0.0001"), rounding=ROUND_HALF_UP
    ))


def _gap_merge(intervals: list[Interval], gap_ns: int) -> list[Interval]:
    """Merge sorted-by-start intervals whose gap is <= gap_ns."""
    merged: list[Interval] = [intervals[0]]
    for st, la, n, s in intervals[1:]:
        p_st, p_la, p_n, p_s = merged[-1]
        if st - p_la <= gap_ns:
            merged[-1] = (min(p_st, st), max(p_la, la), p_n + n, p_s + s)
        else:
            merged.append((st, la, n, s))
    return merged


def _session_fn(gap_seconds: int):
    gap_ns = int(gap_seconds) * 1_000_000_000

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        def emit(sessions: list[Interval]) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "user_id": [int(key[0])] * len(sessions),
                    "session_start_epoch": [
                        st // 1_000_000_000 for st, _l, _n, _s in sessions
                    ],
                    "n_events": [int(n) for _st, _l, n, _s in sessions],
                    "sum_value": [_round4(s) for _st, _l, _n, s in sessions],
                }
            )

        def save(keep: list[Interval], wm_ms: int) -> None:
            if not keep:
                state.remove()
                return
            state.update((
                [st for st, _l, _n, _s in keep],
                [la for _st, la, _n, _s in keep],
                [n for _st, _l, n, _s in keep],
                [s for _st, _l, _n, s in keep],
            ))
            # timer at the EARLIEST close point still pending, kept ahead
            # of the current watermark as the API requires
            earliest_ms = min(la for _st, la, _n, _s in keep) // 1_000_000
            state.setTimeoutTimestamp(
                max(earliest_ms + gap_seconds * 1000, wm_ms + 1)
            )

        def load() -> list[Interval]:
            if not state.exists:
                return []
            starts, lasts, ns, ss = state.get
            return [
                (int(a), int(b), int(c), float(d))
                for a, b, c, d in zip(starts, lasts, ns, ss)
            ]

        wm_ms = state.getCurrentWatermarkMs()

        if state.hasTimedOut:
            sessions = load()
            # STRICT compare: an event exactly gap after last still merges
            # (the batch fold treats t - last == gap as same-session), and
            # Spark admits rows with event_time == watermark — so a session
            # is final only when last + gap < watermark, else one
            # batch-semantics session could split in two at the boundary
            done = [
                iv for iv in sessions
                if iv[1] + gap_ns < wm_ms * 1_000_000
            ]
            keep = [
                iv for iv in sessions
                if iv[1] + gap_ns >= wm_ms * 1_000_000
            ]
            state.remove()
            save(keep, wm_ms)
            if done:
                yield emit(sorted(done))
            return

        intervals = load()
        batches = [p for p in pdfs if len(p)]
        rows = pd.concat(batches) if batches else pd.DataFrame()
        if len(rows):
            rows = rows.sort_values("ts", kind="stable")
            ts_ns = (
                pd.to_datetime(rows["ts"]).astype("datetime64[ns]")
                .astype("int64").to_numpy()
            )
            vals = rows["value"].astype(float).to_numpy()
            cur: Interval | None = None
            for t, v in zip(ts_ns.tolist(), vals.tolist()):
                if cur is None:
                    cur = (t, t, 1, v)
                elif t - cur[1] > gap_ns:
                    intervals.append(cur)
                    cur = (t, t, 1, v)
                else:
                    cur = (cur[0], t, cur[2] + 1, cur[3] + v)
            if cur is not None:
                intervals.append(cur)
        if not intervals:
            return
        intervals.sort(key=lambda iv: (iv[0], iv[1]))
        merged = _gap_merge(intervals, gap_ns)
        # a session is FINAL only when the watermark has passed last + gap;
        # anything younger could still be extended by an admissible event.
        # STRICT compare (same edge as the timeout path above): an event at
        # exactly last + gap merges, and event_time == watermark is still
        # admissible, so last + gap == watermark must stay open
        done = [
            iv for iv in merged if iv[1] + gap_ns < wm_ms * 1_000_000
        ]
        keep = [
            iv for iv in merged if iv[1] + gap_ns >= wm_ms * 1_000_000
        ]
        save(keep, wm_ms)
        if done:
            yield emit(done)

    return fn


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 21600,
    watermark: str = "1 second",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Streaming sessionization: append-mode stream of CLOSED sessions.

    ``events`` is a streaming DataFrame with (``ts_col`` timestamp,
    ``key_col`` long, ``value_col`` double) — names are remapped onto the
    kernel's canonical columns, and the output key column is named after
    ``key_col``.  Open sessions remain in the state store until the
    event-time timer (watermark past ``last + gap``) closes them.
    """
    from pyspark.sql import functions as F

    tz = events.sparkSession.conf.get("spark.sql.session.timeZone")
    if tz not in _UTC_ZONES:
        raise ValueError(
            "sessionize_stream requires spark.sql.session.timeZone=UTC "
            f"(got {tz!r}): applyInPandasWithState delivers tz-naive wall "
            "time while watermarks are true epoch — any other zone offsets "
            "every timeout comparison by the zone delta"
        )
    stream = events.select(
        F.col(ts_col).cast("timestamp").alias("ts"),
        F.col(key_col).cast("long").alias("user_id"),
        F.col(value_col).cast("double").alias("value"),
    )
    out = (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_seconds),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    if key_col != "user_id":
        out = out.withColumnRenamed("user_id", key_col)
    return out
