"""Sessionization — gap-based session windows over an event stream.

Batch path: ``F.session_window`` (Catalyst-native merging session windows) —
one shuffle on the session key, whole-stage-codegen aggregation, AQE-skew
safe; at 100 TB this is a single key-partitioned pass, and the gap predicate
never materializes per-pair rows.  The same call shape works under
Structured Streaming with a watermark.

Custom stateful path (the brief's ``applyInPandasWithState`` capability) is
in ``streaming/stateful.py`` and is equivalence-tested against this batch
semantics on closed sessions.

Reference analogue: the reference has no time axis; the nearest shape is its
chunked commit-interval grouping of the update stream
(update/StrucmotifUpdate.java:195-221) — bounded groups delimited by a
threshold, processed group-at-a-time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap: str = "6 hours",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Gap-based sessions per ``key_col``: events within ``gap`` of the
    previous event chain into one session (Spark session_window semantics:
    the exact boundary MERGES — a session closes only when the next event
    is strictly more than ``gap`` after the previous one).

    Output: (key, session_start_epoch, n_events, sum_value) — the start is
    emitted as epoch seconds so batch, streaming and the SQL oracle agree
    byte-for-byte regardless of timezone rendering.
    """
    ts = F.col(ts_col).cast("timestamp")
    return (
        events.groupBy(
            F.session_window(ts, gap).alias("sw"), F.col(key_col)
        )
        .agg(
            F.count("*").alias("n_events"),
            # deterministic float64 sum: event-time order (ties by value),
            # same discipline as the scorers — an unordered parallel sum
            # could round differently across runs at 4dp boundaries and
            # break the batch/stream equivalence contract
            F.round(
                F.aggregate(
                    F.array_sort(
                        F.collect_list(F.struct(ts.alias("t"), F.col(value_col).alias("v")))
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x["v"],
                ),
                4,
            ).alias("sum_value"),
        )
        .select(
            key_col,
            F.unix_timestamp(F.col("sw.start")).alias("session_start_epoch"),
            "n_events",
            "sum_value",
        )
    )
