"""Sessionization: batch session_window semantics + the custom stateful
streaming operator (applyInPandasWithState) agreeing on closed sessions."""

from __future__ import annotations

import datetime as dt
import os
import time

from pyspark.sql import functions as F

from strucmotif_search_spark.operators.sessions import sessionize
from strucmotif_search_spark.streaming.stateful import sessionize_stream

BASE = dt.datetime(2024, 3, 1, 0, 0, 0)
GAP_S = 3600  # 1 hour


def _mk_events():
    """3 users; per-user sessions split by >= 1h gaps (values are exact in
    binary so sums are order-independent)."""
    rows = []

    def ev(uid, minutes, value):
        rows.append((BASE + dt.timedelta(minutes=minutes), uid, float(value)))

    # user 1: two sessions (3 events / 2 events), gap 180 min between
    ev(1, 0, 1.0); ev(1, 10, 2.0); ev(1, 50, 3.0)
    ev(1, 230, 4.0); ev(1, 260, 5.0)
    # user 2: one long chain (each step < 60 min) -> ONE session
    for i in range(5):
        ev(2, i * 55, 1.5)
    # user 3: boundary case — exactly 60 min gap MERGES (session_window
    # extends through the closed end of the interval); 61 min splits
    ev(3, 0, 7.0); ev(3, 60, 8.0); ev(3, 121, 9.0)
    return rows


def _expected():
    def epoch(minutes):
        return int((BASE + dt.timedelta(minutes=minutes)).timestamp())

    return {
        (1, epoch(0), 3, 6.0),
        (1, epoch(230), 2, 9.0),
        (2, epoch(0), 5, 7.5),
        (3, epoch(0), 2, 15.0),
        (3, epoch(121), 1, 9.0),
    }


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "ts timestamp, user_id long, value double"
    )


def test_sessionize_batch_exact(spark):
    out = sessionize(
        _df(spark, _mk_events()), gap="1 hour"
    ).collect()
    got = {
        (r["user_id"], r["session_start_epoch"], r["n_events"], r["sum_value"])
        for r in out
    }
    assert got == _expected()


def test_sessionize_stream_matches_batch(spark, tmp_path):
    src = tmp_path / "events_stream"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    # original events in one file; two far-future sentinel files (distinct
    # users) advance the watermark in two later micro-batches so every
    # original final session's event-time timer fires before the stream ends
    _df(spark, _mk_events()).coalesce(1).write.mode("overwrite").parquet(
        str(src / "part1")
    )
    far1 = [(BASE + dt.timedelta(days=10), 9001, 0.0)]
    far2 = [(BASE + dt.timedelta(days=30), 9002, 0.0)]
    _df(spark, far1).coalesce(1).write.parquet(str(src / "part2"))
    _df(spark, far2).coalesce(1).write.parquet(str(src / "part3"))
    # the file source orders batches by modification time
    now = time.time()
    for i, d in enumerate(["part1", "part2", "part3"]):
        for root, _dirs, files in os.walk(str(src / d)):
            for f in files:
                os.utime(os.path.join(root, f), (now + i, now + i))

    stream = (
        spark.readStream.schema("ts timestamp, user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/part*")
    )
    q = (
        sessionize_stream(stream, gap_seconds=GAP_S)
        .writeStream.format("memory")
        .queryName("sessions_out")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["user_id"], r["session_start_epoch"], r["n_events"], r["sum_value"])
        for r in spark.table("sessions_out")
        .where(F.col("user_id") < 9000)
        .collect()
    }
    assert got == _expected()


def test_sessionize_stream_out_of_order_merges_backward(spark, tmp_path):
    """Late events WITHIN the watermark must interval-merge: a late event
    extends a session backward instead of corrupting last_ns, and a batch
    can bridge two previously separate open sessions (round-3 review bug:
    the forward fold emitted {20,5} + {28} for this shape)."""
    src = tmp_path / "ooo_stream"
    src.mkdir()
    ckpt = str(tmp_path / "ooo_ckpt")
    gap_s = 600  # 10 min

    def ts(minutes):
        return BASE + dt.timedelta(minutes=minutes)

    # batch 1: t=20 only.  batch 2 (watermark still behind): late t=5 and
    # t=28.  Expected batch semantics over {5,20,28} with gap 10min:
    # {5} alone (15min to 20) and {20,28} merged.
    _df(spark, [(ts(20), 1, 1.0)]).coalesce(1).write.parquet(
        str(src / "part1")
    )
    _df(spark, [(ts(5), 1, 2.0), (ts(28), 1, 4.0)]).coalesce(1).write.parquet(
        str(src / "part2")
    )
    _df(spark, [(ts(24 * 60), 9001, 0.0)]).coalesce(1).write.parquet(
        str(src / "part3")
    )
    _df(spark, [(ts(48 * 60), 9002, 0.0)]).coalesce(1).write.parquet(
        str(src / "part4")
    )
    now = time.time()
    for i, d in enumerate(["part1", "part2", "part3", "part4"]):
        for root, _dirs, files in os.walk(str(src / d)):
            for f in files:
                os.utime(os.path.join(root, f), (now + i, now + i))

    stream = (
        spark.readStream.schema("ts timestamp, user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        # generous watermark delay: the late t=5 event must be admitted
        .parquet(f"{src}/part*")
    )
    q = (
        sessionize_stream(stream, gap_seconds=gap_s, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("ooo_sessions")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["user_id"], r["session_start_epoch"], r["n_events"], r["sum_value"])
        for r in spark.table("ooo_sessions")
        .where(F.col("user_id") < 9000)
        .collect()
    }
    assert got == {
        (1, int(ts(5).timestamp()), 1, 2.0),
        (1, int(ts(20).timestamp()), 2, 5.0),
    }


def test_sessionize_stream_watermark_exactly_on_gap_boundary(spark, tmp_path):
    """ADVICE round-3: when the watermark lands EXACTLY on last + gap, the
    session must stay open — an event at event_time == watermark is still
    admissible and an event exactly gap after last merges (batch semantics),
    so finalizing at <= would split one session in two."""
    src = tmp_path / "edge_stream"
    src.mkdir()
    ckpt = str(tmp_path / "edge_ckpt")
    gap_s = 600  # 10 min

    def ts(minutes):
        return BASE + dt.timedelta(minutes=minutes)

    # batch 1: user-1 event at t=0 (open session, last=0).
    # batch 2: sentinel at t=70min with 1h watermark delay -> watermark
    #   advances to exactly t=10min == last + gap.  Old <= rule emitted {0}
    #   here; the session must stay open.
    # batch 3: user-1 event at exactly t=10min (event_time == watermark,
    #   admissible) — must MERGE into the open session.
    # batches 4/5: far sentinels fire the close timer.
    parts = [
        [(ts(0), 1, 1.0)],
        [(ts(70), 9001, 0.0)],
        [(ts(10), 1, 2.0)],
        [(ts(24 * 60), 9002, 0.0)],
        [(ts(48 * 60), 9003, 0.0)],
    ]
    now = time.time()
    for i, rows in enumerate(parts):
        d = str(src / f"part{i + 1}")
        _df(spark, rows).coalesce(1).write.parquet(d)
        for root, _dirs, files in os.walk(d):
            for f in files:
                os.utime(os.path.join(root, f), (now + i, now + i))

    stream = (
        spark.readStream.schema("ts timestamp, user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/part*")
    )
    q = (
        sessionize_stream(stream, gap_seconds=gap_s, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("edge_sessions")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["user_id"], r["session_start_epoch"], r["n_events"], r["sum_value"])
        for r in spark.table("edge_sessions")
        .where(F.col("user_id") < 9000)
        .collect()
    }
    assert got == {(1, int(ts(0).timestamp()), 2, 3.0)}


def test_gap_merge_property_vs_event_level_reference():
    """_gap_merge over interval STATE must equal gap-sessionization over
    the flattened EVENT set — the invariant that makes out-of-order
    batches safe (round-3 regression area).  Intervals here are singleton
    events (start == last, n=1), the worst case for merge order."""
    import random

    from strucmotif_search_spark.streaming.stateful import _gap_merge

    rng = random.Random(99)
    for _ in range(300):
        gap = rng.randint(1, 20)
        ts = sorted(rng.sample(range(0, 200), rng.randint(1, 25)))
        intervals = [(t, t, 1, float(t % 7)) for t in ts]
        merged = _gap_merge(intervals, gap)
        # event-level reference: split where the gap is exceeded
        exp = []
        cur = [ts[0]]
        for t in ts[1:]:
            if t - cur[-1] <= gap:
                cur.append(t)
            else:
                exp.append(cur)
                cur = [t]
        exp.append(cur)
        assert [
            (st, la, n) for st, la, n, _s in merged
        ] == [(c[0], c[-1], len(c)) for c in exp], (gap, ts)
        for (st, la, n, s), c in zip(merged, exp):
            assert s == sum(float(t % 7) for t in c)
    # pre-merged multi-event intervals compose the same way
    ivs = [(0, 5, 3, 1.0), (7, 9, 2, 2.0), (30, 31, 1, 3.0)]
    assert _gap_merge(ivs, 2) == [(0, 9, 5, 3.0), (30, 31, 1, 3.0)]
    assert _gap_merge(ivs, 25) == [(0, 31, 6, 6.0)]
