"""Sessionization: batch window semantics + the streaming stateful twin
(applyInPandasWithState) must agree on closed sessions."""

import datetime as dt
import os

import pyspark.sql.functions as F
import pytest


def _ts(day, h, m=0, s=0):
    return dt.datetime(2024, 1, day, h, m, s)


def test_batch_sessionize_gap_rule(spark):
    from gobblin_spark.operators.sessions import session_stats, sessionize

    rows = [
        # user 1: two sessions (gap of 3h > 1h threshold)
        (1, _ts(1, 9, 0)), (1, _ts(1, 9, 30)), (1, _ts(1, 10, 15)),
        (1, _ts(1, 14, 0)), (1, _ts(1, 14, 20)),
        # user 2: single event = single session
        (2, _ts(1, 12, 0)),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    s = sessionize(df, "user_id", "ts", gap_seconds=3600)
    got = {(r["user_id"], r["ts"]): r["session_idx"] for r in s.collect()}
    assert got[(1, _ts(1, 9, 0))] == 1
    assert got[(1, _ts(1, 10, 15))] == 1
    assert got[(1, _ts(1, 14, 0))] == 2
    assert got[(2, _ts(1, 12, 0))] == 1

    stats = {
        (r["user_id"], r["session_idx"]): r
        for r in session_stats(df, "user_id", "ts", gap_seconds=3600).collect()
    }
    assert stats[(1, 1)]["n_events"] == 3
    assert stats[(1, 1)]["duration_sec"] == 75 * 60
    assert stats[(1, 2)]["n_events"] == 2
    assert stats[(2, 1)]["duration_sec"] == 0


def test_batch_sessionize_microsecond_boundary(spark):
    """Gap exactly == threshold stays one session; threshold + 1 µs splits."""
    from gobblin_spark.operators.sessions import sessionize

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    exact = base + dt.timedelta(seconds=3600)
    over = base + dt.timedelta(seconds=3600, microseconds=1)
    df = spark.createDataFrame(
        [(1, base), (1, exact), (2, base), (2, over)], ["user_id", "ts"]
    )
    got = {
        (r["user_id"], r["ts"]): r["session_idx"]
        for r in sessionize(df, "user_id", "ts", gap_seconds=3600).collect()
    }
    assert got[(1, exact)] == 1      # == gap: same session
    assert got[(2, over)] == 2       # > gap by 1 µs: new session


def test_streaming_sessionize_matches_batch_closed_sessions(
    spark, tmp_table_dir
):
    """Drive the stateful operator through a real availableNow stream; the
    emitted (closed) sessions must equal the batch sessionizer's output
    minus each user's final (still-open) session."""
    from gobblin_spark.operators.sessions import session_stats
    from gobblin_spark.streaming.sessions import streaming_sessionize

    rows = []
    for u in range(4):
        t = dt.datetime(2024, 1, 1, 6 + u, 0, 0)
        for sess in range(3):
            for i in range(2 + (u + sess) % 3):
                rows.append((u, t))
                t += dt.timedelta(minutes=10)
            t += dt.timedelta(hours=2)  # close the session (gap 1h)
    src = os.path.join(tmp_table_dir, "events_src")
    # single file → single micro-batch → deterministic in-batch ordering
    spark.createDataFrame(rows, ["user_id", "ts"]).coalesce(1).write.parquet(
        src
    )

    stream = (
        spark.readStream.schema("user_id long, ts timestamp").parquet(src)
    )
    # no timers: only the gap rule may close sessions, and an availableNow
    # drain must not wait on pending processing-time timers.
    closed = streaming_sessionize(
        stream, gap_seconds=3600, close_timeout_ms=None
    )
    q = (
        closed.writeStream.format("memory")
        .queryName("sessions_out")
        .option(
            "checkpointLocation", os.path.join(tmp_table_dir, "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()  # availableNow: blocks until the drain completes

    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("SELECT * FROM sessions_out").collect()
    }

    batch = session_stats(
        spark.createDataFrame(rows, ["user_id", "ts"]),
        "user_id", "ts", gap_seconds=3600,
    )
    last_idx = batch.groupBy("user_id").agg(
        F.max("session_idx").alias("last_idx")
    )
    expected_df = batch.join(last_idx, "user_id").filter(
        F.col("session_idx") < F.col("last_idx")
    )
    expected = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in expected_df.collect()
    }
    assert got == expected
    assert len(expected) == 4 * 2  # 2 closed sessions per user


def test_streaming_sessionize_out_of_order_across_batches(
    spark, tmp_table_dir
):
    """Cross-batch disorder: an event OLDER than the stored last_us must
    extend the open session monotonically (min start / max last), never
    regress it — a regressed last_us would let a later in-order event
    falsely exceed the gap and split the session."""
    import glob
    import shutil

    from gobblin_spark.streaming.sessions import streaming_sessionize

    src = os.path.join(tmp_table_dir, "ooo_src")
    os.makedirs(src)

    def _write_batch(name, rows, mtime):
        stage = os.path.join(tmp_table_dir, f"stage_{name}")
        spark.createDataFrame(
            rows, "user_id long, ts timestamp"
        ).coalesce(1).write.parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dst = os.path.join(src, f"{name}.parquet")
        shutil.copy(part, dst)
        os.utime(dst, (mtime, mtime))  # file source orders by mtime

    t = lambda h, m: dt.datetime(2024, 1, 1, h, m)  # noqa: E731
    # batch 1: in-order events 10:00, 10:10
    _write_batch("a", [(1, t(10, 0)), (1, t(10, 10))], 1_000_000_000)
    # batch 2: 10:05 arrives LATE (older than stored last 10:10), then
    # 13:00 (> 1h gap after 10:10) closes the session
    _write_batch("b", [(1, t(10, 5)), (1, t(13, 0))], 1_000_001_000)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    closed = streaming_sessionize(
        stream, gap_seconds=3600, close_timeout_ms=None
    )
    q = (
        closed.writeStream.format("memory")
        .queryName("ooo_sessions")
        .option(
            "checkpointLocation", os.path.join(tmp_table_dir, "ooo_ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = [
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("SELECT * FROM ooo_sessions").collect()
    ]
    # exactly ONE closed session: 10:00-10:10 with all 3 events (the late
    # 10:05 folded in); the 13:00 session remains open (no timers)
    assert got == [(1, t(10, 0), t(10, 10), 3)]


def test_streaming_sessionize_event_time_watermark(spark, tmp_table_dir):
    """Event-time watermark mode (gap 1h, allowed lateness 30min), driven
    through real micro-batches (maxFilesPerTrigger=1, mtime-ordered):

    - an event older than the watermark is DROPPED and surfaced in the
      closing session's late_dropped count;
    - an in-watermark late event is absorbed into the open session;
    - the open session closes via the gap rule when a newer event proves
      the gap, and via the EVENT-TIME TIMEOUT when another key's events
      advance the watermark past session_end + gap (no wall clock);
    - a late-only batch for a key with no open session emits a zero-event
      marker row carrying the count;
    - the emitted sessions equal the batch sessionizer run over the
      surviving (non-dropped) events — the batch twin."""
    import glob
    import shutil

    from gobblin_spark.operators.sessions import session_stats
    from gobblin_spark.streaming.sessions import streaming_sessionize

    src = os.path.join(tmp_table_dir, "wm_src")
    os.makedirs(src)

    def _write_batch(name, rows, mtime):
        stage = os.path.join(tmp_table_dir, f"wm_stage_{name}")
        spark.createDataFrame(
            rows, "user_id long, ts timestamp"
        ).coalesce(1).write.parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dst = os.path.join(src, f"{name}.parquet")
        shutil.copy(part, dst)
        os.utime(dst, (mtime, mtime))

    t = lambda h, m: dt.datetime(2024, 1, 1, h, m)  # noqa: E731
    base = 1_000_000_000
    # batch a: in-order 10:00, 10:10 → watermark for batch b = 09:40
    _write_batch("a", [(1, t(10, 0)), (1, t(10, 10))], base)
    # batch b: 09:30 < wm → dropped+counted; 10:05 in-watermark late →
    # absorbed; 13:00 proves the 1h gap → session 1 closes (n=3, late=1);
    # also user 3's only event is LATE → zero-event marker row
    _write_batch("b", [(1, t(9, 30)), (1, t(10, 5)), (1, t(13, 0)),
                       (3, t(9, 0))], base + 1000)
    # batch c: wm = 12:30; 16:00 proves the gap → session 2 closes (n=1)
    _write_batch("c", [(1, t(16, 0))], base + 2000)
    # batch d: another KEY's event raises max-seen to 18:00
    _write_batch("d", [(2, t(18, 0))], base + 3000)
    # batch e: wm = 17:30 > 16:00+gap → user 1's event-time timeout fires,
    # session 3 closes with NO new event for user 1
    _write_batch("e", [(2, t(18, 1))], base + 4000)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    closed = streaming_sessionize(
        stream, gap_seconds=3600, allowed_lateness_seconds=1800
    )
    q = (
        closed.writeStream.format("memory")
        .queryName("wm_sessions")
        .option("checkpointLocation", os.path.join(tmp_table_dir, "wm_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    rows = spark.sql("SELECT * FROM wm_sessions").collect()
    sessions = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"],
         r["late_dropped"]) for r in rows if r["n_events"] > 0)
    assert sessions == [
        (1, t(10, 0), t(10, 10), 3, 1),   # absorbed 10:05, dropped 09:30
        (1, t(13, 0), t(13, 0), 1, 0),    # closed by the gap rule
        (1, t(16, 0), t(16, 0), 1, 0),    # closed by event-time timeout
    ]
    markers = [(r["user_id"], r["late_dropped"]) for r in rows
               if r["n_events"] == 0]
    assert markers == [(3, 1)]
    assert all(r["session_start"] is None and r["session_end"] is None
               for r in rows if r["n_events"] == 0)

    # batch twin: the same sessions come out of the batch operator over
    # the events that survived the watermark (user 1, minus 09:30)
    surviving = [(1, x) for x in
                 [t(10, 0), t(10, 5), t(10, 10), t(13, 0), t(16, 0)]]
    twin = session_stats(
        spark.createDataFrame(surviving, ["user_id", "ts"]),
        "user_id", "ts", gap_seconds=3600)
    want = sorted((r["user_id"], r["session_start"], r["session_end"],
                   r["n_events"]) for r in twin.collect())
    assert [(u, s, e, n) for u, s, e, n, _ in sessions] == want
