"""Sessionization: group a user's event stream into activity sessions
separated by inactivity gaps.

The reference processes event streams but leaves session semantics to
downstream consumers; a training-data pipeline needs them first-class
(e.g. building per-user interaction windows for conversational data).
Two renderings of the same semantics:

- batch (here): one shuffle on the user key, then a per-partition window —
  lag() to detect gap breaks, a running sum to number sessions. Pure JVM,
  whole-stage codegen, replayable in ANSI SQL (the DuckDB oracle runs the
  identical window formulation).
- streaming (gobblin_spark.streaming.sessions): the same gap rule as an
  applyInPandasWithState stateful operator — open-session state per user,
  sessions emitted as they close.

Scale shape: the only shuffle is hash(user); windows evaluate inside each
partition. Skewed users (one user = 10^8 events) are bounded by the same
salting machinery as the merge path if ever needed, but unlike joins a
window over one key cannot be split without changing semantics — the
correct 100 TB mitigation is range-partitioning within user by time chunk
and stitching boundary sessions, which gap-based sessions allow only when
chunk boundaries align to gaps; we document rather than silently shard.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign a session index per event: a new session starts when the gap
    since the user's previous event exceeds ``gap_seconds``. Adds
    ``session_idx`` (1-based per user, in time order)."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    # whole-microsecond arithmetic: unix_timestamp() truncates to seconds,
    # which disagrees with fractional-second engines at gap boundaries —
    # unix_micros is exact and portable (oracle uses epoch_us). The cast
    # handles TIMESTAMP_NTZ sources (parquet default); the session timezone
    # is pinned to UTC so NTZ→TIMESTAMP is value-preserving.
    def _us(c):
        return F.unix_micros(c.cast("timestamp"))

    is_new = (
        prev_ts.isNull()
        | (_us(F.col(ts_col)) - _us(prev_ts) > F.lit(gap_seconds * 1_000_000))
    ).cast("long")
    return df.withColumn(
        "session_idx",
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def session_stats(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-session aggregates: (user, session_idx, session_start,
    session_end, n_events, duration_sec)."""
    s = sessionize(df, user_col, ts_col, gap_seconds)
    return s.groupBy(user_col, "session_idx").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").cast("long").alias("n_events"),
        (
            (
                F.unix_micros(F.max(ts_col).cast("timestamp"))
                - F.unix_micros(F.min(ts_col).cast("timestamp"))
            )
            / F.lit(1_000_000)
        ).cast("long").alias("duration_sec"),
    )
