"""Streaming sessionization: the gap rule from operators/sessions.py as a
custom STATEFUL Structured Streaming operator via applyInPandasWithState.

This is the Spark-native rendering of a long-running per-key operator the
DataFrame API can't express declaratively: per-user open-session state
lives in the state store (checkpointed, exactly-once with the sink),
sessions are emitted as they CLOSE.

Two closing disciplines:

- **Event-time watermark** (``allowed_lateness_seconds`` set — the
  production mode): the stream carries ``withWatermark("ts", lateness)``
  and the operator uses EventTimeTimeout. A session closes exactly when
  the watermark passes ``session_end + gap`` — at that point no
  in-lateness event can extend it, so the emission is FINAL and
  deterministic in event time (no wall-clock dependence). Events older
  than the watermark are DROPPED and counted; each closed session carries
  the key's dropped-late count since its previous emission in the
  ``late_dropped`` column (the surfaced metric). In-watermark disorder is
  safe by construction: a session cannot have closed while an in-lateness
  event for it is still admissible. ≙ the reference diverting late
  records to a ``_late`` dataset and recompacting
  (MRCompactor.java:116,147-157) — done with event-time semantics instead
  of a second compaction pass.

- **Processing-time / no timers** (``allowed_lateness_seconds=None``):
  sessions close via the gap rule when a newer event arrives, or via a
  processing-time timeout; cross-batch late events fold into the open
  session monotonically (min start / max end). Use
  ``close_timeout_ms=None`` with availableNow drains.

Scale shape: state is keyed by user (hash-partitioned by the state store);
each micro-batch touches only keys present in the batch plus timed-out
keys. State size is O(active users), not O(events). The pandas function
receives Arrow record batches per key group — vectorized, no per-row
Python.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        # late events dropped for this key since its previous emission
        # (only populated in watermark mode; 0 otherwise)
        StructField("late_dropped", LongType()),
    ]
)

# open-session state: (start_epoch_us, last_epoch_us, n_events,
#                      dropped_late_since_last_emit)
SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
        StructField("dropped", LongType()),
    ]
)


def _emit(user_id, closed):
    def _ts(v):
        return pd.NaT if v is None else pd.Timestamp(v, unit="us")

    return pd.DataFrame(
        {
            "user_id": [int(user_id)] * len(closed),
            "session_start": [_ts(s) for s, _, _, _ in closed],
            "session_end": [_ts(e) for _, e, _, _ in closed],
            "n_events": [int(n) for _, _, n, _ in closed],
            "late_dropped": [int(d) for _, _, _, d in closed],
        }
    )


def make_session_fn(gap_seconds: int, close_timeout_ms: int | None = 30000):
    """applyInPandasWithState function for processing-time/no-timer mode.

    Event timestamps are compared in epoch microseconds. Within a batch the
    group's rows are sorted by ts; sessions close when the next event is
    > gap after the last, or (when ``close_timeout_ms`` is set) when the
    state times out after that much processing time with no new events.
    ``close_timeout_ms=None`` disables timers entirely — required for
    availableNow drains, where a pending processing-time timer keeps the
    trigger running no-data batches until the timer expires."""
    gap_us = gap_seconds * 1_000_000

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed = []  # (start_us, end_us, n, dropped)

        if state.hasTimedOut:
            if state.exists:
                start_us, last_us, n, _ = state.get
                closed.append((start_us, last_us, n, 0))
                state.remove()
        else:
            rows = pd.concat(list(pdfs))
            ts_us = (
                rows["ts"].astype("datetime64[us]").astype("int64")
            ).sort_values()
            if state.exists:
                start_us, last_us, n, _ = state.get
            else:
                start_us = last_us = None
                n = 0
            for t in ts_us:
                t = int(t)
                if start_us is None:
                    start_us, last_us, n = t, t, 1
                elif t - last_us > gap_us:
                    closed.append((start_us, last_us, n, 0))
                    start_us, last_us, n = t, t, 1
                else:
                    # Cross-batch disorder guard: an event older than the
                    # stored last_us must never regress the session window —
                    # extend it monotonically on both ends instead. Within a
                    # batch rows are sorted above, so this only triggers for
                    # late arrivals relative to state from a prior micro-batch;
                    # a late event within the gap re-joins the open session.
                    start_us = min(start_us, t)
                    last_us = max(last_us, t)
                    n += 1
            state.update((int(start_us), int(last_us), int(n), 0))
            if close_timeout_ms is not None:
                state.setTimeoutDuration(close_timeout_ms)

        if closed:
            yield _emit(user_id, closed)

    return fn


def make_watermark_session_fn(gap_seconds: int):
    """applyInPandasWithState function for EVENT-TIME watermark mode.

    The group state's lifecycle is driven by the stream watermark Spark
    computes from ``withWatermark`` (max event time seen minus allowed
    lateness, global across partitions):

    - rows with ts < watermark are dropped and counted into state;
    - admitted rows run the gap rule (in-batch sorted; in-watermark
      cross-batch disorder folds into the open session monotonically);
    - a session closed by the gap rule within a batch emits immediately
      (a newer event already proves the gap);
    - the OPEN session emits only when the watermark passes
      ``last + gap`` — via the event-time timeout, or detected on the next
      batch — so its emission is final: no admissible event can extend it.
    """
    gap_us = gap_seconds * 1_000_000

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed = []
        wm_us = state.getCurrentWatermarkMs() * 1000

        if state.hasTimedOut:
            if state.exists:
                start_us, last_us, n, dropped = state.get
                closed.append((start_us, last_us, n, dropped))
                state.remove()
            if closed:
                yield _emit(user_id, closed)
            return

        rows = pd.concat(list(pdfs))
        ts_all = rows["ts"].astype("datetime64[us]").astype("int64")
        late_mask = ts_all < wm_us
        ts_us = ts_all[~late_mask].sort_values()
        if state.exists:
            start_us, last_us, n, dropped = state.get
        else:
            start_us = last_us = None
            n = 0
            dropped = 0
        dropped += int(late_mask.sum())

        # the stored session may already be closeable: the watermark
        # advanced past last+gap between batches without this key timing
        # out yet (timeouts fire lazily) — close it before admitting rows
        if start_us is not None and wm_us > last_us + gap_us:
            closed.append((start_us, last_us, n, dropped))
            start_us = last_us = None
            n = 0
            dropped = 0

        for t in ts_us:
            t = int(t)
            if start_us is None:
                start_us, last_us, n = t, t, 1
            elif t - last_us > gap_us:
                closed.append((start_us, last_us, n, dropped))
                dropped = 0
                start_us, last_us, n = t, t, 1
            else:
                start_us = min(start_us, t)
                last_us = max(last_us, t)
                n += 1

        if start_us is not None:
            state.update((int(start_us), int(last_us), int(n), int(dropped)))
            # fire exactly when the watermark proves the session final;
            # must be strictly beyond the current watermark or Spark
            # rejects the timestamp
            close_at_ms = max((last_us + gap_us) // 1000 + 1,
                              wm_us // 1000 + 1)
            state.setTimeoutTimestamp(close_at_ms)
        else:
            if state.exists:
                state.remove()
            if dropped:
                # late rows with no open session to attach to: surface the
                # count as a zero-event marker row (n_events=0, null
                # window) rather than leaking it in unexpirable state —
                # downstream filters n_events > 0 for real sessions
                closed.append((None, None, 0, dropped))

        if closed:
            yield _emit(user_id, closed)

    return fn


def streaming_sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    close_timeout_ms: int | None = 30000,
    allowed_lateness_seconds: int | None = None,
) -> DataFrame:
    """Wire the stateful operator onto a streaming events DataFrame with
    columns (user_id, ts, ...). Returns the stream of CLOSED sessions.

    ``allowed_lateness_seconds`` set → event-time watermark mode: sessions
    close exactly when the watermark (max seen ts − lateness) passes
    ``session_end + gap``; older events are dropped and surfaced in the
    ``late_dropped`` output column. ``close_timeout_ms`` is ignored in
    this mode (event-time timeouts replace wall-clock timers, and they
    don't block availableNow drains).

    ``allowed_lateness_seconds=None`` → legacy behavior: the gap rule plus
    optional processing-time timeout; ``close_timeout_ms=None`` disables
    timers entirely (use with availableNow drains)."""
    if allowed_lateness_seconds is not None:
        return (
            events.withWatermark("ts", f"{int(allowed_lateness_seconds)} seconds")
            .groupBy("user_id")
            .applyInPandasWithState(
                make_watermark_session_fn(gap_seconds),
                outputStructType=SESSION_OUTPUT_SCHEMA,
                stateStructType=SESSION_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout,
            )
        )
    timeout = (
        GroupStateTimeout.NoTimeout
        if close_timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        make_session_fn(gap_seconds, close_timeout_ms),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
