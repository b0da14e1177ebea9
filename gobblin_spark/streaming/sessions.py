"""Streaming sessionization: the gap rule from operators/sessions.py as a
custom STATEFUL Structured Streaming operator via applyInPandasWithState.

This is the Spark-native rendering of a long-running per-key operator the
DataFrame API can't express declaratively: per-user open-session state
lives in the state store (checkpointed, exactly-once with the sink),
sessions are emitted as they CLOSE — either because a newer event arrived
more than ``gap_seconds`` later, or because the processing-time timeout
fired with no new events.

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
    ]
)

# open-session state: (start_epoch_us, last_epoch_us, n_events)
SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
    ]
)


def make_session_fn(gap_seconds: int, close_timeout_ms: int | None = 30000):
    """Build the applyInPandasWithState function for a given gap.

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
        closed = []  # (start_us, end_us, n)

        if state.hasTimedOut:
            if state.exists:
                start_us, last_us, n = state.get
                closed.append((start_us, last_us, n))
                state.remove()
        else:
            rows = pd.concat(list(pdfs))
            ts_us = (
                rows["ts"].astype("datetime64[us]").astype("int64")
            ).sort_values()
            if state.exists:
                start_us, last_us, n = state.get
            else:
                start_us = last_us = None
                n = 0
            for t in ts_us:
                t = int(t)
                if start_us is None:
                    start_us, last_us, n = t, t, 1
                elif t - last_us > gap_us:
                    closed.append((start_us, last_us, n))
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
            state.update((int(start_us), int(last_us), int(n)))
            if close_timeout_ms is not None:
                state.setTimeoutDuration(close_timeout_ms)

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [int(user_id)] * len(closed),
                    "session_start": [
                        pd.Timestamp(s, unit="us") for s, _, _ in closed
                    ],
                    "session_end": [
                        pd.Timestamp(e, unit="us") for _, e, _ in closed
                    ],
                    "n_events": [int(n) for _, _, n in closed],
                }
            )

    return fn


def streaming_sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    close_timeout_ms: int | None = 30000,
) -> DataFrame:
    """Wire the stateful operator onto a streaming events DataFrame with
    columns (user_id, ts, ...). Returns the stream of CLOSED sessions.

    ``close_timeout_ms=None`` runs without processing-time timers (sessions
    close only via the gap rule) — use this with availableNow drains; a
    continuous tail should keep the timeout so idle users' last sessions
    eventually flush."""
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
