"""Limiter family: admission control for the extract.

≙ gobblin-utility/src/main/java/gobblin/util/limiter/ — RateBasedLimiter
(records/sec token budget), CountBasedLimiter (total record budget),
TimeBasedLimiter (wall-clock budget) — applied through
LimitingExtractorDecorator (gobblin-runtime/.../LimitingExtractorDecorator.java:41),
which stops the extract once permits run out.

Spark shape: the reference throttles each task's record iterator; Spark
records flow in whole partitions, so the analog is ADMISSION control at
planning time — before each batch the planner asks the limiter how many
records it may admit and trims the batch cap, and after commit reports the
records actually read. A rate limit therefore bounds sustained throughput
per planning loop rather than per row, which is the same contract at the
granularity Spark actually schedules.
"""

from __future__ import annotations

import time


class Limiter:
    def available(self) -> int:
        """How many records may be admitted right now (planner trims its
        per-batch cap to this)."""
        raise NotImplementedError

    def consume(self, n: int) -> None:
        """Report records actually read by a committed batch."""
        raise NotImplementedError


class CountBasedLimiter(Limiter):
    """Total record budget for a run (≙ CountBasedLimiter.java)."""

    def __init__(self, total: int):
        self.total = total
        self.used = 0

    def available(self) -> int:
        return max(0, self.total - self.used)

    def consume(self, n: int) -> None:
        self.used += n


class RateBasedLimiter(Limiter):
    """Sustained records/sec budget via a token bucket
    (≙ RateBasedLimiter.java:24 wrapping a guava RateLimiter).

    clock is injectable for deterministic tests; burst caps how far unused
    budget accumulates (default: 10 s of rate)."""

    def __init__(self, records_per_sec: float, burst_secs: float = 10.0,
                 clock=time.monotonic):
        self.rate = records_per_sec
        self.burst = records_per_sec * burst_secs
        self.clock = clock
        self._t0 = clock()
        self._consumed = 0.0

    def available(self) -> int:
        earned = (self.clock() - self._t0) * self.rate
        return int(max(0.0, min(earned - self._consumed, self.burst)))

    def consume(self, n: int) -> None:
        self._consumed += n


class TimeBasedLimiter(Limiter):
    """Stop admitting work after a wall-clock budget
    (≙ TimeBasedLimiter.java)."""

    def __init__(self, budget_secs: float, clock=time.monotonic):
        self.deadline = clock() + budget_secs
        self.clock = clock

    def available(self) -> int:
        return 2**62 if self.clock() < self.deadline else 0

    def consume(self, n: int) -> None:
        pass


class PoolBasedLimiter(Limiter):
    """Fixed pool of permits, released on consume
    (≙ gobblin-utility/.../limiter/PoolBasedLimiter.java, which wraps a
    Semaphore acquired per record batch and released on close).

    Spark shape: task-level concurrency permits are the Spark scheduler's
    job (executor cores × spark.task.cpus), so the useful planner-level
    rendering is an in-flight RECORD pool — ``available()`` reports the
    free permits, ``acquire(n)`` checks permits out for a batch being
    planned, and ``consume(n)`` (the post-commit report) checks them back
    in. Bounds how many records may be between extract and publish at once,
    which is the back-pressure contract the reference's Semaphore gives a
    streaming extractor."""

    def __init__(self, pool_size: int):
        self.pool_size = pool_size
        self.outstanding = 0

    def available(self) -> int:
        return max(0, self.pool_size - self.outstanding)

    def acquire(self, n: int) -> None:
        self.outstanding += n

    def consume(self, n: int) -> None:
        # post-commit report releases the batch's permits
        self.outstanding = max(0, self.outstanding - n)
