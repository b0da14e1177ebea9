"""Time/date/hour watermark partitioning for query-based incremental pulls.

The reference's most-used incremental mode: a table is pulled by a time
column (e.g. ``updated_at``) in SNAPSHOT / APPEND_DAILY / APPEND_HOURLY
extracts, with the watermark axis expressed as a ``yyyyMMddHHmmss`` long and
split into bounded partitions per run. Semantics mirrored from:

- gobblin-core/src/main/java/gobblin/source/extractor/partition/Partitioner.java:49-89
  (interval normalization, snapshot-vs-append low/high watermark selection,
  append cutoff = CURRENTDATE/CURRENTHOUR end-of-period)
- gobblin-core/.../watermark/TimestampWatermark.java:61-105 (hour-stepped
  inclusive intervals, +1 s between partitions, interval recalc when the
  span exceeds maxIntervals)
- gobblin-core/.../watermark/DateWatermark.java:63-110 (day granularity:
  getInterval returns days+1 and the loop advances interval-1 days, i.e.
  inclusive day ranges with a 1-day gap step)
- gobblin-core/.../watermark/HourWatermark.java:60-117 (hour granularity,
  analogous +1 convention)
- gobblin-core/.../watermark/SimpleWatermark.java:48-105 (dense numeric)

All functions here are DRIVER-side planning math over O(#partitions) values
— never data. ``partition_predicate`` turns a planned partition into a
pushdown-able Column filter, so the extract scan prunes on the time column
(parquet min/max / JDBC WHERE-clause pushdown).

Values are naive local datetimes (the reference uses the JVM default
calendar; naive arithmetic avoids DST ambiguity and keeps planning
deterministic).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from datetime import datetime, timedelta
from enum import Enum

import pyspark.sql.functions as F

WM_FORMAT = "%Y%m%d%H%M%S"
DEFAULT_WATERMARK_VALUE = -1


class WatermarkType(Enum):
    SIMPLE = "simple"
    TIMESTAMP = "timestamp"
    DATE = "date"
    HOUR = "hour"


class ExtractType(Enum):
    SNAPSHOT = "snapshot"
    APPEND_DAILY = "append_daily"
    APPEND_HOURLY = "append_hourly"


# delta added to a committed watermark to start the next pull
# (≙ Watermark.getDeltaNumForNextWatermark: 1 s / 1 day / 1 h / 1)
DELTA_SECS = {
    WatermarkType.TIMESTAMP: 1,
    WatermarkType.DATE: 24 * 60 * 60,
    WatermarkType.HOUR: 60 * 60,
    WatermarkType.SIMPLE: 1,
}


def wm_to_dt(value: int) -> datetime:
    return datetime.strptime(f"{value:014d}", WM_FORMAT)


def dt_to_wm(dt: datetime) -> int:
    return int(dt.strftime(WM_FORMAT))


def _trunc_day(dt: datetime) -> datetime:
    return dt.replace(hour=0, minute=0, second=0, microsecond=0)


def _trunc_hour(dt: datetime) -> datetime:
    return dt.replace(minute=0, second=0, microsecond=0)


def _ceil_div(a: float, b: float) -> int:
    return int(math.ceil(a / b))


# ------------------------------------------------------------- getIntervals
def timestamp_intervals(
    low: int, high: int, interval_hours: int, max_intervals: int
) -> dict[int, int]:
    """≙ TimestampWatermark.getIntervals: inclusive [lwm, hwm] hour-stepped
    ranges; consecutive partitions separated by 1 second; interval widened
    to ceil(total_hours / max_intervals) when the span would exceed
    max_intervals partitions."""
    if interval_hours < 1:
        raise ValueError("partitionInterval should be at least 1")
    if max_intervals <= 0:
        raise ValueError("maxIntervals should be positive")
    out: dict[int, int] = {}
    if low > high:
        return out
    start, end = wm_to_dt(low), wm_to_dt(high)
    total_hours = _ceil_div((end - start).total_seconds() * 1000, 3_600_000)
    interval = interval_hours
    if _ceil_div(total_hours, interval_hours) > max_intervals:
        interval = _ceil_div(total_hours, max_intervals)
    if interval == 0:
        return out
    while start <= end:
        nxt = start + timedelta(hours=interval)
        out[dt_to_wm(start)] = dt_to_wm(min(nxt, end))
        start = nxt + timedelta(seconds=DELTA_SECS[WatermarkType.TIMESTAMP])
    return out


def date_intervals(
    low: int, high: int, interval_hours: int, max_intervals: int
) -> dict[int, int]:
    """≙ DateWatermark.getIntervals: day-granularity inclusive ranges. The
    reference's getInterval returns days+1 and the loop advances
    (interval-1) days then steps one more day — i.e. each partition covers
    ``days`` date values inclusive with no overlap."""
    if interval_hours < 24:
        raise ValueError("partitionInterval should be at least 24 hrs")
    if max_intervals <= 0:
        raise ValueError("maxIntervals should be positive")
    out: dict[int, int] = {}
    if low > high:
        return out
    start = _trunc_day(wm_to_dt(low))
    end = _trunc_day(wm_to_dt(high))
    day_interval = interval_hours // 24
    total_hours = _ceil_div((end - start).total_seconds() * 1000, 3_600_000)
    if _ceil_div(total_hours, day_interval * 24) > max_intervals:
        day_interval = _ceil_div(total_hours, max_intervals) // 24
    interval = day_interval + 1
    while start <= end:
        nxt = start + timedelta(days=interval - 1)
        out[dt_to_wm(start)] = dt_to_wm(min(nxt, end))
        start = nxt + timedelta(seconds=DELTA_SECS[WatermarkType.DATE])
    return out


def hour_intervals(
    low: int, high: int, interval_hours: int, max_intervals: int
) -> dict[int, int]:
    """≙ HourWatermark.getIntervals: hour-granularity inclusive ranges with
    the same +1 convention as DATE."""
    if interval_hours < 1:
        raise ValueError("partitionInterval should be at least 1")
    if max_intervals <= 0:
        raise ValueError("maxIntervals should be positive")
    out: dict[int, int] = {}
    if low > high:
        return out
    start = _trunc_hour(wm_to_dt(low))
    end = _trunc_hour(wm_to_dt(high))
    hour_interval = interval_hours
    total_hours = _ceil_div((end - start).total_seconds() * 1000, 3_600_000)
    if _ceil_div(total_hours, hour_interval) > max_intervals:
        hour_interval = _ceil_div(total_hours, max_intervals)
    interval = hour_interval + 1
    while start <= end:
        nxt = start + timedelta(hours=interval - 1)
        out[dt_to_wm(start)] = dt_to_wm(min(nxt, end))
        start = nxt + timedelta(seconds=DELTA_SECS[WatermarkType.HOUR])
    return out


def simple_intervals(
    low: int, high: int, interval: int, max_intervals: int
) -> dict[int, int]:
    """≙ SimpleWatermark.getIntervals: dense numeric ranges, interval
    widened when the count would exceed max_intervals."""
    if interval < 1:
        raise ValueError("partitionInterval should be at least 1")
    if max_intervals <= 0:
        raise ValueError("maxIntervals should be positive")
    out: dict[int, int] = {}
    if low > high:
        return out
    total = int(math.ceil(high / interval - low / interval))
    if total > max_intervals:
        interval = int(math.ceil(high / max_intervals - low / max_intervals))
    start = low
    while start <= high:
        nxt = start + interval
        out[start] = min(nxt, high)
        start = nxt + DELTA_SECS[WatermarkType.SIMPLE]
    return out


_INTERVAL_FNS = {
    WatermarkType.TIMESTAMP: timestamp_intervals,
    WatermarkType.DATE: date_intervals,
    WatermarkType.HOUR: hour_intervals,
    WatermarkType.SIMPLE: simple_intervals,
}


# --------------------------------------------------------------- partitioner
@dataclass
class TimePartitioner:
    """≙ Partitioner.getPartitions: previous watermark (+delta, -backup) →
    low; extract-type cutoff → high; watermark-type interval split.

    current_time is an explicit argument (the reference reads the wall
    clock) so planning stays deterministic and testable.
    """

    extract_type: ExtractType = ExtractType.SNAPSHOT
    watermark_type: WatermarkType = WatermarkType.TIMESTAMP
    partition_interval: int = 1  # hours (days for APPEND_DAILY)
    max_partitions: int = 100
    start_value: int | None = None  # SOURCE_QUERYBASED_START_VALUE
    end_value: int | None = None  # SOURCE_QUERYBASED_END_VALUE
    low_watermark_backup_secs: int = 0
    # APPEND_* cutoff offset in periods (≙ CURRENTDATE-n / CURRENTHOUR-n)
    append_limit_delta: int = 0

    def _updated_interval(self) -> int:
        """≙ Partitioner.getUpdatedInterval: DATE snapshots and daily
        appends express the interval in days → convert to hours."""
        i = self.partition_interval
        if (self.extract_type == ExtractType.SNAPSHOT
                and self.watermark_type == WatermarkType.DATE):
            return i * 24
        if self.extract_type == ExtractType.APPEND_DAILY:
            return max(i, 1) * 24
        return i

    def _low(self, previous_watermark: int | None) -> int:
        if previous_watermark is None or previous_watermark == DEFAULT_WATERMARK_VALUE:
            if self.start_value is None:
                return DEFAULT_WATERMARK_VALUE
            return self.start_value
        delta = DELTA_SECS[self.watermark_type]
        if self.extract_type == ExtractType.SNAPSHOT:
            delta -= self.low_watermark_backup_secs
        if self.watermark_type == WatermarkType.SIMPLE:
            return previous_watermark + delta
        return dt_to_wm(wm_to_dt(previous_watermark) + timedelta(seconds=delta))

    def _high(self, current_time: datetime) -> int:
        if self.end_value is not None:
            return self.end_value
        if self.extract_type == ExtractType.SNAPSHOT:
            if self.watermark_type == WatermarkType.SIMPLE:
                return DEFAULT_WATERMARK_VALUE
            return dt_to_wm(current_time)
        # append cutoff (≙ getAppendWatermarkCutoff)
        if self.append_limit_delta == 0:
            return dt_to_wm(current_time)
        if self.extract_type == ExtractType.APPEND_DAILY:
            day = _trunc_day(current_time - timedelta(
                hours=self.append_limit_delta * 24))
            return dt_to_wm(day + timedelta(seconds=86_399))  # 23:59:59
        hour = _trunc_hour(current_time - timedelta(
            hours=self.append_limit_delta))
        return dt_to_wm(hour + timedelta(seconds=3_599))  # x:59:59

    def get_partitions(
        self,
        previous_watermark: int | None,
        current_time: datetime,
    ) -> list[tuple[int, int]]:
        """Planned (low, high) inclusive watermark partitions, sorted."""
        low = self._low(previous_watermark)
        high = self._high(current_time)
        if low == DEFAULT_WATERMARK_VALUE or high == DEFAULT_WATERMARK_VALUE:
            return [(low, high)]
        fn = _INTERVAL_FNS[self.watermark_type]
        intervals = fn(low, high, self._updated_interval(), self.max_partitions)
        return sorted(intervals.items())


def partition_predicate(time_col, low: int, high: int,
                        watermark_type: WatermarkType):
    """Pushdown filter for one planned partition: inclusive at the
    watermark type's granularity (≙ getTimestampPredicateCondition /
    getDatePredicateCondition / getHourPredicateCondition building
    ``col >= low AND col <= high`` WHERE clauses)."""
    c = F.col(time_col) if isinstance(time_col, str) else time_col
    if watermark_type == WatermarkType.SIMPLE:
        return (c >= F.lit(low)) & (c <= F.lit(high))
    if watermark_type == WatermarkType.DATE:
        c = F.date_trunc("day", c)
    elif watermark_type == WatermarkType.HOUR:
        c = F.date_trunc("hour", c)
    else:
        # second-granularity watermark: compare at second granularity so a
        # sub-second tail on the boundary row is not lost between runs
        c = F.date_trunc("second", c)
    lo_ts = F.lit(wm_to_dt(low).strftime("%Y-%m-%d %H:%M:%S")).cast("timestamp")
    hi_ts = F.lit(wm_to_dt(high).strftime("%Y-%m-%d %H:%M:%S")).cast("timestamp")
    return (c >= lo_ts) & (c <= hi_ts)
