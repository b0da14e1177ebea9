"""Watermark-interval math vs the reference's own unit-test cases
(gobblin-core/src/test/java/gobblin/source/extractor/watermark/
TimestampWatermarkTest.java / DateWatermarkTest.java / HourWatermarkTest.java
/ SimpleWatermarkTest.java — expected values copied verbatim)."""

from datetime import datetime

import pytest

from gobblin_spark.plans.time_partition import (
    ExtractType,
    TimePartitioner,
    WatermarkType,
    date_intervals,
    hour_intervals,
    simple_intervals,
    timestamp_intervals,
)

LOW = 20130501130000
HIGH = 20130502080000


# --------------------------------------------------------------- TIMESTAMP
def test_ts_invalid_args():
    with pytest.raises(ValueError):
        timestamp_intervals(LOW, HIGH, 0, 1000)
    with pytest.raises(ValueError):
        timestamp_intervals(LOW, HIGH, -5, 1000)
    with pytest.raises(ValueError):
        timestamp_intervals(LOW, HIGH, 1, 0)
    with pytest.raises(ValueError):
        timestamp_intervals(LOW, HIGH, 1, -1)


def test_ts_interval_larger_than_diff():
    # one partition spanning the whole range
    assert timestamp_intervals(LOW, HIGH, 1000, 1000) == {LOW: HIGH}


def test_ts_num_intervals_exceeds_max():
    # 19h span, interval 1h, max 1 → widened to one partition
    assert timestamp_intervals(LOW, HIGH, 1, 1) == {LOW: HIGH}


def test_ts_low_exceeds_high():
    assert timestamp_intervals(HIGH, LOW, 1, 10) == {}


def test_ts_low_equals_high():
    assert timestamp_intervals(LOW, LOW, 1, 10) == {LOW: LOW}


def test_ts_plain_split():
    # 19h span, 6h interval, plenty of partitions allowed:
    # inclusive ranges stepped by 1 s
    got = timestamp_intervals(LOW, HIGH, 6, 100)
    assert got == {
        20130501130000: 20130501190000,
        20130501190001: 20130502010001,
        20130502010002: 20130502070002,
        20130502070003: 20130502080000,
    }


# -------------------------------------------------------------------- DATE
def test_date_neg_diff():
    assert date_intervals(20150206000000, 20150201000000, 30, 4) == {}


def test_date_zero_diff():
    assert date_intervals(20150201000000, 20150201000000, 30, 4) == {
        20150201000000: 20150201000000
    }


def test_date_on_partition():
    # DateWatermarkTest.testGetIntervalsOnParition
    assert date_intervals(20150201000000, 20150206000000, 30, 4) == {
        20150201000000: 20150202000000,
        20150203000000: 20150204000000,
        20150205000000: 20150206000000,
    }


def test_date_on_max_interval():
    # DateWatermarkTest.testGetIntervalsOnMaxInterval
    assert date_intervals(20150201000000, 20150206000000, 30, 2) == {
        20150201000000: 20150203000000,
        20150204000000: 20150206000000,
    }


def test_date_invalid():
    with pytest.raises(ValueError):
        date_intervals(20150201000000, 20150206000000, 23, 4)
    with pytest.raises(ValueError):
        date_intervals(20150201000000, 20150206000000, 30, 0)


# -------------------------------------------------------------------- HOUR
def test_hour_on_partition():
    # HourWatermarkTest.testGetIntervalsOnParition
    assert hour_intervals(20150201010000, 20150201050000, 2, 4) == {
        20150201010000: 20150201030000,
        20150201040000: 20150201050000,
    }


def test_hour_on_max_interval():
    # HourWatermarkTest.testGetIntervalsOnMaxInterval (minutes truncated)
    assert hour_intervals(20150201011111, 20150202011111, 2, 2) == {
        20150201010000: 20150201130000,
        20150201140000: 20150202010000,
    }


def test_hour_neg_and_zero_diff():
    assert hour_intervals(20150202000000, 20150201000000, 2, 4) == {}
    assert hour_intervals(20150201010000, 20150201010000, 2, 4) == {
        20150201010000: 20150201010000
    }


# ------------------------------------------------------------------ SIMPLE
def test_simple_split_and_recalc():
    assert simple_intervals(0, 100, 40, 10) == {0: 40, 41: 81, 82: 100}
    # 0..1000 step 10 would be 100 partitions; max 4 widens to 250
    got = simple_intervals(0, 1000, 10, 4)
    assert got == {0: 250, 251: 501, 502: 752, 753: 1000}


# ------------------------------------------------------------- Partitioner
def test_partitioner_snapshot_timestamp_low_from_previous():
    p = TimePartitioner(
        extract_type=ExtractType.SNAPSHOT,
        watermark_type=WatermarkType.TIMESTAMP,
        partition_interval=6,
        max_partitions=100,
    )
    parts = p.get_partitions(20130501125959, datetime(2013, 5, 2, 8, 0, 0))
    # low = prev + 1s; high = current time
    assert parts[0][0] == 20130501130000
    assert parts[-1][1] == 20130502080000


def test_partitioner_append_daily_interval_days():
    # APPEND_DAILY: partition_interval expressed in DAYS; cutoff is the
    # current time when no limit delta is set
    p = TimePartitioner(
        extract_type=ExtractType.APPEND_DAILY,
        watermark_type=WatermarkType.DATE,
        partition_interval=1,
        max_partitions=100,
        start_value=20150201000000,
    )
    parts = p.get_partitions(None, datetime(2015, 2, 6, 12, 0, 0))
    assert parts == [
        (20150201000000, 20150202000000),
        (20150203000000, 20150204000000),
        (20150205000000, 20150206000000),
    ]


def test_partitioner_append_daily_cutoff_delta():
    # CURRENTDATE-1: high = end of yesterday 23:59:59
    p = TimePartitioner(
        extract_type=ExtractType.APPEND_DAILY,
        watermark_type=WatermarkType.TIMESTAMP,
        partition_interval=100,
        max_partitions=100,
        start_value=20150201000000,
        append_limit_delta=1,
    )
    parts = p.get_partitions(None, datetime(2015, 2, 6, 12, 0, 0))
    assert parts[-1][1] == 20150205235959


def test_partitioner_append_hourly_cutoff_delta():
    p = TimePartitioner(
        extract_type=ExtractType.APPEND_HOURLY,
        watermark_type=WatermarkType.HOUR,
        partition_interval=100,
        max_partitions=100,
        start_value=20150206000000,
        append_limit_delta=2,
    )
    parts = p.get_partitions(None, datetime(2015, 2, 6, 12, 30, 0))
    # cutoff is 10:59:59 but the HOUR granularity truncates interval
    # endpoints to the hour (≙ HourWatermark.extractFromTimestamp)
    assert parts[-1][1] == 20150206100000
    assert p._high(datetime(2015, 2, 6, 12, 30, 0)) == 20150206105959


def test_partitioner_simple_snapshot_defaults():
    # SIMPLE snapshot: no high watermark derivable → default sentinel pair
    p = TimePartitioner(
        extract_type=ExtractType.SNAPSHOT,
        watermark_type=WatermarkType.SIMPLE,
    )
    assert p.get_partitions(None, datetime(2015, 1, 1)) == [(-1, -1)]


def test_partition_predicates_cover_events_exactly_once(spark, sf_dir):
    """The extract contract: the union of per-partition pushdown predicates
    must select every source row exactly once (no overlap, no gap) — the
    property that makes partitioned query-based pulls lossless."""
    import pyspark.sql.functions as F

    from gobblin_spark.plans.time_partition import (
        ExtractType,
        TimePartitioner,
        dt_to_wm,
        partition_predicate,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    total = ev.count()
    b = ev.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).collect()[0]
    for wtype, interval in [
        (WatermarkType.DATE, 48),
        (WatermarkType.HOUR, 7),
        (WatermarkType.TIMESTAMP, 13),
    ]:
        p = TimePartitioner(
            extract_type=(ExtractType.APPEND_DAILY
                          if wtype == WatermarkType.DATE
                          else ExtractType.APPEND_HOURLY),
            watermark_type=wtype,
            partition_interval=interval if wtype != WatermarkType.DATE else 2,
            max_partitions=500,
            start_value=dt_to_wm(b["lo"]),
        )
        parts = p.get_partitions(None, b["hi"])
        assert parts, wtype
        covered = sum(
            ev.filter(partition_predicate("ts", lo, hi, wtype)).count()
            for lo, hi in parts
        )
        assert covered == total, (wtype, covered, total)
