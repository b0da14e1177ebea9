"""Query-based JDBC incremental source: watermark-predicate pushdown pulls.

≙ QueryBasedSource.getWorkunits + JdbcExtractor
(gobblin-core/src/main/java/gobblin/source/extractor/extract/
QueryBasedSource.java:107-200; jdbc/JdbcExtractor.java:275-512,733-765):
per run, the time/date/hour/simple watermark partitioner plans bounded
partitions, each becomes ONE predicate string pushed into the source query,
and the committed high watermark resumes the next run.

Spark-first shape: ``spark.read.jdbc(url, table, predicates=[...])`` runs
one partition-parallel query per planned predicate — the database does the
filtering (index range scan), Spark does the transport, and the partition
count is bounded by the planner's max_partitions. This is exactly the
reference's per-workunit WHERE-clause extraction
(JdbcExtractor.getRecordSet building "col >= x AND col <= y" conditions),
expressed through Spark's native JDBC relation.

Predicate formats mirror the reference's dialect conditions
(MysqlExtractor.getTimestampPredicateCondition → 'yyyy-MM-dd HH:mm:ss',
getDatePredicateCondition → 'yyyy-MM-dd', getHourPredicateCondition; tested
against TimestampWatermarkTest's expected strings).

``load_fn`` injects a test double (no database ships in CI): it receives
the predicate list and must return the union DataFrame — production leaves
it None and goes through spark.read.jdbc.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from gobblin_spark.plans.time_partition import (
    ExtractType,
    TimePartitioner,
    WatermarkType,
    wm_to_dt,
)


def watermark_condition(
    column: str, value: int, watermark_type: WatermarkType, operator: str
) -> str:
    """One side of a partition predicate (≙ the extractor dialect methods:
    TimestampWatermarkTest expects "my_column >= '2014-10-29 13:30:15'")."""
    if watermark_type == WatermarkType.SIMPLE:
        return f"{column} {operator} {value}"
    dt = wm_to_dt(value)
    if watermark_type == WatermarkType.TIMESTAMP:
        lit = dt.strftime("%Y-%m-%d %H:%M:%S")
    elif watermark_type == WatermarkType.DATE:
        lit = dt.strftime("%Y-%m-%d")
    else:  # HOUR — no standard SQL hour literal: compare at timestamp grain
        lit = dt.strftime("%Y-%m-%d %H:%M:%S")
    return f"{column} {operator} '{lit}'"


@dataclass
class JdbcIncrementalSource:
    url: str
    table: str
    watermark_column: str
    watermark_type: WatermarkType = WatermarkType.TIMESTAMP
    extract_type: ExtractType = ExtractType.SNAPSHOT
    partition_interval: int = 1
    max_partitions: int = 32
    start_value: int | None = None
    properties: dict[str, str] = field(default_factory=dict)
    # test hook: (spark, predicates) -> DataFrame
    load_fn: Callable[[SparkSession, list[str]], DataFrame] | None = None

    def _partitioner(self) -> TimePartitioner:
        return TimePartitioner(
            extract_type=self.extract_type,
            watermark_type=self.watermark_type,
            partition_interval=self.partition_interval,
            max_partitions=self.max_partitions,
            start_value=self.start_value,
        )

    def predicates(
        self, previous_watermark: int | None, current_time: datetime
    ) -> list[str]:
        """One pushdown predicate per planned watermark partition."""
        parts = self._partitioner().get_partitions(
            previous_watermark, current_time)
        out = []
        for lo, hi in parts:
            if lo == -1 or hi == -1:
                continue  # default sentinel partition: full scan, no bound
            out.append(
                watermark_condition(self.watermark_column, lo,
                                    self.watermark_type, ">=")
                + " AND "
                + watermark_condition(self.watermark_column, hi,
                                      self.watermark_type, "<=")
            )
        return out

    def high_watermark(self, current_time: datetime,
                       previous_watermark: int | None = None) -> int:
        """The value to commit as this run's high watermark (resumes the
        next pull from here + delta)."""
        parts = self._partitioner().get_partitions(
            previous_watermark, current_time)
        return parts[-1][1] if parts else -1

    def read(
        self,
        spark: SparkSession,
        previous_watermark: int | None,
        current_time: datetime,
    ) -> DataFrame:
        """Partition-parallel incremental pull: each predicate becomes one
        JDBC partition query (spark.read.jdbc predicates=...)."""
        preds = self.predicates(previous_watermark, current_time)
        if self.load_fn is not None:
            return self.load_fn(spark, preds)
        reader = spark.read
        if not preds:
            return reader.jdbc(self.url, self.table,
                               properties=dict(self.properties))
        return reader.jdbc(self.url, self.table, predicates=preds,
                           properties=dict(self.properties))
