"""Temporal joins.

asof_join: for every left row, the single most recent right row with
right_time <= left_time per key — the classic event-enrichment join (join a
change event to the dimension state that was current when it happened; join
a metric to the last preceding deploy). The reference has no temporal join;
its consumers re-read whole time partitions instead
(gobblin-compaction/.../MRCompactor.java late-data handling) — this is the
record-granular operator a Spark user expects.

Spark-first plan — the union trick, NOT a range join: tag both sides, union
them, and carry each right payload forward with last(..., ignorenulls=True)
over a per-key window ordered by (time, side). Costs ONE shuffle + sort on
the key (identical to a groupBy), touches each row once, and never builds
the |left|x|right| candidate space an inequality join explodes into (Spark
turns `l.t >= r.t` joins into BroadcastNestedLoop/cartesian — O(n*m) at
100 TB; this stays O(n+m) log-sorted).
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    payload: Sequence[str] | None = None,
) -> DataFrame:
    """Backward inclusive as-of join (≙ DuckDB ASOF LEFT JOIN / pandas
    merge_asof(direction='backward')): each left row gets the right payload
    at the greatest right_time <= left_time for its key; null when no right
    row precedes it. Left rows and columns pass through unchanged.

    payload: right columns to carry (default: all but keys + right_time).
    Payload names must not collide with left columns — alias them first.
    Right rows sharing (key, right_time) are resolved arbitrarily; keep the
    right side unique per (key, time) for deterministic output.
    """
    on = list(on)
    payload = list(payload) if payload is not None else [
        c for c in right.columns if c not in (*on, right_time)
    ]
    clash = sorted(set(payload) & set(left.columns))
    if clash:
        raise ValueError(f"payload columns collide with left: {clash}")
    left_cols = [c for c in left.columns if c not in (*on, left_time)]

    # one unioned frame: right rows carry payload, left rows carry nulls;
    # __is_l orders a right row BEFORE a left row at equal time (inclusive)
    l_tagged = left.select(
        *on,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_l"),
        *[F.col(c) for c in left_cols],
        *[F.lit(None).alias(c) for c in payload],
    )
    r_tagged = right.select(
        *on,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_l"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
          for c in left_cols],
        *[F.col(c) for c in payload],
    )
    w = (
        Window.partitionBy(*on)
        .orderBy("__t", "__is_l")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tagged.unionByName(r_tagged).select(
        *on, "__t", "__is_l",
        *[F.col(c) for c in left_cols],
        *[F.last(F.col(c), ignorenulls=True).over(w).alias(c)
          for c in payload],
    )
    return (
        filled.filter(F.col("__is_l") == 1)
        .select(*on, F.col("__t").alias(left_time), *left_cols, *payload)
    )
