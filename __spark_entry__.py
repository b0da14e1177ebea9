"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``   — flagship: the full CDC pipeline (plan → convert →
  salted LWW MERGE → exactly-once commit) over a deterministic change-event
  stream at sf0.001 scale, returning the final visible table.
- ``queries()``      — one entry per implemented operator family from
  SURVEY.md §2 + the training-data ops (gobblin_spark/queries.py).
- ``oracle_sql()``   — DuckDB-runnable ANSI SQL replaying each query
  bit-for-bit (portable md5/regexp/list math; rounded doubles).
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: end-to-end CDC ingest at sf0.001 dev scale.

    Synthesizes the deterministic change-event stream (seed=42), runs the
    engine's full batch loop (work-unit planning, schema-evolution registry,
    row-quality gates, salted LWW MERGE into the lakehouse table,
    exactly-once commit log), and returns the final visible state.
    """
    from gobblin_spark.engine import CdcEngine
    from gobblin_spark.sources import generate_change_events

    work = tempfile.mkdtemp(prefix="gobblin_spark_entry_")
    events = generate_change_events(
        spark,
        n_updates=8000,
        n_repos=40,
        paths_per_repo=120,
        dup_frac=0.05,
        delete_frac=0.05,
        ooo_window=200,
        schema_change_seqs={3000: 2, 5000: 3, 7000: 4},
    )
    # pre-materialize: the engine plans multiple batches over a stable input
    ev_path = os.path.join(work, "events")
    events.write.mode("overwrite").parquet(ev_path)
    stored = spark.read.parquet(ev_path)

    eng = CdcEngine(
        spark,
        stored,
        table_root=os.path.join(work, "table"),
        state_root=os.path.join(work, "state"),
        max_records_per_batch=3000,
        n_buckets=16,
    )
    eng.run_until_caught_up()
    # Return the lazy table read directly — no driver-side collect in the
    # flagship. The temp workdir stays for the session so the caller's
    # (driver's) own .collect() streams from the committed parquet.
    return eng.current_state()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from gobblin_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from gobblin_spark.queries import oracle_sqls

    return oracle_sqls()
