"""Structured Streaming ingest path: availableNow drain must converge to the
same final state as the batch engine / oracle replay, and a second run over
an extended input must pick up only the new files (incremental tail)."""

import os

import pyspark.sql.functions as F

from gobblin_spark.sources import generate_change_events
from gobblin_spark.streaming import stream_ingest
from gobblin_spark.lakehouse import LakeTable
from gobblin_spark.lakehouse.merge import read_current
from tests.oracle import assert_frames_equal_by_sha
from tests.test_engine import oracle_final


def test_stream_ingest_available_now(spark, tmp_table_dir):
    ev = generate_change_events(
        spark, 1200, n_repos=15, paths_per_repo=30,
        dup_frac=0.05, delete_frac=0.05, ooo_window=100,
    ).cache()
    ev_dir = os.path.join(tmp_table_dir, "events")
    # two file drops = two discoverable chunks for the stream source
    ev.filter(F.col("seq") < 700).write.mode("overwrite").parquet(ev_dir)

    table_root = os.path.join(tmp_table_dir, "table")
    state_root = os.path.join(tmp_table_dir, "state")
    ckpt = os.path.join(tmp_table_dir, "ckpt")

    q = stream_ingest(spark, ev_dir, table_root, state_root, ckpt)
    q.awaitTermination()

    table = LakeTable(spark, table_root)
    first_version = table.current_version()
    got1 = read_current(table).select(
        "repo", "path", "commit", "lang", "content").toPandas()
    assert_frames_equal_by_sha(
        got1, oracle_final(ev.filter(F.col("seq") < 700).toPandas())
    )

    # drop the remaining events as new files; a NEW availableNow run tails on
    ev.filter(F.col("seq") >= 700).write.mode("append").parquet(ev_dir)
    q2 = stream_ingest(spark, ev_dir, table_root, state_root, ckpt)
    q2.awaitTermination()

    assert table.current_version() > first_version
    got2 = read_current(table).select(
        "repo", "path", "commit", "lang", "content").toPandas()
    assert_frames_equal_by_sha(got2, oracle_final(ev.toPandas()))
