"""Physical-plan regression tests: the scale properties the engine claims
(pushdown, broadcast, no giant-array aggregates, column pruning) asserted
against `.explain` output so a refactor can't silently lose them."""

import os

import pyspark.sql.functions as F


def _plan(df) -> str:
    """Formatted physical plan as a string (what `.explain('formatted')`
    prints)."""
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
    return df._jdf.queryExecution().explainString(mode.fromString("formatted"))


def test_planning_scan_pushes_seq_bounds_to_parquet(spark, tmp_table_dir):
    """The bounded planning scan (seq > low AND seq <= low+cap) must reach
    the parquet scan as PushedFilters — that is what makes planning O(cap)
    instead of O(backlog) at 10^10 events."""
    from gobblin_spark.sources import generate_change_events

    path = os.path.join(tmp_table_dir, "ev")
    generate_change_events(spark, 2000, n_repos=5, paths_per_repo=50,
                           n_groups=4).write.parquet(path)
    spark.catalog.clearCache()
    events = spark.read.parquet(path)
    fresh = events.filter(F.expr("seq > 100 AND seq <= 600"))
    plan = _plan(fresh.groupBy("event_group").agg(F.expr("max(seq) AS m")))
    assert "PushedFilters" in plan
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    assert "GreaterThan(seq,100)" in pushed.replace(" ", "")
    assert "LessThanOrEqual(seq,600)" in pushed.replace(" ", "")


def test_extract_predicate_pushes_group_ranges(spark, tmp_table_dir):
    """batch_predicate's OR-of-ranges must also reach PushedFilters (Or(...)
    over event_group/seq), keeping the extract scan pruned."""
    from gobblin_spark.plans.planner import Planner, WorkUnit

    path = os.path.join(tmp_table_dir, "ev2")
    from gobblin_spark.sources import generate_change_events

    generate_change_events(spark, 1000, n_repos=5, paths_per_repo=50,
                           n_groups=2).write.parquet(path)
    spark.catalog.clearCache()
    events = spark.read.parquet(path)
    units = [
        WorkUnit(workunit_id="u0", event_group=0, low_seq=0, high_seq=200,
                 est_records=200, est_cost=1.0),
        WorkUnit(workunit_id="u1", event_group=1, low_seq=0, high_seq=300,
                 est_records=300, est_cost=1.0),
    ]
    pred = Planner.batch_predicate(units)
    plan = _plan(events.filter(pred))
    assert "PushedFilters" in plan
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    assert "event_group" in pushed and "seq" in pushed


def test_exact_dedup_has_no_giant_array_aggregate(spark):
    """exact_dedup must stay min-per-group + join-back: a collect_list of
    ids per content hash is a single-executor OOM at 10^9 duplicate rows."""
    from gobblin_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(i, f"t{i % 3}") for i in range(30)], ["id", "t"]
    )
    plan = _plan(exact_dedup(df, ["t"], "id"))
    assert "collect_list" not in plan
    # one hash aggregate + an equi-join on the hash, co-partitioned
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan \
        or "BroadcastHashJoin" in plan


def test_brute_force_pairs_broadcast_small_side(spark):
    """Oracle-tier all-pairs operators must broadcast the build side, never
    shuffle both sides into a cartesian."""
    from gobblin_spark.operators.dedup import ngram_jaccard_pairs

    df = spark.createDataFrame(
        [(i, "a b c d e") for i in range(10)], ["doc_id", "text"]
    )
    plan = _plan(ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.5))
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_minhash_lsh_no_cartesian_and_pruned_columns(spark):
    """The LSH candidate join must be an equi-join on the band key (never a
    cartesian), and the scan must not read columns the query doesn't use."""
    from gobblin_spark.operators.dedup import minhash_lsh_pairs

    df = spark.createDataFrame(
        [(i, "w x y z " * 3, "junk") for i in range(8)],
        ["doc_id", "text", "unused_col"],
    )
    plan = _plan(minhash_lsh_pairs(df, "doc_id", "text", threshold=0.1))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_token_stats_query_prunes_columns(spark, sf_dir):
    """text_token_stats projects doc_id+text only; the parquet ReadSchema
    must not include the unused source/lang/n_chars columns."""
    from gobblin_spark.queries import q_text_token_stats

    plan = _plan(q_text_token_stats(spark, sf_dir))
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "doc_id" in read and "text" in read
    assert "n_chars" not in read and "source" not in read


def test_patch_reduce_single_shuffle(spark):
    """lww_patch_reduce claims window + same-key aggregate reuse one hash
    partitioning: exactly one shuffle Exchange in the plan."""
    from gobblin_spark.lakehouse.merge import lww_patch_reduce

    df = spark.range(100).selectExpr(
        "id AS seq", "'U' AS op", "CAST(id % 7 AS STRING) AS user",
        "CASE WHEN id % 2 = 0 THEN 'n' END AS name",
        "CASE WHEN id % 3 > 0 THEN CAST(id AS DOUBLE) END AS score")
    plan = _plan(lww_patch_reduce(df, ["user"], "seq"))
    # formatted mode: node line is "(N) Exchange", partitioning in Arguments
    n_exchanges = plan.count(") Exchange")
    assert n_exchanges == 1, f"expected 1 shuffle, plan has {n_exchanges}"
    assert "hashpartitioning(user" in plan
