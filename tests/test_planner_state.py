"""Planner math + state store unit tests
(≙ SimpleWatermarkTest / KafkaSourceTest / AbstractSourceTest /
FsDatasetStateStoreTest in the reference's unit tier)."""

import os

import pyspark.sql.functions as F

from gobblin_spark.plans.planner import BatchPlan, Planner, WorkUnit, bin_pack_wfd
from gobblin_spark.state.store import StateStore, WorkUnitState


def wu(i, g, lo, hi, cost=None):
    return WorkUnit(
        workunit_id=f"u{i}",
        event_group=g,
        low_seq=lo,
        high_seq=hi,
        est_records=hi - lo,
        est_cost=float(cost if cost is not None else hi - lo),
    )


def test_bin_pack_wfd_balances():
    units = [wu(i, 0, 0, size) for i, size in
             enumerate([100, 90, 50, 40, 30, 20, 10, 5])]
    bins = bin_pack_wfd(units, 3)
    loads = sorted(sum(u.est_cost for u in b) for b in bins)
    assert len(bins) == 3
    assert loads[-1] <= 150  # the 100 didn't get stacked with the 90
    assert sum(loads) == sum(u.est_cost for u in units)


def test_bin_pack_more_bins_than_units():
    units = [wu(0, 0, 0, 10)]
    bins = bin_pack_wfd(units, 8)
    assert len(bins) == 1  # empty bins dropped


def test_state_store_roundtrip(tmp_table_dir):
    st = StateStore(tmp_table_dir)
    units = [
        WorkUnitState("w1", "b1", 0, -1, 100),
        WorkUnitState("w2", "b1", 1, -1, 100),
    ]
    st.begin_batch("b1", units)
    assert st.pending_batches()[0]["batch_id"] == "b1"
    assert not st.is_committed("b1")
    for u in units:
        u.rows_read = 50
        u.wall_ms = 10
    assert st.commit_batch("b1", units, snapshot_version=2) is True
    assert st.is_committed("b1")
    assert st.pending_batches() == []
    assert st.last_committed_watermarks() == {0: 100, 1: 100}
    # second commit of same batch: verify-then-skip
    assert st.commit_batch("b1", units, snapshot_version=2) is False
    # cost stats from lineage
    stats = st.group_cost_stats()
    assert stats[0]["avg_ms_per_record"] > 0


def test_watermark_backoff_semantics(tmp_table_dir):
    """Uncommitted batch contributes NO watermark: its range is replanned
    (≙ WorkUnitState.backoffActualHighWatermark)."""
    st = StateStore(tmp_table_dir)
    st.begin_batch("b1", [WorkUnitState("w1", "b1", 0, -1, 100)])
    st.commit_batch("b1", [WorkUnitState("w1", "b1", 0, -1, 100)], 2)
    st.begin_batch("b2", [WorkUnitState("w2", "b2", 0, 100, 200)])
    # b2 never commits
    assert st.last_committed_watermarks() == {0: 100}
    assert st.pending_batches()[0]["batch_id"] == "b2"


def test_plan_batch_ranges_and_cap(spark, tmp_table_dir):
    st = StateStore(tmp_table_dir)
    pl = Planner(st, max_records_per_batch=500, max_records_per_unit=100,
                 target_bins=4)
    events = spark.range(1000).select(
        F.col("id").alias("seq"),
        (F.col("id") % 4).cast("int").alias("event_group"),
    )
    plan = pl.plan_batch(events)
    assert not plan.empty
    # admission cap: no unit reaches past low+cap
    assert max(u.high_seq for u in plan.units) <= 500
    # split cap: units sized to ≤ max_records_per_unit (records, not span)
    assert all(u.est_records <= 130 for u in plan.units)
    for u in plan.units:
        actual = events.filter(
            (F.col("event_group") == u.event_group)
            & (F.col("seq") > u.low_seq) & (F.col("seq") <= u.high_seq)
        ).count()
        assert actual <= 130
    # bins cover all units
    assert sum(len(b) for b in plan.bins) == len(plan.units)
    # extract predicate hits exactly the planned rows
    n = events.filter(Planner.batch_predicate(plan.units)).count()
    assert n == 500  # (low=-1, high=-1+cap] = seq 0..499


def test_plan_after_commit_advances(spark, tmp_table_dir):
    st = StateStore(tmp_table_dir)
    pl = Planner(st, max_records_per_batch=500, target_bins=4)
    events = spark.range(1000).select(
        F.col("id").alias("seq"),
        (F.col("id") % 4).cast("int").alias("event_group"),
    )
    plan1 = pl.plan_batch(events)
    st.begin_batch(plan1.batch_id, plan1.to_states())
    st.commit_batch(plan1.batch_id, plan1.to_states(), 2)
    plan2 = pl.plan_batch(events)
    assert min(u.low_seq for u in plan2.units) == 499  # (low=-1, hi=499] first
    assert max(u.high_seq for u in plan2.units) == 999
    st.begin_batch(plan2.batch_id, plan2.to_states())
    st.commit_batch(plan2.batch_id, plan2.to_states(), 3)
    plan3 = pl.plan_batch(events)
    assert plan3.empty


def test_pending_batch_replanned_with_same_ranges(spark, tmp_table_dir):
    st = StateStore(tmp_table_dir)
    pl = Planner(st, max_records_per_batch=300, target_bins=4)
    events = spark.range(600).select(
        F.col("id").alias("seq"),
        (F.col("id") % 2).cast("int").alias("event_group"),
    )
    plan1 = pl.plan_batch(events)
    st.begin_batch(plan1.batch_id, plan1.to_states())
    # crash — no commit. replan must reproduce plan1's ranges and id.
    plan_retry = pl.plan_batch(events)
    assert plan_retry.batch_id == plan1.batch_id
    assert {(u.event_group, u.low_seq, u.high_seq) for u in plan_retry.units} \
        == {(u.event_group, u.low_seq, u.high_seq) for u in plan1.units}
    assert all(u.retry_of for u in plan_retry.units)


def test_quiet_group_does_not_freeze_window(spark, tmp_table_dir):
    """Regression: a group whose events lie entirely beyond the bounded
    planning window (or that stops producing) must not freeze the global low
    watermark. Group 0 owns seqs 0..99, group 1 owns 100..199; with cap=50
    group 1 is invisible for the first windows — the planner must emit
    zero-record advance units so the window keeps moving, and eventually
    plan ALL 200 events."""
    st = StateStore(tmp_table_dir)
    pl = Planner(st, max_records_per_batch=50, target_bins=4)
    events = spark.range(200).select(
        F.col("id").alias("seq"),
        F.when(F.col("id") < 100, 0).otherwise(1).cast("int")
        .alias("event_group"),
    )
    planned_real = 0
    for _ in range(20):
        plan = pl.plan_batch(events)
        if plan.empty:
            break
        st.begin_batch(plan.batch_id, plan.to_states())
        st.commit_batch(plan.batch_id, plan.to_states(), 1)
        planned_real += sum(
            u.high_seq - u.low_seq for u in plan.units if not u.advance
        )
    else:
        raise AssertionError("planner did not converge in 20 batches")
    wm = st.last_committed_watermarks()
    assert wm[0] >= 99 and wm[1] == 199, wm
    # every real range got planned exactly once (no overlap, no gap)
    assert planned_real == 200


def test_quiet_group_engine_end_to_end(spark, tmp_table_dir):
    """Same scenario through the full engine: all of one group's events sit
    beyond the first admission window; run_until_caught_up must still apply
    every event and converge to the oracle final state."""
    import os

    import pyspark.sql.functions as F2

    from gobblin_spark.engine import CdcEngine
    from gobblin_spark.sources.change_events import (
        expected_final_state,
        generate_change_events,
    )

    ev = generate_change_events(
        spark, n_updates=600, n_repos=6, paths_per_repo=30,
        dup_frac=0.0, delete_frac=0.05, ooo_window=20, n_groups=4,
    )
    # Force the pathology: remap all events with seq >= 300 into a single
    # "late" group 9 that is invisible until the window reaches seq 300.
    ev = ev.withColumn(
        "event_group",
        F2.when(F2.col("seq") >= 300, F2.lit(9)).otherwise(
            F2.col("event_group")).cast("int"),
    )
    ev_path = os.path.join(tmp_table_dir, "events")
    ev.write.mode("overwrite").parquet(ev_path)
    stored = spark.read.parquet(ev_path)

    eng = CdcEngine(
        spark, stored,
        table_root=os.path.join(tmp_table_dir, "table"),
        state_root=os.path.join(tmp_table_dir, "state"),
        max_records_per_batch=100, n_buckets=8,
    )
    results = eng.run_until_caught_up(max_batches=60)
    assert results, "no batches ran"
    got = eng.current_state().select("repo", "path", "commit").orderBy(
        "repo", "path")
    want = expected_final_state(stored).select(
        "repo", "path", "commit").orderBy("repo", "path")
    assert [r.asDict() for r in got.collect()] == [
        r.asDict() for r in want.collect()]


def test_bins_drive_balanced_extract_partitions(spark, tmp_table_dir):
    """The WFD bins must reach execution: one giant group split into many
    units spread over bins ⇒ after bin-driven repartitioning the largest
    physical partition holds a bounded share of rows (vs everything landing
    in the giant group's partition)."""
    st = StateStore(tmp_table_dir)
    pl = Planner(st, max_records_per_batch=100_000,
                 max_records_per_unit=1_000, target_bins=8)
    # group 0 owns 90% of the batch; groups 1..4 share the rest
    events = spark.range(10_000).select(
        F.col("id").alias("seq"),
        F.when(F.col("id") % 10 < 9, 0)
        .otherwise((F.col("id") % 4 + 1)).cast("int").alias("event_group"),
    )
    plan = pl.plan_batch(events)
    assert len(plan.bins) > 1
    binned = (
        events.filter(Planner.batch_predicate(plan.units))
        .withColumn("__bin", Planner.bin_assignment_expr(plan.bins))
        .repartitionByRange(len(plan.bins), F.col("__bin"))
    )
    sizes = [
        r["cnt"] for r in binned.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count(F.lit(1)).alias("cnt")).collect()
    ]
    # giant group = 9000 rows; balanced bins keep every partition far below
    assert max(sizes) < 3000, sizes
    assert sum(sizes) == 10_000


def test_engine_bin_partitioning_balances_skewed_extract(spark, tmp_table_dir):
    """Engine-level proof the WFD bins reach execution: with a per-row
    stage present (converter chain), run_batch repartitions the extract by
    bin assignment, so a 90%-skewed group arrives at the converters as
    balanced physical partitions — not one giant partition."""
    from gobblin_spark.engine import CdcEngine
    from gobblin_spark.operators.converters import Converter, ConverterChain

    seen: dict[str, list[int]] = {}

    class PartitionProbe(Converter):
        def convert(self, df):
            seen["sizes"] = [
                r["cnt"]
                for r in df.groupBy(F.spark_partition_id().alias("p"))
                .agg(F.count(F.lit(1)).alias("cnt"))
                .collect()
            ]
            return df

    n = 20_000
    events = spark.range(n).select(
        F.col("id").alias("seq"),
        F.when(F.col("id") % 10 < 9, 0)
        .otherwise((F.col("id") % 3 + 1)).cast("int").alias("event_group"),
        F.lit("U").alias("op"),
        F.concat(F.lit("repo_"), (F.col("id") % 50).cast("string")).alias("repo"),
        F.concat(F.lit("f"), (F.col("id") % 500).cast("string")).alias("path"),
        F.lit("c0ffee").alias("commit"),
        F.lit("py").alias("lang"),
        F.lit("body").alias("content"),
        F.lit(1).cast("int").alias("schema_version"),
    )
    eng = CdcEngine(
        spark,
        events,
        table_root=os.path.join(tmp_table_dir, "table"),
        state_root=os.path.join(tmp_table_dir, "state"),
        max_records_per_batch=100_000,
        max_records_per_unit=1_000,
        target_bins=8,
        n_buckets=8,
        converters=ConverterChain([PartitionProbe()]),
    )
    r = eng.run_batch()
    assert r.committed and r.rows_read == n
    sizes = seen["sizes"]
    # group 0 alone is 18k rows; bin-balanced partitions stay far below
    assert max(sizes) < 6_000, sizes
    assert sum(sizes) == n
    # and the merge result is still correct: one row per live key
    assert eng.current_state().count() == \
        events.select("repo", "path").distinct().count()


def test_density_adaptive_window_for_sharded_consumer(spark, tmp_table_dir):
    """An executor owning 1/4 of the event groups (sharded deployment, ≙
    Kafka-partition assignment) sees ~1/4 of the rows in any global-seq
    window. After the first commit teaches the planner its observed
    density, batches must fill to ~the record cap instead of splintering
    into 4x more batches of cap/4 rows — and the final state must still be
    exactly the shard's LWW replay."""
    import os

    import pyspark.sql.functions as F2

    from gobblin_spark.engine import CdcEngine
    from gobblin_spark.sources.change_events import (
        expected_final_state,
        generate_change_events,
    )

    ev = generate_change_events(
        spark, n_updates=8000, n_repos=10, paths_per_repo=100,
        dup_frac=0.0, delete_frac=0.05, ooo_window=50, n_groups=8,
    )
    shard = ev.filter(F2.expr("pmod(event_group, 4) = 1"))
    ev_path = os.path.join(tmp_table_dir, "events")
    shard.write.mode("overwrite").parquet(ev_path)
    stored = spark.read.parquet(ev_path)
    n = stored.filter("op IN ('I','U','D')").count()

    cap = 1000
    eng = CdcEngine(
        spark, stored,
        table_root=os.path.join(tmp_table_dir, "table"),
        state_root=os.path.join(tmp_table_dir, "state"),
        max_records_per_batch=cap, n_buckets=8,
    )
    results = eng.run_until_caught_up(max_batches=60)
    sizes = [r.rows_read for r in results]
    # batch 1 runs blind (density 1.0 → ~cap/4 rows); once history exists
    # the window widens ~4x and batches reach the cap's neighborhood
    assert sizes[0] < 0.6 * cap
    assert max(sizes[1:-1] or sizes) > 0.7 * cap
    # total batch count near the ideal n/cap, NOT the splintered 4x count
    ideal = -(-n // cap)
    assert len(results) <= ideal + 3
    # exactness is untouched by the adaptive window
    got = eng.current_state().select("repo", "path", "commit").orderBy(
        "repo", "path")
    want = expected_final_state(stored).select(
        "repo", "path", "commit").orderBy("repo", "path")
    assert [r.asDict() for r in got.collect()] == [
        r.asDict() for r in want.collect()]
    # watermarks fully caught up
    wm = eng.store.last_committed_watermarks()
    smax = stored.agg(F2.max("seq")).first()[0]
    assert max(wm.values()) == smax


def test_commit_log_checkpoint_fold(tmp_table_dir):
    """checkpoint_log folds old commits into one rollup: watermarks merge
    by max, folded ids still answer is_committed, metrics sum, the recent
    window keeps full lineage, and a second fold composes with the first
    (rollup N+1 is a superset of rollup N). ≙ a bounded job-history store:
    planning cost stays O(keep_last) however long the stream runs."""
    st = StateStore(tmp_table_dir)
    for i in range(10):
        u = [WorkUnitState(f"w{i}", f"b{i}", g, i * 100, (i + 1) * 100,
                           rows_read=10, wall_ms=5) for g in (0, 1)]
        st.begin_batch(f"b{i}", u)
        st.commit_batch(f"b{i}", u, snapshot_version=i + 2,
                        metrics={"rows_read": 20, "rows_merged": 20,
                                 "wall_ms": 7})
    wm_before = st.last_committed_watermarks()
    dens_before = st.observed_seq_density()

    roll = st.checkpoint_log(keep_last=4)
    assert roll is not None and roll["folded_count"] == 6
    # one rollup + 4 live commits on disk and in the view
    batches = st.committed_batches()
    assert len(batches) == 5
    assert batches[0]["kind"] == "rollup"
    assert st.last_committed_watermarks() == wm_before
    for i in range(6):
        assert st.is_committed(f"b{i}")  # folded but still answered
        assert st.read_batch(f"b{i}") is None  # lifecycle ckpt cleaned
    assert st.pending_batches() == []
    # estimators keep working off the recent live window
    assert st.observed_seq_density() == dens_before
    assert st.group_cost_stats()[0]["avg_ms_per_record"] > 0
    # folded metrics summed into the rollup
    assert roll["metrics"]["rows_read"] == 6 * 20

    # second fold composes: 4 live + 4 new, keep 2
    for i in range(10, 14):
        u = [WorkUnitState(f"w{i}", f"b{i}", g, i * 100, (i + 1) * 100,
                           rows_read=10, wall_ms=5) for g in (0, 1)]
        st.begin_batch(f"b{i}", u)
        st.commit_batch(f"b{i}", u, snapshot_version=i + 2,
                        metrics={"rows_read": 20, "rows_merged": 20,
                                 "wall_ms": 7})
    roll2 = st.checkpoint_log(keep_last=2)
    assert roll2["rollup_seq"] == 2
    assert roll2["folded_count"] == 12
    assert roll2["metrics"]["rows_read"] == 12 * 20
    assert st.last_committed_watermarks() == {0: 1400, 1: 1400}
    # a fresh store instance (new process) sees the same folded view
    st2 = StateStore(tmp_table_dir)
    assert st2.is_committed("b0") and st2.is_committed("b11")
    assert len(st2.committed_batches()) == 3


def test_commit_log_checkpoint_crash_mid_cleanup(tmp_table_dir):
    """Crash after the rollup publishes but before old files are removed:
    nothing double-counts (readers skip folded commit files) and the next
    checkpoint finishes the cleanup."""
    st = StateStore(tmp_table_dir)
    for i in range(8):
        u = [WorkUnitState(f"w{i}", f"b{i}", 0, i * 100, (i + 1) * 100,
                           rows_read=10, wall_ms=5)]
        st.begin_batch(f"b{i}", u)
        st.commit_batch(f"b{i}", u, snapshot_version=i + 2,
                        metrics={"rows_read": 10, "rows_merged": 10,
                                 "wall_ms": 5})

    real_remove = st.fs.remove
    st.fs.remove = lambda p: (_ for _ in ()).throw(
        OSError("injected crash during cleanup"))
    import pytest as _pytest
    with _pytest.raises(OSError, match="injected"):
        st.checkpoint_log(keep_last=3)
    st.fs.remove = real_remove

    # rollup is live, old commit files still on disk — but not re-counted
    st2 = StateStore(tmp_table_dir)
    batches = st2.committed_batches()
    assert sum(1 for b in batches if b.get("kind") == "rollup") == 1
    ids = [b["batch_id"] for b in batches]
    assert len(ids) == len(set(ids)) == 4  # rollup + 3 live, no dupes
    assert st2.last_committed_watermarks() == {0: 800}
    total = sum(b["metrics"]["rows_read"] for b in batches)
    assert total == 80  # 5 folded (50) + 3 live (30), no double count

    # the next checkpoint removes the leftovers
    st2.checkpoint_log(keep_last=2)
    live = [n for n in st2.fs.listdir(st2.log_dir) if n.startswith("commit-")]
    assert len(live) == 2


def test_engine_auto_checkpoint_keeps_replay_exact(spark, tmp_table_dir):
    """End-to-end: an engine run with aggressive log folding must leave the
    same table state AND the same nothing-to-do restart behavior as the
    append-only log (watermarks survive the fold)."""
    from gobblin_spark.engine import CdcEngine
    from gobblin_spark.lakehouse import LakeTable
    from gobblin_spark.lakehouse.merge import read_current
    from gobblin_spark.sources import generate_change_events
    from tests.oracle import assert_matches_oracle

    d = tmp_table_dir
    generate_change_events(spark, 2500, n_repos=10, paths_per_repo=40,
                           dup_frac=0.05, delete_frac=0.05,
                           ooo_window=100).write.parquet(d + "/events")
    ev = spark.read.parquet(d + "/events")
    eng = CdcEngine(spark, ev, d + "/t", d + "/s",
                    max_records_per_batch=300, n_buckets=8,
                    log_keep_last=2)
    eng.run_until_caught_up()
    st = StateStore(d + "/s")
    live = [n for n in st.fs.listdir(st.log_dir) if n.startswith("commit-")]
    assert st.latest_rollup() is not None, "fold must have triggered"
    assert len(live) <= 5
    assert_matches_oracle(
        read_current(LakeTable(spark, d + "/t")),
        ev.filter(F.col("op").isin("I", "U", "D")))

    # restart: watermarks come from the rollup — nothing to apply
    eng2 = CdcEngine(spark, ev, d + "/t", d + "/s",
                     max_records_per_batch=300, n_buckets=8,
                     log_keep_last=2)
    assert eng2.run_until_caught_up() == []
