"""Initial-snapshot bootstrap + CDC handoff (≙ the reference's
SNAPSHOT_ONLY full dump before APPEND watermark pulls,
gobblin-core/.../extract/QueryBasedSource.java extract-type lifecycle;
Debezium initial snapshot → binlog position handoff).

The contract under test: load the source table's consistent image at
change position W, hand off, and the subsequent incremental tail of
seq > W must converge to EXACTLY the state a full replay of all history
would produce — under duplicates, deletes, out-of-order delivery, and
across both merge modes/dialects. Plus the exactly-once story across the
two commit points (table snapshot, then state-store log)."""

import json
import os

import pyspark.sql.functions as F
import pytest

from gobblin_spark.bootstrap import BootstrapError, bootstrap_snapshot
from gobblin_spark.engine import CdcEngine
from gobblin_spark.lakehouse import LakeTable
from gobblin_spark.lakehouse.merge import read_current
from gobblin_spark.sources.change_events import (
    expected_final_state,
    generate_change_events,
)
from gobblin_spark.state.store import StateStore

from tests.oracle import assert_matches_oracle


def _fixture(spark, tmp_table_dir, n=4000):
    ev = generate_change_events(
        spark, n, n_repos=20, paths_per_repo=60,
        dup_frac=0.05, delete_frac=0.08, ooo_window=200,
    )
    path = os.path.join(tmp_table_dir, "events")
    ev.write.parquet(path)
    ev = spark.read.parquet(path)
    groups = [int(r.event_group)
              for r in ev.select("event_group").distinct().collect()]
    return ev, groups


@pytest.mark.parametrize(
    "merge_mode,dialect", [("cow", "row"), ("mor", "cell")]
)
def test_bootstrap_handoff_converges(spark, tmp_table_dir, merge_mode,
                                     dialect):
    """Snapshot-at-W + tail of seq>W == full replay of all history,
    per-row sha256 vs the independent DuckDB oracle."""
    ev, groups = _fixture(spark, tmp_table_dir)
    table = os.path.join(tmp_table_dir, "table")
    state = os.path.join(tmp_table_dir, "state")
    W = 2000

    snapshot = expected_final_state(ev.filter(F.col("seq") <= W))
    res = bootstrap_snapshot(
        spark, snapshot, table, state, watermark=W, groups=groups,
        n_buckets=16, merge_dialect=dialect, verify_unique=True,
    )
    assert not res["already_bootstrapped"]
    assert res["rows_loaded"] == snapshot.count()

    eng = CdcEngine(spark, ev, table, state, max_records_per_batch=1500,
                    n_buckets=16, merge_mode=merge_mode,
                    merge_dialect=dialect, compact_every=2)
    eng.run_until_caught_up()

    # the planner never re-admitted pre-watermark history
    store = StateStore(state)
    lows = [u["low_seq"] for c in store.committed_batches()
            if c["metrics"].get("kind") != "bootstrap"
            for u in c["lineage"]]
    assert lows and min(lows) >= W

    got = read_current(LakeTable(spark, table)).select(
        "repo", "path", "commit", "lang", "content")
    assert_matches_oracle(got, ev)


def test_bootstrap_rerun_is_noop(spark, tmp_table_dir):
    ev, groups = _fixture(spark, tmp_table_dir, n=1500)
    table = os.path.join(tmp_table_dir, "table")
    state = os.path.join(tmp_table_dir, "state")
    snapshot = expected_final_state(ev.filter(F.col("seq") <= 800))

    r1 = bootstrap_snapshot(spark, snapshot, table, state,
                            watermark=800, groups=groups, n_buckets=8)
    r2 = bootstrap_snapshot(spark, snapshot, table, state,
                            watermark=800, groups=groups, n_buckets=8)
    assert r2["already_bootstrapped"] and r2["rows_loaded"] == 0
    assert r2["snapshot_version"] == r1["snapshot_version"]
    t = LakeTable(spark, table)
    assert read_current(t).count() == r1["rows_loaded"]


def test_bootstrap_crash_between_table_commit_and_log(
        spark, tmp_table_dir, monkeypatch):
    """Crash after the table snapshot commits but before the state-store
    log publishes: the rerun must NOT rewrite the snapshot rows (a raw
    load is not self-resolving like a merge batch — a second write would
    duplicate every live row) and must finish by publishing the log."""
    ev, groups = _fixture(spark, tmp_table_dir, n=1500)
    table = os.path.join(tmp_table_dir, "table")
    state = os.path.join(tmp_table_dir, "state")
    snapshot = expected_final_state(ev.filter(F.col("seq") <= 800))
    n_live = snapshot.count()

    real_commit = StateStore.commit_batch

    def boom(self, *a, **kw):
        raise RuntimeError("injected crash before log publish")

    monkeypatch.setattr(StateStore, "commit_batch", boom)
    with pytest.raises(RuntimeError, match="injected"):
        bootstrap_snapshot(spark, snapshot, table, state,
                           watermark=800, groups=groups, n_buckets=8)
    monkeypatch.setattr(StateStore, "commit_batch", real_commit)

    # table has the data, log doesn't: rerun completes without rewriting
    t = LakeTable(spark, table)
    v_after_crash = t.current_version()
    res = bootstrap_snapshot(spark, snapshot, table, state,
                             watermark=800, groups=groups, n_buckets=8)
    assert not res["already_bootstrapped"]
    assert res["rows_loaded"] == 0  # data write skipped
    t = LakeTable(spark, table)
    assert t.current_version() == v_after_crash  # no second data commit
    assert read_current(t).count() == n_live  # no duplicated rows
    assert StateStore(state).is_committed("bootstrap-800")


def test_bootstrap_refuses_after_ingest(spark, tmp_table_dir):
    """Bootstrap into a state store that already committed incremental
    batches would regress watermarks — must refuse."""
    ev, groups = _fixture(spark, tmp_table_dir, n=1200)
    table = os.path.join(tmp_table_dir, "table")
    state = os.path.join(tmp_table_dir, "state")
    eng = CdcEngine(spark, ev, table, state, max_records_per_batch=5000,
                    n_buckets=8)
    eng.run_until_caught_up()
    with pytest.raises(BootstrapError, match="before any ingest"):
        bootstrap_snapshot(
            spark, expected_final_state(ev), table + "2", state,
            watermark=600, groups=groups, n_buckets=8)


def test_bootstrap_validates_snapshot(spark, tmp_table_dir):
    ev, groups = _fixture(spark, tmp_table_dir, n=1200)
    table = os.path.join(tmp_table_dir, "table")
    state = os.path.join(tmp_table_dir, "state")
    snapshot = expected_final_state(ev.filter(F.col("seq") <= 600))

    with pytest.raises(BootstrapError, match="missing target payload"):
        bootstrap_snapshot(spark, snapshot.drop("content"), table,
                           state + "a", watermark=600, groups=groups)
    dup = snapshot.unionByName(snapshot.limit(5))
    with pytest.raises(BootstrapError, match="duplicate keys"):
        bootstrap_snapshot(spark, dup, table, state + "b", watermark=600,
                           groups=groups, verify_unique=True)
    with pytest.raises(BootstrapError, match="non-empty"):
        bootstrap_snapshot(spark, snapshot, table, state + "c",
                           watermark=600, groups=[])


def test_cli_bootstrap_then_ingest(spark, tmp_table_dir, capsys):
    """The spark-submit surface: bootstrap --source, then ingest applies
    only the post-watermark suffix and the table equals full replay."""
    from gobblin_spark.cli import main

    ev, groups = _fixture(spark, tmp_table_dir, n=3000)
    table = os.path.join(tmp_table_dir, "table")
    state = os.path.join(tmp_table_dir, "state")
    src = os.path.join(tmp_table_dir, "snapshot")
    W = 1500
    expected_final_state(ev.filter(F.col("seq") <= W)).write.parquet(src)

    rc = main(["bootstrap", "--source", src, "--table", table,
               "--state", state, "--watermark", str(W),
               "--events", os.path.join(tmp_table_dir, "events"),
               "--buckets", "8", "--verify-unique"])
    assert rc == 0
    boot = json.loads([l for l in capsys.readouterr().out.splitlines()
                       if l.startswith("{")][-1])
    assert not boot["already_bootstrapped"]

    rc = main(["ingest", "--events", os.path.join(tmp_table_dir, "events"),
               "--table", table, "--state", state, "--buckets", "8",
               "--max-records-per-batch", "2000"])
    assert rc == 0
    out = json.loads([l for l in capsys.readouterr().out.splitlines()
                      if l.startswith("{")][-1])
    n_suffix = ev.filter(F.col("seq") > W).count()
    assert out["events_applied"] <= n_suffix  # quality gate may drop rows
    assert out["events_applied"] > 0

    got = read_current(LakeTable(spark, table)).select(
        "repo", "path", "commit", "lang", "content")
    assert_matches_oracle(got, ev)


def test_bootstrap_refuses_nonempty_table_fresh_state(spark, tmp_table_dir):
    """A pre-existing table with data files but no record of THIS
    bootstrap (e.g. a retained table under a fresh state root): loading
    the snapshot on top would duplicate every live row — raw loads are not
    self-resolving like merge batches. Must refuse without adopt_existing;
    with it, the existing files ARE the snapshot image (no data written,
    no duplicates) and the tail from the fresh state root converges."""
    ev, groups = _fixture(spark, tmp_table_dir, n=1500)
    table = os.path.join(tmp_table_dir, "table")
    W = 800
    snapshot = expected_final_state(ev.filter(F.col("seq") <= W))
    # the table pre-exists via DIRECT ingest (its files carry no
    # bootstrap_id) — the retained-table-under-fresh-state-root shape
    eng0 = CdcEngine(spark, ev.filter(F.col("seq") <= W), table,
                     os.path.join(tmp_table_dir, "state1"),
                     max_records_per_batch=1000, n_buckets=8)
    eng0.run_until_caught_up()
    n_live = read_current(LakeTable(spark, table)).count()
    assert n_live == snapshot.count()

    state2 = os.path.join(tmp_table_dir, "state2")
    with pytest.raises(BootstrapError, match="adopt_existing"):
        bootstrap_snapshot(spark, snapshot, table, state2,
                           watermark=W, groups=groups, n_buckets=8)
    assert read_current(LakeTable(spark, table)).count() == n_live

    r2 = bootstrap_snapshot(spark, snapshot, table, state2, watermark=W,
                            groups=groups, n_buckets=8, adopt_existing=True)
    assert r2["rows_loaded"] == 0  # nothing written, files adopted
    assert read_current(LakeTable(spark, table)).count() == n_live
    # rerun under the same state root is the usual no-op
    r3 = bootstrap_snapshot(spark, snapshot, table, state2, watermark=W,
                            groups=groups, n_buckets=8, adopt_existing=True)
    assert r3["already_bootstrapped"] and r3["rows_loaded"] == 0

    eng = CdcEngine(spark, ev, table, state2,
                    max_records_per_batch=1000, n_buckets=8)
    eng.run_until_caught_up()
    assert_matches_oracle(read_current(eng.table),
                          ev.filter(F.col("op").isin("I", "U", "D")))


def test_bootstrap_lineage_is_zero_width(spark, tmp_table_dir):
    """Bootstrap lineage must record a ZERO-width window at the watermark
    (low_seq == high_seq == W). A (-1, W] window with rows_read=0 would
    (a) poison observed_seq_density → the planner widens admission by
    max_window_factor right after handoff, and (b) make the pending-batch
    crash path replan the entire history."""
    ev, groups = _fixture(spark, tmp_table_dir, n=1200)
    table = os.path.join(tmp_table_dir, "table")
    state = os.path.join(tmp_table_dir, "state")
    W = 600
    snapshot = expected_final_state(ev.filter(F.col("seq") <= W))
    bootstrap_snapshot(spark, snapshot, table, state, watermark=W,
                       groups=groups, n_buckets=8)
    store = StateStore(state)
    commits = store.committed_batches()
    assert len(commits) == 1
    lineage = commits[0]["lineage"]
    assert lineage, "handoff watermarks ride on lineage"
    assert all(ln["low_seq"] == W and ln["high_seq"] == W
               for ln in lineage)
    # density estimator sees no width → no evidence, NOT an inflated window
    assert store.observed_seq_density() is None
    # resume semantics intact: every group's watermark is W
    assert set(store.last_committed_watermarks().values()) == {W}
