"""Changelog-driven incremental sync (gobblin_spark/sync.py): upstream
ingest → sync → downstream replay equals read_current at EVERY sync point,
exactly-once across crash/rerun (≙ the reference's publish-then-consume
chain with the `_late` re-read, done as a first-class incremental diff)."""

import json
import os

import pyspark.sql.functions as F

from gobblin_spark.engine import CdcEngine
from gobblin_spark.lakehouse import LakeTable
from gobblin_spark.lakehouse.merge import read_current
from gobblin_spark.sources import generate_change_events
from gobblin_spark.state.store import StateStore
from gobblin_spark.sync import sync_changes

KEYS = ["repo", "path"]


def _events(spark, d, n=3000):
    generate_change_events(
        spark, n, n_repos=12, paths_per_repo=50,
        dup_frac=0.05, delete_frac=0.08, ooo_window=150,
    ).write.parquet(d + "/events")
    return spark.read.parquet(d + "/events")


def _replay_downstream(spark, out_dir):
    """What a downstream consumer does: apply range dirs in version order,
    upserting insert/update, dropping delete."""
    state: dict = {}
    for name in sorted(os.listdir(out_dir)):
        if not name.startswith("changes_"):
            continue
        for r in spark.read.parquet(os.path.join(out_dir, name)).collect():
            k = (r["repo"], r["path"])
            if r["_change_type"] == "delete":
                state.pop(k, None)
            else:
                state[k] = r["commit"]
    return state


def _table_state(t):
    return {(r["repo"], r["path"]): r["commit"]
            for r in read_current(t).collect()}


def test_sync_tracks_table_across_ingests(spark, tmp_table_dir):
    d = tmp_table_dir
    ev = _events(spark, d)
    hi = int(ev.agg(F.max("seq")).first()[0])
    cuts = [hi // 3, 2 * hi // 3, hi]

    out = d + "/downstream"
    for cut in cuts:
        eng = CdcEngine(spark, ev.filter(F.col("seq") <= cut), d + "/t",
                        d + "/s", max_records_per_batch=100000, n_buckets=8,
                        merge_mode="mor", compact_every=2)
        eng.run_until_caught_up()
        res = sync_changes(spark, d + "/t", d + "/sync_s", out)
        assert not res["skipped"] and res["synced_rows"] > 0
        # downstream replay == upstream visible state at THIS sync point
        assert _replay_downstream(spark, out) == _table_state(eng.table)

    # caught up: rerun ships nothing
    res = sync_changes(spark, d + "/t", d + "/sync_s", out)
    assert res["skipped"] and res["synced_rows"] == 0

    # the changelog shipped only changed rows, not the table each time
    n_rows_shipped = sum(
        spark.read.parquet(os.path.join(out, n)).count()
        for n in os.listdir(out) if n.startswith("changes_"))
    n_keys = len(_table_state(LakeTable(spark, d + "/t")))
    assert n_rows_shipped < 3 * n_keys


def test_sync_crash_between_publish_and_commit_is_exactly_once(
        spark, tmp_table_dir, monkeypatch):
    """Crash after the range directory published but before the watermark
    commit: the rerun must verify-and-skip the write (the sink never sees
    the range twice) and then commit."""
    d = tmp_table_dir
    ev = _events(spark, d, n=1500)
    eng = CdcEngine(spark, ev, d + "/t", d + "/s",
                    max_records_per_batch=100000, n_buckets=8)
    eng.run_until_caught_up()

    real_commit = StateStore.commit_batch

    def boom(self, *a, **kw):
        raise RuntimeError("injected crash before sync commit")

    monkeypatch.setattr(StateStore, "commit_batch", boom)
    out = d + "/downstream"
    import pytest
    with pytest.raises(RuntimeError, match="injected"):
        sync_changes(spark, d + "/t", d + "/sync_s", out)
    monkeypatch.setattr(StateStore, "commit_batch", real_commit)

    ranges = [n for n in os.listdir(out) if n.startswith("changes_")]
    assert len(ranges) == 1  # the sink publish landed before the crash
    mtime = os.path.getmtime(os.path.join(out, ranges[0]))

    res = sync_changes(spark, d + "/t", d + "/sync_s", out)
    assert not res["skipped"] and res["synced_rows"] > 0
    # same single range dir, not rewritten (verify-then-skip)
    assert [n for n in os.listdir(out)
            if n.startswith("changes_")] == ranges
    assert os.path.getmtime(os.path.join(out, ranges[0])) == mtime
    # further rerun: watermark committed, nothing to do
    assert sync_changes(spark, d + "/t", d + "/sync_s", out)["skipped"]
    assert _replay_downstream(spark, out) == _table_state(
        LakeTable(spark, d + "/t"))


def test_sync_cli_by_name(spark, tmp_table_dir, capsys):
    from gobblin_spark.cli import main

    d = tmp_table_dir
    _events(spark, d, n=1200)
    assert main(["ingest", "--events", d + "/events", "--table", d + "/t",
                 "--state", d + "/s", "--max-records-per-batch", "100000",
                 "--catalog", d + "/cat", "--register-as", "commits"]) == 0
    capsys.readouterr()
    rc = main(["sync", "--catalog", d + "/cat", "--table", "commits",
               "--state", d + "/sync_s", "--out", d + "/downstream"])
    assert rc == 0
    res = json.loads([l for l in capsys.readouterr().out.splitlines()
                      if l.startswith("{")][-1])
    assert res["synced_rows"] > 0
    assert _replay_downstream(spark, d + "/downstream") == _table_state(
        LakeTable(spark, d + "/t"))
    # sync refuses to run without its own state root
    import pytest
    with pytest.raises(SystemExit, match="own --state"):
        main(["sync", "--catalog", d + "/cat", "--table", "commits",
              "--out", d + "/downstream"])
