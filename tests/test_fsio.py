"""CommitFs contract tests, parameterized over BOTH filesystems:

LocalFs (link(2) publish) and ObjectStoreFs (conditional-PUT semantics —
no link, no rename-into-place, prefix listings, no directory pruning).
The same suites passing over both is the evidence that the commit
protocol — lakehouse manifests, state-store commit log, the engine on
top — ports off POSIX by swapping one small class.
"""

import os
import threading

import pyspark.sql.functions as F
import pytest

from gobblin_spark.fsio import (
    CommitConflict, HadoopFs, LocalFs, ObjectStoreFs,
)
from gobblin_spark.lakehouse import ConcurrentCommitError, LakeTable
from gobblin_spark.state.store import StateStore

from tests.test_lakehouse import SCHEMA, make_df


@pytest.fixture(params=["local", "objectstore", "hadoop"])
def commit_fs(request):
    if request.param == "local":
        return LocalFs()
    if request.param == "objectstore":
        return ObjectStoreFs()
    # Hadoop FileSystem API through the driver JVM, driven against
    # file:// (RawLocalFileSystem) — the same class a real deployment
    # points at hdfs://; only NameNode-arbitrated atomicity differs
    return HadoopFs(spark=request.getfixturevalue("spark"), uri="file:///")


def test_publish_if_absent_exactly_one_winner(commit_fs, tmp_table_dir):
    """16 threads race to publish the same target: exactly one wins, the
    rest get CommitConflict, and the winner's content is intact."""
    if isinstance(commit_fs, HadoopFs):
        pytest.skip("exclusive-create atomicity is NameNode-arbitrated; "
                    "Hadoop's RawLocalFileSystem (the file:// test double) "
                    "is check-then-open — single-writer semantics are "
                    "covered by the rest of the suite")
    target = os.path.join(tmp_table_dir, "v1.json")
    wins, conflicts = [], []
    barrier = threading.Barrier(16)

    def attempt(i):
        barrier.wait()
        try:
            commit_fs.publish_if_absent(f"writer-{i}".encode(), target)
            wins.append(i)
        except CommitConflict:
            conflicts.append(i)

    threads = [threading.Thread(target=attempt, args=(i,)) for i in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(wins) == 1 and len(conflicts) == 15
    assert commit_fs.read(target) == f"writer-{wins[0]}".encode()


def test_write_replace_last_writer_wins(commit_fs, tmp_table_dir):
    target = os.path.join(tmp_table_dir, "ckpt.json")
    commit_fs.write_replace(b"one", target)
    commit_fs.write_replace(b"two", target)
    assert commit_fs.read(target) == b"two"
    assert commit_fs.exists(target)


def test_lake_table_protocol_over_fs(spark, tmp_table_dir, commit_fs):
    """create → append → conflict → sharded recommit → vacuum, all through
    the fs under test."""
    root = os.path.join(tmp_table_dir, "t")
    t = LakeTable.create(spark, root, SCHEMA, ["repo", "path"],
                         n_buckets=4, fs=commit_fs)
    t.append(make_df(spark, 50), seq_col="__seq")
    t.append(make_df(spark, 30, seq0=1000), seq_col="__seq")
    assert t.read().count() == 80
    assert t.snapshot().shard_refs is not None

    # optimistic conflict surfaces through the fs conflict signal
    snap = t.snapshot()
    files = t.write_data_files(make_df(spark, 10, seq0=2000),
                               seq_col="__seq")
    t.commit(keep_files=snap.files, add_files=files,
             expected_version=snap.version)
    with pytest.raises(ConcurrentCommitError):
        t.commit(keep_files=snap.files, add_files=files,
                 expected_version=snap.version)

    # orphans (uncommitted write) vacuum cleanly
    t.write_data_files(make_df(spark, 10, seq0=3000), seq_col="__seq")
    assert t.vacuum() > 0
    assert t.read().count() == 90

    # a second handle over the same fs type sees identical state
    t2 = LakeTable(spark, root,
                   fs=(HadoopFs(spark=spark, uri="file:///")
                       if isinstance(commit_fs, HadoopFs)
                       else type(commit_fs)()))
    assert t2.read().count() == 90


def test_state_store_protocol_over_fs(tmp_table_dir, commit_fs):
    """Checkpoints (rewritable) + commit log (publish-once) through the fs
    under test; a second publish of the same batch reports already-done."""
    from gobblin_spark.state.store import WorkUnitState

    store = StateStore(os.path.join(tmp_table_dir, "s"), fs=commit_fs)
    units = [WorkUnitState(workunit_id="w0", batch_id="b1", event_group=0,
                           low_seq=-1, high_seq=10)]
    store.begin_batch("b1", units)
    store.update_batch("b1", units, status="RUNNING")
    assert store.read_batch("b1")["status"] == "RUNNING"
    assert store.pending_batches()[0]["batch_id"] == "b1"

    assert store.commit_batch("b1", units, snapshot_version=2) is True
    assert store.is_committed("b1")
    # idempotent re-publish (crash replay) is a no-op, not a clobber
    assert store.commit_batch("b1", units, snapshot_version=9) is False
    assert store.read_commit("b1")["snapshot_version"] == 2
    assert store.last_committed_watermarks() == {0: 10}
    assert store.pending_batches() == []


def test_engine_end_to_end_over_objectstore_fs(spark, tmp_table_dir):
    """Full CDC apply + replay convergence with every commit-protocol I/O
    going through ObjectStoreFs — the runnable form of the 'designed for
    object stores' claim."""
    from tests.test_engine import events_fixture, make_engine, oracle_final
    from tests.oracle import assert_frames_equal_by_sha
    from gobblin_spark.lakehouse.merge import read_current

    ev = events_fixture(spark, 1200)
    eng = make_engine(spark, tmp_table_dir, ev, fs=ObjectStoreFs())
    eng.run_until_caught_up()
    final = eng.current_state().select(
        "repo", "path", "commit", "lang", "content")
    assert_frames_equal_by_sha(final.toPandas(), oracle_final(ev.toPandas()))

    # replay from scratch state over the SAME fs-backed table: idempotent
    eng2 = make_engine(spark, tmp_table_dir, ev, fs=ObjectStoreFs())
    res = eng2.run_until_caught_up()
    assert sum(r.rows_read for r in res) == 0
    ev.unpersist()


def test_publish_conflict_single_thread_hadoop(spark, tmp_table_dir):
    """The sequential half of the exactly-once contract on the Hadoop
    path: second publish of the same target raises CommitConflict and the
    first content is preserved."""
    fs = HadoopFs(spark=spark, uri="file:///")
    target = os.path.join(tmp_table_dir, "v1.json")
    fs.publish_if_absent(b"first", target)
    with pytest.raises(CommitConflict):
        fs.publish_if_absent(b"second", target)
    assert fs.read(target) == b"first"
    assert ".crc" not in "".join(fs.listdir(tmp_table_dir))


def test_engine_end_to_end_over_hadoop_fs(spark, tmp_table_dir):
    """Full CDC apply + idempotent replay with every commit-protocol I/O
    through the Hadoop FileSystem API — the HDFS deployment path, driven
    here against file://."""
    from tests.test_engine import events_fixture, make_engine, oracle_final
    from tests.oracle import assert_frames_equal_by_sha

    ev = events_fixture(spark, 1200)
    fs = HadoopFs(spark=spark, uri="file:///")
    eng = make_engine(spark, tmp_table_dir, ev, fs=fs)
    eng.run_until_caught_up()
    final = eng.current_state().select(
        "repo", "path", "commit", "lang", "content")
    assert_frames_equal_by_sha(final.toPandas(), oracle_final(ev.toPandas()))

    eng2 = make_engine(spark, tmp_table_dir, ev,
                       fs=HadoopFs(spark=spark, uri="file:///"))
    res = eng2.run_until_caught_up()
    assert sum(r.rows_read for r in res) == 0
    ev.unpersist()
