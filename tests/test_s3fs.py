"""S3Fs: the real-boto3 CommitFs port, driven against moto's in-process
S3 (gated on boto3+moto). The same contract the engine was developed
against on ObjectStoreFs, now enforced by an actual S3 API — conditional
PUT (If-None-Match) as the commit primitive, prefix LISTs as directory
emulation, batched DeleteObjects as remove_tree."""

import os
import threading

import pytest

boto3 = pytest.importorskip("boto3")
moto = pytest.importorskip("moto")

from gobblin_spark.catalog import Catalog, CatalogError  # noqa: E402
from gobblin_spark.fsio import CommitConflict, S3Fs  # noqa: E402
from gobblin_spark.state.store import StateStore, WorkUnitState  # noqa: E402

BUCKET = "test-lake"


@pytest.fixture
def s3fs():
    with moto.mock_aws():
        client = boto3.client("s3", region_name="us-east-1")
        client.create_bucket(Bucket=BUCKET)
        yield S3Fs(BUCKET, prefix="env/prod", client=client)


def test_publish_if_absent_conditional_put(s3fs):
    s3fs.publish_if_absent(b"one", "/lake/t/_meta/v1.json")
    with pytest.raises(CommitConflict):
        s3fs.publish_if_absent(b"two", "/lake/t/_meta/v1.json")
    assert s3fs.read("/lake/t/_meta/v1.json") == b"one"


def test_publish_race_exactly_one_winner(s3fs):
    """16 threads race the conditional PUT: the STORE enforces one winner
    (If-None-Match), no client-side locking."""
    wins, conflicts = [], []
    barrier = threading.Barrier(16)

    def attempt(i):
        barrier.wait()
        try:
            s3fs.publish_if_absent(f"w{i}".encode(), "/lake/commit.json")
            wins.append(i)
        except CommitConflict:
            conflicts.append(i)

    ts = [threading.Thread(target=attempt, args=(i,)) for i in range(16)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert len(wins) == 1 and len(conflicts) == 15
    assert s3fs.read("/lake/commit.json") == f"w{wins[0]}".encode()


def test_plain_operations_and_prefix_semantics(s3fs):
    assert not s3fs.exists("/lake")
    s3fs.makedirs("/lake/t")  # no-op, never required
    s3fs.write_replace(b"a", "/lake/t/_meta/v1.json")
    s3fs.write_replace(b"b", "/lake/t/_meta/v1.json")  # LWW
    assert s3fs.read("/lake/t/_meta/v1.json") == b"b"
    s3fs.write_replace(b"d", "/lake/t/data/b=0/f1.parquet")
    s3fs.write_replace(b"d", "/lake/t/data/b=1/f2.parquet")

    # "directory" exists == some key carries the prefix
    assert s3fs.exists("/lake/t") and s3fs.exists("/lake/t/data")
    assert not s3fs.exists("/lake/other")
    assert s3fs.listdir("/lake/t") == ["_meta", "data"]
    assert s3fs.listdir("/lake/t/data") == ["b=0", "b=1"]
    assert sorted(s3fs.walk_files("/lake/t/data")) == [
        "/lake/t/data/b=0/f1.parquet", "/lake/t/data/b=1/f2.parquet"]
    assert s3fs.mtime_ms("/lake/t/_meta/v1.json") > 0

    with pytest.raises(FileNotFoundError):
        s3fs.read("/lake/t/absent.json")
    with pytest.raises(FileNotFoundError):
        s3fs.remove("/lake/t/absent.json")
    s3fs.remove("/lake/t/data/b=0/f1.parquet")
    assert sorted(s3fs.walk_files("/lake/t/data")) == [
        "/lake/t/data/b=1/f2.parquet"]
    s3fs.remove_tree("/lake/t")
    assert not s3fs.exists("/lake/t")
    assert list(s3fs.walk_files("/lake/t")) == []


def test_state_store_protocol_over_s3(s3fs):
    """The exactly-once commit-log protocol, byte-for-byte the suite that
    runs over LocalFs/ObjectStoreFs, now against the S3 API."""
    store = StateStore("/lake/_state/t", fs=s3fs)
    units = [WorkUnitState(workunit_id="w0", batch_id="b1", event_group=0,
                           low_seq=-1, high_seq=10)]
    store.begin_batch("b1", units)
    store.update_batch("b1", units, status="RUNNING")
    assert store.read_batch("b1")["status"] == "RUNNING"
    assert store.pending_batches()[0]["batch_id"] == "b1"

    assert store.commit_batch("b1", units, snapshot_version=2) is True
    assert store.is_committed("b1")
    assert store.commit_batch("b1", units, snapshot_version=9) is False
    assert store.read_commit("b1")["snapshot_version"] == 2
    assert store.last_committed_watermarks() == {0: 10}
    assert store.pending_batches() == []


def test_catalog_over_s3(s3fs):
    cat = Catalog("/lake/_catalog", fs=s3fs)
    cat.register("commits", "/lake/t", state_root="/lake/_state/t")
    with pytest.raises(CatalogError, match="already registered"):
        cat.register("commits", "/elsewhere")
    assert cat.get("commits").state_root == "/lake/_state/t"
    assert [e.name for e in cat.list()] == ["commits"]
    cat.drop("commits")
    assert cat.list() == []


def test_manifest_commit_protocol_over_s3(s3fs, spark, tmp_table_dir):
    """LakeTable's optimistic snapshot commits with manifests in REAL S3
    (metadata plane) while the parquet data plane stays on the local disk
    — the split a production deployment runs (executors read/write data
    via s3a, the driver commits manifests via this class)."""
    from pyspark.sql import types as T

    from gobblin_spark.lakehouse import ConcurrentCommitError, LakeTable

    schema = T.StructType([
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("__seq", T.LongType()),
        T.StructField("__deleted", T.BooleanType()),
    ])
    root = os.path.join(tmp_table_dir, "t")
    t = LakeTable.create(spark, root, schema, ["repo", "path"],
                         n_buckets=4, fs=s3fs)
    df = spark.createDataFrame(
        [(f"r{i % 3}", f"p{i}", f"c{i}", i, False) for i in range(40)],
        schema)
    t.append(df, seq_col="__seq")
    assert t.read().count() == 40
    # no manifest bytes on the local disk: the metadata plane is S3-only
    assert not os.path.exists(os.path.join(root, "_meta"))
    assert s3fs.exists(os.path.join(root, "_meta"))

    # optimistic concurrency enforced by the store's conditional PUT
    snap = t.snapshot()
    t2 = LakeTable(spark, root, fs=s3fs)
    t2.commit(keep_files=snap.files, add_files=[],
              properties={"note": "winner"}, expected_version=snap.version)
    files = t.write_data_files(df.limit(5), seq_col="__seq")
    with pytest.raises(ConcurrentCommitError):
        t.commit(keep_files=snap.files, add_files=files,
                 expected_version=snap.version)
    assert LakeTable(spark, root, fs=s3fs).snapshot().properties[
        "note"] == "winner"


def test_engine_end_to_end_over_s3_metadata(s3fs, spark, tmp_table_dir):
    """Full CDC apply with EVERY commit-protocol I/O (manifests, state
    checkpoints, commit log) against the real S3 API; parquet data plane
    on the executors' own writer. Rerun from the same S3-backed state is
    exactly-once."""
    from tests.oracle import assert_frames_equal_by_sha
    from tests.test_engine import events_fixture, make_engine, oracle_final

    ev = events_fixture(spark, 1200)
    eng = make_engine(spark, tmp_table_dir, ev, fs=s3fs)
    eng.run_until_caught_up()
    final = eng.current_state().select(
        "repo", "path", "commit", "lang", "content")
    assert_frames_equal_by_sha(final.toPandas(), oracle_final(ev.toPandas()))

    eng2 = make_engine(spark, tmp_table_dir, ev, fs=s3fs)
    res = eng2.run_until_caught_up()
    assert sum(r.rows_read for r in res) == 0
    ev.unpersist()
