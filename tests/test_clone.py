"""Table clone / replication (gobblin_spark/clone.py): a clone must be a
fully independent LakeTable with fingerprint-identical visible state, MOR
deltas and mixed bucket specs included, and a state-included DR clone must
resume ingest exactly where the source stopped (final state sha-equal to
an uninterrupted run)."""

import json
import os

import pyspark.sql.functions as F
import pytest

from gobblin_spark.clone import clone_table
from gobblin_spark.engine import CdcEngine
from gobblin_spark.lakehouse import LakeTable
from gobblin_spark.lakehouse.merge import (
    read_current, table_fingerprint,
)
from gobblin_spark.sources import generate_change_events


def _fp(t):
    """Content fingerprint without the snapshot-version field (a clone's
    history restarts at v1 by design)."""
    return {k: v for k, v in table_fingerprint(t).items()
            if k != "version"}


def _events(spark, d, n=4000):
    generate_change_events(
        spark, n, n_repos=12, paths_per_repo=60,
        dup_frac=0.05, delete_frac=0.08, ooo_window=200,
    ).write.parquet(d + "/events")
    return spark.read.parquet(d + "/events")


def test_clone_fingerprint_equal_and_independent(spark, tmp_table_dir):
    d = tmp_table_dir
    ev = _events(spark, d)
    eng = CdcEngine(spark, ev, d + "/t", d + "/s",
                    max_records_per_batch=100000, n_buckets=8)
    eng.run_until_caught_up()
    src = LakeTable(spark, d + "/t")

    res = clone_table(spark, d + "/t", d + "/t2")
    assert res["files"] > 0 and res["bytes"] > 0
    dst = LakeTable(spark, d + "/t2")
    assert dst.current_version() == 1
    assert _fp(src) == _fp(dst)
    assert dst.snapshot().properties["cloned_from"] == d + "/t"

    # independence: mutating the source does not move the clone
    from gobblin_spark.lakehouse.merge import delete_where
    delete_where(src, {"lang": "go"})
    assert _fp(src) != _fp(dst)

    # refusal: destination exists
    with pytest.raises(ValueError, match="already has a table"):
        clone_table(spark, d + "/t", d + "/t2")


def test_clone_pinned_version_and_mor_deltas(spark, tmp_table_dir):
    d = tmp_table_dir
    ev = _events(spark, d)
    # MOR with compaction disabled -> outstanding deltas at clone time
    eng = CdcEngine(spark, ev, d + "/t", d + "/s",
                    max_records_per_batch=1500, n_buckets=8,
                    merge_mode="mor", compact_every=None,
                    compact_delta_ratio=None)
    eng.run_until_caught_up()
    src = LakeTable(spark, d + "/t")
    assert int(src.snapshot().properties.get("mor_deltas", 0)) > 0

    v_mid = src.versions()[len(src.versions()) // 2]
    clone_table(spark, d + "/t", d + "/t_mid", version=v_mid)
    mid = LakeTable(spark, d + "/t_mid")
    # pinned clone equals the source read AT that version
    want = {(r["repo"], r["path"]): r["commit"]
            for r in read_current(src, version=v_mid).collect()}
    got = {(r["repo"], r["path"]): r["commit"]
           for r in read_current(mid).collect()}
    assert got == want

    clone_table(spark, d + "/t", d + "/t_cur")
    cur = LakeTable(spark, d + "/t_cur")
    assert int(cur.snapshot().properties.get("mor_deltas", 0)) > 0
    assert _fp(src) == _fp(cur)


def test_dr_clone_resumes_ingest(spark, tmp_table_dir):
    """State-included clone mid-stream: continuing ingest INTO THE CLONE
    applies exactly the un-ingested suffix and converges to the same
    final state as the uninterrupted source run."""
    d = tmp_table_dir
    ev = _events(spark, d)
    hi = int(ev.agg(F.max("seq")).first()[0])
    half = ev.filter(F.col("seq") <= hi // 2)

    eng = CdcEngine(spark, half, d + "/t", d + "/s",
                    max_records_per_batch=100000, n_buckets=8)
    eng.run_until_caught_up()

    clone_table(spark, d + "/t", d + "/t2",
                state_src=d + "/s", state_dst=d + "/s2")

    # source continues; clone continues independently from its own state
    for troot, sroot in ((d + "/t", d + "/s"), (d + "/t2", d + "/s2")):
        cont = CdcEngine(spark, ev, troot, sroot,
                         max_records_per_batch=100000, n_buckets=8)
        results = cont.run_until_caught_up()
        assert sum(r.rows_read for r in results) > 0
    src = LakeTable(spark, d + "/t")
    dst = LakeTable(spark, d + "/t2")
    assert _fp(src) == _fp(dst)

    # and the clone applied ONLY the suffix (no full replay)
    dst2 = CdcEngine(spark, ev, d + "/t2", d + "/s2",
                     max_records_per_batch=100000, n_buckets=8)
    assert dst2.run_until_caught_up() == []


def test_clone_across_rescale_preserves_mixed_specs(spark, tmp_table_dir):
    d = tmp_table_dir
    ev = _events(spark, d)
    hi = int(ev.agg(F.max("seq")).first()[0])
    eng = CdcEngine(spark, ev.filter(F.col("seq") <= hi // 2), d + "/t",
                    d + "/s", max_records_per_batch=100000, n_buckets=4)
    eng.run_until_caught_up()
    src = LakeTable(spark, d + "/t")
    src.rescale_buckets(16)  # metadata-only: mixed-spec files from here
    eng2 = CdcEngine(spark, ev, d + "/t", d + "/s",
                     max_records_per_batch=100000, n_buckets=4)
    eng2.run_until_caught_up()

    clone_table(spark, d + "/t", d + "/t2")
    dst = LakeTable(spark, d + "/t2")
    assert dst.snapshot().n_buckets == 16
    assert _fp(src) == _fp(dst)
    # residue-mapped reads still work on the clone (legacy_spec_n rode
    # along in properties)
    from gobblin_spark.lakehouse.merge import point_lookup
    row = read_current(dst).limit(1).collect()[0]
    hit = point_lookup(dst, {"repo": row["repo"], "path": row["path"]})
    assert hit.count() == 1


def test_clone_cli(spark, tmp_table_dir):
    from gobblin_spark.cli import main

    d = tmp_table_dir
    ev = _events(spark, d, n=1500)
    eng = CdcEngine(spark, ev, d + "/t", d + "/s",
                    max_records_per_batch=100000, n_buckets=4)
    eng.run_until_caught_up()
    src = LakeTable(spark, d + "/t")
    src.set_tag("release-1")
    rc = main(["clone", "--table", d + "/t", "--out", d + "/t2",
               "--tag", "release-1"])
    assert rc == 0
    dst = LakeTable(spark, d + "/t2")
    assert _fp(src) == _fp(dst)
    assert dst.tags() == {}  # tags are refs into the SOURCE history

    # catalog flow: resolve the SOURCE by name, register the clone
    from gobblin_spark.catalog import Catalog

    Catalog(d + "/cat").register("orig", d + "/t")
    rc = main(["clone", "--catalog", d + "/cat", "--table", "orig",
               "--out", d + "/t3", "--register-as", "replica"])
    assert rc == 0
    assert Catalog(d + "/cat").get("replica").table_root == d + "/t3"
    assert _fp(src) == _fp(LakeTable(spark, d + "/t3"))