"""Incrementally-maintained aggregate views (gobblin_spark/aggview.py):
the view must equal a from-scratch GROUP BY over the upstream's visible
state at EVERY sync point, under updates, deletes, null measures, group
deletion/recreation, crash/rerun exactly-once, and group-key refusals.
Also pins table_changes(emit_preimages=True) row semantics (≙ Delta CDF)."""

import json

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import (
    BooleanType, DoubleType, LongType, StringType, StructField, StructType,
)

from gobblin_spark.aggview import agg_sync, read_view
from gobblin_spark.engine import CdcEngine
from gobblin_spark.lakehouse import LakeTable
from gobblin_spark.lakehouse.merge import (
    merge_lww, read_current, table_changes,
)
from gobblin_spark.sources import generate_change_events
from gobblin_spark.state.store import StateStore

SRC_SCHEMA = StructType([
    StructField("k", LongType()),
    StructField("grp", StringType()),
    StructField("v", LongType()),
    StructField("x", DoubleType()),
    StructField("__seq", LongType()),
    StructField("__deleted", BooleanType()),
])


def _mk_source(spark, root, rows, n_buckets=4):
    """rows: (k, grp, v, x, seq, op)"""
    t = LakeTable.create(spark, root, SRC_SCHEMA, ["k"],
                         n_buckets=n_buckets)
    df = spark.createDataFrame(
        rows, "k long, grp string, v long, x double, seq long, op string")
    merge_lww(t, df, ["k"])
    return t


def _oracle(spark, src, sum_cols=("v", "x")):
    state = read_current(src)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in sum_cols:
        aggs.append(F.sum(c).alias(f"sum_{c}"))
    return {
        tuple(r[c] for c in ("grp",)):
        tuple(r[a] for a in
              ["n_rows"] + [f"sum_{c}" for c in sum_cols])
        for r in state.groupBy("grp").agg(*aggs).collect()
    }


def _view_dict(spark, view_root, sum_cols=("v", "x")):
    return {
        (r["grp"],):
        tuple(r[a] for a in ["n_rows"] + [f"sum_{c}" for c in sum_cols])
        for r in read_view(spark, view_root).collect()
    }


def test_view_equals_groupby_under_updates_deletes_nulls(
        spark, tmp_table_dir):
    d = tmp_table_dir
    src = _mk_source(spark, d + "/src", [
        (1, "a", 10, 1.5, 1, "I"),
        (2, "a", 20, None, 2, "I"),
        (3, "b", None, 2.0, 3, "I"),
        (4, "b", None, None, 4, "I"),
        (5, "c", 5, 0.5, 5, "I"),
    ])
    kw = dict(group_cols=["grp"], sum_cols=["v", "x"], n_buckets=4,
              full_reaggregate_threshold=None)  # pin the incremental path
    r1 = agg_sync(spark, d + "/src", d + "/vstate", d + "/view", **kw)
    assert not r1["skipped"]
    assert _view_dict(spark, d + "/view") == _oracle(spark, src)

    # update moves a row BETWEEN groups; delete removes one; null measure
    # appears and disappears; group c is wholly deleted
    merge_lww(src, spark.createDataFrame([
        (1, "b", 11, None, 6, "U"),     # a -> b, v 10->11, x 1.5->null
        (2, None, None, None, 7, "D"),  # delete from a -> group a now gone
        (5, None, None, None, 8, "D"),  # group c reaches n=0
        (6, "b", 7, 3.5, 9, "I"),
    ], "k long, grp string, v long, x double, seq long, op string"), ["k"])
    r2 = agg_sync(spark, d + "/src", d + "/vstate", d + "/view", **kw)
    assert not r2["skipped"] and r2["groups_touched"] >= 2
    want = _oracle(spark, src)
    assert ("c",) not in want  # oracle agrees the group vanished
    assert _view_dict(spark, d + "/view") == want

    # group c recreated from zero; all-null-x group stays NULL-summed
    merge_lww(src, spark.createDataFrame([
        (7, "c", 100, None, 10, "I"),
    ], "k long, grp string, v long, x double, seq long, op string"), ["k"])
    agg_sync(spark, d + "/src", d + "/vstate", d + "/view", **kw)
    want = _oracle(spark, src)
    assert want[("c",)] == (1, 100, None)
    assert _view_dict(spark, d + "/view") == want

    # no upstream movement -> skip
    r4 = agg_sync(spark, d + "/src", d + "/vstate", d + "/view", **kw)
    assert r4["skipped"]


def test_view_tracks_generated_stream_across_ingests(spark, tmp_table_dir):
    d = tmp_table_dir
    generate_change_events(
        spark, 2500, n_repos=10, paths_per_repo=40,
        dup_frac=0.05, delete_frac=0.08, ooo_window=120,
    ).write.parquet(d + "/events")
    ev = spark.read.parquet(d + "/events")
    hi = int(ev.agg(F.max("seq")).first()[0])
    for cut in (hi // 3, 2 * hi // 3, hi):
        eng = CdcEngine(spark, ev.filter(F.col("seq") <= cut), d + "/t",
                        d + "/s", max_records_per_batch=100000, n_buckets=8,
                        merge_mode="mor", compact_every=2)
        eng.run_until_caught_up()
        agg_sync(spark, d + "/t", d + "/vstate", d + "/view",
                 group_cols=["lang"], n_buckets=8)
        src = LakeTable(spark, d + "/t")
        want = {r["lang"]: r["n"] for r in read_current(src)
                .groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
                .collect()}
        got = {r["lang"]: r["n_rows"]
               for r in read_view(spark, d + "/view").collect()}
        assert got == want


def test_crash_between_view_commit_and_log_commit(spark, tmp_table_dir,
                                                  monkeypatch):
    d = tmp_table_dir
    src = _mk_source(spark, d + "/src", [
        (1, "a", 10, 1.0, 1, "I"), (2, "b", 20, 2.0, 2, "I"),
    ])
    kw = dict(group_cols=["grp"], sum_cols=["v", "x"], n_buckets=4,
              full_reaggregate_threshold=None)  # pin the incremental path
    agg_sync(spark, d + "/src", d + "/vstate", d + "/view", **kw)

    merge_lww(src, spark.createDataFrame(
        [(1, "a", 15, 1.0, 3, "U")],
        "k long, grp string, v long, x double, seq long, op string"), ["k"])

    real = StateStore.commit_batch
    def boom(self, *a, **k):
        raise RuntimeError("crash after view commit, before log commit")
    monkeypatch.setattr(StateStore, "commit_batch", boom)
    with pytest.raises(RuntimeError):
        agg_sync(spark, d + "/src", d + "/vstate", d + "/view", **kw)
    monkeypatch.setattr(StateStore, "commit_batch", real)

    # the view table HAS the delta applied; the log does not. Rerun must
    # not double-apply (agg_source_version guard), then commit the log.
    r = agg_sync(spark, d + "/src", d + "/vstate", d + "/view", **kw)
    assert not r["skipped"] and r["groups_touched"] == 0
    assert _view_dict(spark, d + "/view") == _oracle(spark, src)
    # and the watermark is committed now
    r2 = agg_sync(spark, d + "/src", d + "/vstate", d + "/view", **kw)
    assert r2["skipped"]


def test_crash_then_upstream_advance_resumes_from_applied(
        spark, tmp_table_dir, monkeypatch):
    """A crash between the view commit and the log commit, FOLLOWED by
    more upstream ingests before the rerun: the rerun must resume the
    changelog from the view's applied version, not from the stale
    watermark — resuming from the watermark would re-apply the
    already-applied range (double-counted retractions)."""
    d = tmp_table_dir
    src = _mk_source(spark, d + "/src", [
        (1, "a", 10, 1.0, 1, "I"), (2, "b", 20, 2.0, 2, "I"),
    ])
    kw = dict(group_cols=["grp"], sum_cols=["v", "x"], n_buckets=4,
              full_reaggregate_threshold=None)  # pin the incremental path
    agg_sync(spark, d + "/src", d + "/vstate", d + "/view", **kw)

    merge_lww(src, spark.createDataFrame(
        [(1, "a", 15, 1.0, 3, "U")],
        "k long, grp string, v long, x double, seq long, op string"), ["k"])
    real = StateStore.commit_batch
    monkeypatch.setattr(
        StateStore, "commit_batch",
        lambda self, *a, **k: (_ for _ in ()).throw(RuntimeError("crash")))
    with pytest.raises(RuntimeError):
        agg_sync(spark, d + "/src", d + "/vstate", d + "/view", **kw)
    monkeypatch.setattr(StateStore, "commit_batch", real)

    # upstream advances AGAIN before the rerun
    merge_lww(src, spark.createDataFrame(
        [(1, "a", 25, 1.0, 4, "U")],
        "k long, grp string, v long, x double, seq long, op string"), ["k"])

    agg_sync(spark, d + "/src", d + "/vstate", d + "/view", **kw)
    assert _view_dict(spark, d + "/view") == _oracle(spark, src)


def test_refusals(spark, tmp_table_dir):
    d = tmp_table_dir
    _mk_source(spark, d + "/src", [(1, None, 1, 1.0, 1, "I")])
    with pytest.raises(ValueError, match="NULL group"):
        agg_sync(spark, d + "/src", d + "/vs", d + "/view",
                 group_cols=["grp"], sum_cols=["v"])

    src2 = _mk_source(spark, d + "/src2", [(1, "a", 1, 1.0, 1, "I")])
    agg_sync(spark, d + "/src2", d + "/vs2", d + "/view2",
             group_cols=["grp"], sum_cols=["v"])
    # spec drift across calls
    with pytest.raises(ValueError, match="spec mismatch"):
        agg_sync(spark, d + "/src2", d + "/vs2", d + "/view2",
                 group_cols=["grp"], sum_cols=["v", "x"])
    # non-numeric sum col
    with pytest.raises(ValueError, match="numeric"):
        agg_sync(spark, d + "/src2", d + "/vs3", d + "/view3",
                 group_cols=["grp"], sum_cols=["grp"])
    # a table with data that is NOT an aggregate view: refuse to adopt
    with pytest.raises(ValueError, match="refusing to adopt"):
        agg_sync(spark, d + "/src2", d + "/vs4", d + "/src",
                 group_cols=["grp"], sum_cols=["v"])
    # a view maintained from a DIFFERENT source table: refuse
    with pytest.raises(ValueError, match="maintained from"):
        agg_sync(spark, d + "/src", d + "/vs5", d + "/view2",
                 group_cols=["grp"], sum_cols=["v"])


def test_fresh_state_root_resumes_from_applied(spark, tmp_table_dir):
    """The view's agg_source_version is the authoritative cursor: a FRESH
    state root pointed at an existing up-to-date view must not re-apply
    anything (resume-from-applied), and after the upstream advances it
    continues incrementally from the applied version, not from zero."""
    d = tmp_table_dir
    src = _mk_source(spark, d + "/src", [
        (1, "a", 10, 1.0, 1, "I"), (2, "b", 20, 2.0, 2, "I"),
    ])
    kw = dict(group_cols=["grp"], sum_cols=["v", "x"], n_buckets=4,
              full_reaggregate_threshold=None)  # pin the incremental path
    agg_sync(spark, d + "/src", d + "/state1", d + "/view", **kw)

    # same view, fresh state root, upstream unmoved: nothing applied
    r = agg_sync(spark, d + "/src", d + "/state2", d + "/view", **kw)
    assert r["groups_touched"] == 0
    assert _view_dict(spark, d + "/view") == _oracle(spark, src)

    # upstream advances; the fresh root advances the view exactly once
    merge_lww(src, spark.createDataFrame(
        [(1, "a", 99, 1.0, 3, "U")],
        "k long, grp string, v long, x double, seq long, op string"), ["k"])
    r2 = agg_sync(spark, d + "/src", d + "/state2", d + "/view", **kw)
    assert not r2["skipped"] and r2["groups_touched"] >= 1
    assert _view_dict(spark, d + "/view") == _oracle(spark, src)


def test_cli_agg_sync(spark, tmp_table_dir):
    from gobblin_spark.cli import main

    d = tmp_table_dir
    src = _mk_source(spark, d + "/src", [
        (1, "a", 10, 1.0, 1, "I"), (2, "b", 20, 2.0, 2, "I"),
    ])
    rc = main(["agg-sync", "--table", d + "/src", "--state", d + "/vs",
               "--view", d + "/view", "--group-cols", "grp",
               "--sum-cols", "v,x"])
    assert rc == 0
    merge_lww(src, spark.createDataFrame(
        [(2, None, None, None, 3, "D")],
        "k long, grp string, v long, x double, seq long, op string"), ["k"])
    rc = main(["agg-sync", "--table", d + "/src", "--state", d + "/vs",
               "--view", d + "/view", "--group-cols", "grp",
               "--sum-cols", "v,x"])
    assert rc == 0
    assert _view_dict(spark, d + "/view") == _oracle(spark, src)


def test_view_tails_a_streaming_ingested_table(spark, tmp_table_dir):
    """End-to-end streaming derived data: the view tails a table that is
    maintained by STRUCTURED-STREAMING ingest (availableNow runs), staying
    equal to a from-scratch GROUP BY after every stream advance — the
    changelog diff does not care who wrote the snapshots."""
    import os

    from gobblin_spark.streaming.ingest import stream_ingest

    d = tmp_table_dir
    ev = generate_change_events(
        spark, 1500, n_repos=12, paths_per_repo=40,
        dup_frac=0.05, delete_frac=0.08, ooo_window=120,
    ).cache()
    ev_dir = os.path.join(d, "events")
    ev.filter(F.col("seq") < 800).write.mode("overwrite").parquet(ev_dir)

    stream_ingest(spark, ev_dir, d + "/t", d + "/s",
                  os.path.join(d, "ckpt")).awaitTermination()
    agg_sync(spark, d + "/t", d + "/vstate", d + "/view",
             group_cols=["lang"], n_buckets=8)

    def check():
        src = LakeTable(spark, d + "/t")
        want = {r["lang"]: r["n"] for r in read_current(src)
                .groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
                .collect()}
        got = {r["lang"]: r["n_rows"]
               for r in read_view(spark, d + "/view").collect()}
        assert got == want

    check()
    ev.filter(F.col("seq") >= 800).write.mode("append").parquet(ev_dir)
    stream_ingest(spark, ev_dir, d + "/t", d + "/s",
                  os.path.join(d, "ckpt")).awaitTermination()
    r = agg_sync(spark, d + "/t", d + "/vstate", d + "/view",
                 group_cols=["lang"], n_buckets=8)
    assert not r["skipped"]
    check()


# ------------------------------------------------------------------ min/max

def _mm_oracle(spark, src):
    state = read_current(src)
    return {
        r["grp"]: (r["n"], r["mn_v"], r["mx_v"], r["mn_x"], r["mx_x"])
        for r in state.groupBy("grp").agg(
            F.count(F.lit(1)).alias("n"),
            F.min("v").alias("mn_v"), F.max("v").alias("mx_v"),
            F.min("x").alias("mn_x"), F.max("x").alias("mx_x"),
        ).collect()
    }


def _mm_view(spark, view_root):
    return {
        r["grp"]: (r["n_rows"], r["min_v"], r["max_v"],
                   r["min_x"], r["max_x"])
        for r in read_view(spark, view_root).collect()
    }


def test_minmax_monotone_rescan_and_nulls(spark, tmp_table_dir,
                                          monkeypatch):
    import gobblin_spark.lakehouse.merge as merge_mod

    d = tmp_table_dir
    src = _mk_source(spark, d + "/src", [
        (1, "a", 10, 1.0, 1, "I"),
        (2, "a", 10, 5.0, 2, "I"),   # duplicate min v in group a
        (3, "a", 30, None, 3, "I"),
        (4, "b", None, None, 4, "I"),  # all-null measures
    ])
    kw = dict(group_cols=["grp"], minmax_cols=["v", "x"], n_buckets=4,
              full_reaggregate_threshold=None)  # pin the incremental path
    agg_sync(spark, d + "/src", d + "/vstate", d + "/view", **kw)
    assert _mm_view(spark, d + "/view") == _mm_oracle(spark, src)
    assert _mm_view(spark, d + "/view")["b"] == (1, None, None, None, None)

    # insert-only advance: monotone update, the upstream must NOT be
    # rescanned (read_current would be the only upstream re-read)
    merge_lww(src, spark.createDataFrame(
        [(5, "a", 2, 9.0, 5, "I")],
        "k long, grp string, v long, x double, seq long, op string"), ["k"])
    real_rc = merge_mod.read_current
    monkeypatch.setattr(
        merge_mod, "read_current",
        lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("upstream rescanned on an insert-only advance")))
    agg_sync(spark, d + "/src", d + "/vstate", d + "/view", **kw)
    monkeypatch.setattr(merge_mod, "read_current", real_rc)
    assert _mm_view(spark, d + "/view") == _mm_oracle(spark, src)

    # retract ONE of the two duplicate minima: rescan fires (conservative
    # tie handling), result unchanged for min_v and correct overall
    merge_lww(src, spark.createDataFrame(
        [(2, None, None, None, 6, "D")],
        "k long, grp string, v long, x double, seq long, op string"), ["k"])
    agg_sync(spark, d + "/src", d + "/vstate", d + "/view", **kw)
    want = _mm_oracle(spark, src)
    assert want["a"][1] == 2  # min v still 2 (the newer insert)
    assert _mm_view(spark, d + "/view") == want

    # retract the unique min AND the unique max: full rescan correctness
    merge_lww(src, spark.createDataFrame([
        (5, None, None, None, 7, "D"),   # v=2 (min), x=9.0 (max)
        (3, None, None, None, 8, "D"),   # v=30 (max)
    ], "k long, grp string, v long, x double, seq long, op string"), ["k"])
    agg_sync(spark, d + "/src", d + "/vstate", d + "/view", **kw)
    want = _mm_oracle(spark, src)
    assert want["a"] == (1, 10, 10, 1.0, 1.0)
    assert _mm_view(spark, d + "/view") == want


def test_minmax_group_move_retracts_old_group(spark, tmp_table_dir):
    d = tmp_table_dir
    src = _mk_source(spark, d + "/src", [
        (1, "a", 1, 1.0, 1, "I"),    # group a's min
        (2, "a", 50, 2.0, 2, "I"),
        (3, "b", 7, 3.0, 3, "I"),
    ])
    kw = dict(group_cols=["grp"], sum_cols=["v"], minmax_cols=["v"],
              full_reaggregate_threshold=None,  # pin the incremental path
              n_buckets=4)
    agg_sync(spark, d + "/src", d + "/vstate", d + "/view", **kw)
    # move the min row a -> b: a rescans (extremum retracted), b monotone
    merge_lww(src, spark.createDataFrame(
        [(1, "b", 1, 1.0, 4, "U")],
        "k long, grp string, v long, x double, seq long, op string"), ["k"])
    agg_sync(spark, d + "/src", d + "/vstate", d + "/view", **kw)
    got = {r["grp"]: (r["n_rows"], r["sum_v"], r["min_v"], r["max_v"])
           for r in read_view(spark, d + "/view").collect()}
    assert got == {"a": (1, 50, 50, 50), "b": (2, 8, 1, 7)}


# ---------------------------------------------------------------- preimages

def test_table_changes_preimage_rows(spark, tmp_table_dir):
    d = tmp_table_dir
    src = _mk_source(spark, d + "/src", [
        (1, "a", 10, 1.0, 1, "I"),   # will be updated
        (2, "b", 20, 2.0, 2, "I"),   # will be deleted
        (3, "c", 30, 3.0, 3, "I"),   # unchanged
    ])
    v1 = src.current_version()
    merge_lww(src, spark.createDataFrame([
        (1, "z", 11, None, 4, "U"),
        (2, None, None, None, 5, "D"),
        (4, "d", 40, 4.0, 6, "I"),
    ], "k long, grp string, v long, x double, seq long, op string"), ["k"])

    rows = {(r["k"], r["_change_type"]): r for r in table_changes(
        src, v1, emit_preimages=True).collect()}
    assert set(rows) == {
        (1, "update_preimage"), (1, "update_postimage"),
        (2, "delete"), (4, "insert"),
    }
    pre, post = rows[(1, "update_preimage")], rows[(1, "update_postimage")]
    assert (pre["grp"], pre["v"], pre["x"], pre["__seq"]) == ("a", 10, 1.0, 1)
    assert (post["grp"], post["v"], post["x"], post["__seq"]) == \
        ("z", 11, None, 4)
    # delete carries strictly the OLD image with the deleting seq
    dele = rows[(2, "delete")]
    assert (dele["grp"], dele["v"], dele["__seq"]) == ("b", 20, 5)
    ins = rows[(4, "insert")]
    assert (ins["grp"], ins["v"], ins["__seq"]) == ("d", 40, 6)

    # default mode unchanged: one row per changed key, update = new image
    legacy = {(r["k"], r["_change_type"]): r
              for r in table_changes(src, v1).collect()}
    assert set(legacy) == {(1, "update"), (2, "delete"), (4, "insert")}
    assert legacy[(1, "update")]["grp"] == "z"


def test_regime_chooser_picks_by_changed_unit_fraction(
        spark, tmp_table_dir):
    """The chooser reads the changed-unit fraction from manifest math: a
    narrow advance (one key → one bucket) stays incremental; a wide
    advance (every bucket rewritten) takes the from-scratch re-aggregate.
    Both commit oracle-equal state, including tombstones for groups that
    vanished during the wide advance."""
    d = tmp_table_dir
    rows = [(k, f"g{k % 5}", k, float(k), k + 1, "I") for k in range(40)]
    src = _mk_source(spark, d + "/src", rows, n_buckets=8)
    kw = dict(group_cols=["grp"], sum_cols=["v", "x"], n_buckets=4)
    r0 = agg_sync(spark, d + "/src", d + "/vstate", d + "/view", **kw)
    assert r0["mode"] == "bootstrap"

    # narrow: one key touches one bucket → fraction 1/8 < 0.5
    merge_lww(src, spark.createDataFrame(
        [(1, "g1", 999, 9.9, 100, "U")],
        "k long, grp string, v long, x double, seq long, op string"),
        ["k"])
    r1 = agg_sync(spark, d + "/src", d + "/vstate", d + "/view", **kw)
    assert r1["mode"] == "incremental"
    assert r1["changed_unit_fraction"] < 0.5
    assert _view_dict(spark, d + "/view") == _oracle(spark, src)

    # wide: rewrite every key (and delete group g4 entirely) → fraction 1.0
    wide = [(k, f"g{k % 4}", k * 2, float(k), 200 + k, "U")
            for k in range(40)]
    merge_lww(src, spark.createDataFrame(
        wide, "k long, grp string, v long, x double, seq long, op string"),
        ["k"])
    r2 = agg_sync(spark, d + "/src", d + "/vstate", d + "/view", **kw)
    assert r2["mode"] == "full"
    assert r2["changed_unit_fraction"] >= 0.5
    want = _oracle(spark, src)
    assert ("g4",) not in want  # group vanished in the wide advance
    assert _view_dict(spark, d + "/view") == want

    # threshold=None forces incremental even on a wide advance
    merge_lww(src, spark.createDataFrame(
        [(k, f"g{k % 4}", k * 3, float(k), 300 + k, "U")
         for k in range(40)],
        "k long, grp string, v long, x double, seq long, op string"),
        ["k"])
    r3 = agg_sync(spark, d + "/src", d + "/vstate", d + "/view",
                  full_reaggregate_threshold=None, **kw)
    assert r3["mode"] == "incremental"
    assert _view_dict(spark, d + "/view") == _oracle(spark, src)


def test_regime_paths_commit_identical_state(spark, tmp_table_dir):
    """Property: advancing one view always-incremental and a twin
    always-full over the same upstream history must leave bit-identical
    visible view state (the chooser is cost-only, never semantic)."""
    from gobblin_spark.lakehouse.merge import table_fingerprint

    d = tmp_table_dir
    generate_change_events(
        spark, 2000, n_repos=8, paths_per_repo=30,
        dup_frac=0.05, delete_frac=0.1, ooo_window=100,
    ).write.parquet(d + "/events")
    ev = spark.read.parquet(d + "/events")
    hi = int(ev.agg(F.max("seq")).first()[0])
    for cut in (hi // 2, hi):
        eng = CdcEngine(spark, ev.filter(F.col("seq") <= cut), d + "/t",
                        d + "/s", max_records_per_batch=100000, n_buckets=8)
        eng.run_until_caught_up()
        agg_sync(spark, d + "/t", d + "/vs_inc", d + "/v_inc",
                 group_cols=["lang"], n_buckets=4,
                 full_reaggregate_threshold=None)
        agg_sync(spark, d + "/t", d + "/vs_full", d + "/v_full",
                 group_cols=["lang"], n_buckets=4,
                 full_reaggregate_threshold=0.0)
    fi = table_fingerprint(LakeTable(spark, d + "/v_inc"))
    ff = table_fingerprint(LakeTable(spark, d + "/v_full"))
    assert fi["rows"] == ff["rows"] > 0
    assert fi["fingerprint"] == ff["fingerprint"]
