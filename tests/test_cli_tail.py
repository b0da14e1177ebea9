"""CLI `tail` e2e: snapshot-diff file discovery composed with the CDC
batch loop (≙ FileBasedSource feeding AbstractJobLauncher,
FileBasedSource.java:74-140). Asserts incremental file pulls, watermark
advance, and the exactly-once property of the two uncoordinated
checkpoints (file snapshot + engine watermark)."""

import json
import os

import pyspark.sql.functions as F

from gobblin_spark.cli import main
from gobblin_spark.lakehouse import LakeTable
from gobblin_spark.lakehouse.merge import read_current
from gobblin_spark.sources import generate_change_events


def _tail(capsys, events_dir, table, state):
    rc = main([
        "tail", "--events-dir", events_dir, "--table", table,
        "--state", state, "--max-records-per-batch", "5000",
    ])
    assert rc == 0
    out = [l for l in capsys.readouterr().out.splitlines()
           if l.startswith("{")][-1]
    return json.loads(out)


def test_tail_incremental_directory_ingest(spark, tmp_table_dir, capsys):
    incoming = os.path.join(tmp_table_dir, "incoming")
    table = os.path.join(tmp_table_dir, "table")
    state = os.path.join(tmp_table_dir, "state")

    ev = generate_change_events(
        spark, 6000, n_repos=10, paths_per_repo=60, dup_frac=0.05,
        delete_frac=0.05, ooo_window=200,
    ).cache()

    # drop 1: two files covering seq <= 4000
    ev.filter(F.col("seq") <= 2000).coalesce(1).write.parquet(
        os.path.join(incoming, "d1"))
    ev.filter((F.col("seq") > 2000) & (F.col("seq") <= 4000)) \
        .coalesce(1).write.parquet(os.path.join(incoming, "d2"))
    r1 = _tail(capsys, incoming, table, state)
    assert r1["files_pulled"] == 2
    # physical rows read == rows in the dropped files (dup events included)
    assert r1["events_applied"] == ev.filter(F.col("seq") <= 4000).count()

    # drop 2: only the new file may be pulled; watermark advances
    ev.filter(F.col("seq") > 4000).coalesce(1).write.parquet(
        os.path.join(incoming, "d3"))
    r2 = _tail(capsys, incoming, table, state)
    assert r2["files_pulled"] == 1
    assert r2["events_applied"] > 0
    v_done = r2["snapshot_version"]

    # drop 3: nothing new → empty plan, no Spark work
    r3 = _tail(capsys, incoming, table, state)
    assert r3 == {"files_pulled": 0, "batches": 0, "events_applied": 0}

    # crash window: file-snapshot commit lost AFTER the engine committed
    # (delete the latest fs snapshot run). The next tail re-pulls ALL files
    # of that run, but the engine's watermark skips every already-applied
    # event — zero rows re-applied, table version unchanged.
    snaps = sorted(os.listdir(os.path.join(state, "fs_snapshots")))
    os.remove(os.path.join(state, "fs_snapshots", snaps[-1]))
    r4 = _tail(capsys, incoming, table, state)
    assert r4["files_pulled"] == 1
    assert r4["events_applied"] == 0
    assert r4["snapshot_version"] == v_done

    # final state equals an independent LWW replay of the full event set
    got = read_current(LakeTable(spark, table))
    want = (
        ev.filter(F.col("op").isin("I", "U", "D"))
        .groupBy("repo", "path")
        .agg(F.max_by(F.struct("op", "content"), F.col("seq")).alias("w"))
        .filter(F.col("w.op") != "D")
        .select("repo", "path", F.col("w.content").alias("content"))
    )
    assert got.select("repo", "path", "content").exceptAll(want).count() == 0
    assert want.exceptAll(got.select("repo", "path", "content")).count() == 0
    ev.unpersist()


def test_cli_dedup_matches_corpus_keep_query(spark, tmp_table_dir, sf_dir):
    """The dedup CLI (md5 oracle tier) must keep exactly the docs the
    oracle-gated dedup_corpus_keep query keeps."""
    import os

    from gobblin_spark.cli import main
    from gobblin_spark.queries import q_dedup_corpus_keep

    out = os.path.join(tmp_table_dir, "kept")
    rc = main([
        "dedup",
        "--input", os.path.join(sf_dir, "documents.parquet"),
        "--output", out,
        "--threshold", "0.1",
        "--hash-fn", "md5",
    ])
    assert rc == 0
    kept_cli = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    kept_q = {r["doc_id"] for r in q_dedup_corpus_keep(spark, sf_dir).collect()}
    assert kept_cli == kept_q


def test_cli_curate_end_to_end(spark, tmp_table_dir, sf_dir):
    """The composed curation job: counts are monotone through the funnel,
    every output doc carries a pack assignment, and no pack exceeds the
    token window (oversize single docs excepted)."""
    import os

    import pyspark.sql.functions as F

    from gobblin_spark.cli import main
    from gobblin_spark.operators.text import token_count_ws

    out = os.path.join(tmp_table_dir, "curated")
    rc = main([
        "curate",
        "--input", os.path.join(sf_dir, "documents.parquet"),
        "--output", out,
        "--dedup-threshold", "0.1",
        "--sample-frac", "0.7",
        "--window-tokens", "128",
    ])
    assert rc == 0
    cur = spark.read.parquet(out)
    n_in = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")).count()
    assert 0 < cur.count() < n_in
    assert {"bucket", "pack_idx"} <= set(cur.columns)
    per_pack = (
        cur.select(token_count_ws(F.col("text")).alias("t"),
                   "bucket", "pack_idx")
        .groupBy("bucket", "pack_idx")
        .agg(F.sum("t").alias("tot"), F.count("*").alias("n"))
    )
    # multi-doc packs must fit the window; only single oversize docs may not
    bad = per_pack.filter((F.col("tot") > 128) & (F.col("n") > 1)).count()
    assert bad == 0


def test_cli_dedup_rejects_text_format(tmp_table_dir, sf_dir):
    """--format text can't hold the multi-column kept corpus: the job must
    refuse up front (rc=2), before any dedup compute or partial output."""
    import os

    from gobblin_spark.cli import main

    out = os.path.join(tmp_table_dir, "kept_bad")
    rc = main([
        "dedup",
        "--input", os.path.join(sf_dir, "documents.parquet"),
        "--output", out,
        "--format", "text",
    ])
    assert rc == 2
    assert not os.path.exists(out)


def test_cli_sharded_ingest_union_equals_full_replay(
        spark, tmp_table_dir, capsys):
    """Multi-executor deployment through the CLI: two `ingest --shard K/2`
    jobs over the same event stream, each with its own table+state, must
    together reproduce exactly the full LWW replay — no row lost, none
    duplicated, every shard's watermarks caught up. (≙ the reference
    dividing Kafka partitions among containers via work-unit packing and
    committing per-dataset states independently.)"""
    from gobblin_spark.sources.change_events import expected_final_state

    events_path = os.path.join(tmp_table_dir, "events")
    generate_change_events(
        spark, 8000, n_repos=12, paths_per_repo=80, dup_frac=0.05,
        delete_frac=0.05, ooo_window=300, n_groups=8,
    ).write.parquet(events_path)

    states = []
    for k in range(2):
        table = os.path.join(tmp_table_dir, f"table{k}")
        state = os.path.join(tmp_table_dir, f"state{k}")
        rc = main([
            "ingest", "--events", events_path, "--table", table,
            "--state", state, "--max-records-per-batch", "3000",
            "--shard", f"{k}/2",
        ])
        assert rc == 0
        out = json.loads([l for l in capsys.readouterr().out.splitlines()
                          if l.startswith("{")][-1])
        assert out["events_applied"] > 0
        states.append(read_current(LakeTable(spark, table)))

    merged = states[0].unionByName(states[1])
    want = expected_final_state(spark.read.parquet(events_path))
    got_rows = sorted(
        (r["repo"], r["path"], r["commit"]) for r in merged.collect())
    want_rows = sorted(
        (r["repo"], r["path"], r["commit"]) for r in want.collect())
    assert got_rows == want_rows

    # shards own disjoint key sets: union had no overlap
    assert merged.count() == merged.select("repo", "path").distinct().count()

    # bad shard specs fail fast
    for bad in ("2/2", "x/2", "3"):
        try:
            main(["ingest", "--events", events_path,
                  "--table", os.path.join(tmp_table_dir, "tbad"),
                  "--state", os.path.join(tmp_table_dir, "sbad"),
                  "--shard", bad])
            raise AssertionError(f"shard {bad!r} should have exited")
        except SystemExit:
            pass


def test_cli_metrics_reports_run_history(spark, tmp_table_dir, capsys):
    """`metrics` CLI: after an ingest run, the commit log yields a
    per-batch + aggregate metrics/lineage report (the read-back half of the
    reference's Instrumented emitters) without a Spark session."""
    events_path = os.path.join(tmp_table_dir, "events")
    generate_change_events(
        spark, 4000, n_repos=8, paths_per_repo=60, dup_frac=0.05,
        delete_frac=0.05, ooo_window=100,
    ).write.parquet(events_path)
    state = os.path.join(tmp_table_dir, "state")
    assert main(["ingest", "--events", events_path,
                 "--table", os.path.join(tmp_table_dir, "table"),
                 "--state", state,
                 "--max-records-per-batch", "1500"]) == 0
    capsys.readouterr()

    assert main(["metrics", "--state", state, "--per-batch"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["committed_batches"] >= 2
    assert out["pending_batches"] == []
    assert out["rows_read_total"] >= 4000  # updates + dup/delete extras
    assert out["sustained_events_per_sec"] > 0
    assert out["phase_ms_totals"]  # plan/extract/merge/commit phases present
    assert len(out["batches"]) == out["committed_batches"]
    b = out["batches"][0]
    assert b["seq_span"][0] is not None and b["seq_span"][1] > b["seq_span"][0]
    assert b["events_per_sec"] > 0 and b["n_units"] >= 1
    assert out["slowest_groups"] and all(
        "avg_ms_per_record" in g for g in out["slowest_groups"])


def test_cli_sharded_ingest_preempted_worker_resumes(
        spark, tmp_table_dir, capsys):
    """A sharded executor preempted mid-run (killed after one committed
    batch — YARN/K8s container loss in the reference's deployment) is
    simply relaunched with the same --table/--state: it resumes from its
    committed watermark, applies only the remainder, and the shard union
    still equals the full LWW replay. A further relaunch applies nothing
    (exactly-once across process restarts, per shard)."""
    from gobblin_spark.sources.change_events import expected_final_state

    def run(argv):
        rc = main(argv)
        assert rc == 0
        return json.loads([l for l in capsys.readouterr().out.splitlines()
                           if l.startswith("{")][-1])

    events_path = os.path.join(tmp_table_dir, "events")
    generate_change_events(
        spark, 8000, n_repos=12, paths_per_repo=80, dup_frac=0.05,
        delete_frac=0.05, ooo_window=300, n_groups=8,
    ).write.parquet(events_path)

    argv0 = ["ingest", "--events", events_path,
             "--table", os.path.join(tmp_table_dir, "table0"),
             "--state", os.path.join(tmp_table_dir, "state0"),
             "--max-records-per-batch", "1500", "--shard", "0/2"]
    # shard 0 preempted after one committed batch
    first = run(argv0 + ["--max-batches", "1"])
    assert first["batches"] == 1 and first["events_applied"] > 0

    # shard 1 runs to completion, unaware of shard 0's failure
    run(["ingest", "--events", events_path,
         "--table", os.path.join(tmp_table_dir, "table1"),
         "--state", os.path.join(tmp_table_dir, "state1"),
         "--max-records-per-batch", "1500", "--shard", "1/2"])

    # relaunch shard 0: resumes from the committed watermark, no re-apply
    resumed = run(argv0)
    assert resumed["batches"] >= 1
    # a third launch finds nothing left
    drained = run(argv0)
    assert drained["batches"] == 0 and drained["events_applied"] == 0

    merged = read_current(
        LakeTable(spark, os.path.join(tmp_table_dir, "table0"))
    ).unionByName(read_current(
        LakeTable(spark, os.path.join(tmp_table_dir, "table1"))))
    want = expected_final_state(spark.read.parquet(events_path))
    got_rows = sorted(
        (r["repo"], r["path"], r["commit"]) for r in merged.collect())
    want_rows = sorted(
        (r["repo"], r["path"], r["commit"]) for r in want.collect())
    assert got_rows == want_rows
    assert merged.count() == merged.select("repo", "path").distinct().count()


def test_cli_stream_drains_and_resumes(spark, tmp_table_dir, capsys):
    """`stream` CLI: availableNow drain applies everything; a re-run over
    the same checkpoint applies nothing new and leaves the version alone."""
    ev_dir = os.path.join(tmp_table_dir, "ev")
    generate_change_events(
        spark, 4000, n_repos=8, paths_per_repo=60, dup_frac=0.05,
        delete_frac=0.05, ooo_window=100,
    ).coalesce(2).write.parquet(ev_dir)
    argv = [
        "stream", "--events", ev_dir,
        "--table", os.path.join(tmp_table_dir, "t"),
        "--state", os.path.join(tmp_table_dir, "s"),
        "--checkpoint", os.path.join(tmp_table_dir, "ckpt"),
    ]
    assert main(argv) == 0
    out = json.loads([l for l in capsys.readouterr().out.splitlines()
                      if l.startswith("{")][-1])
    v1 = out["snapshot_version"]
    t = LakeTable(spark, os.path.join(tmp_table_dir, "t"))
    got = {(r["repo"], r["path"], r["commit"])
           for r in read_current(t).collect()}
    from gobblin_spark.sources.change_events import expected_final_state
    want = {(r["repo"], r["path"], r["commit"])
            for r in expected_final_state(
                spark.read.parquet(ev_dir)).collect()}
    assert got == want
    # resume over the same checkpoint: nothing to do
    assert main(argv) == 0
    out2 = json.loads([l for l in capsys.readouterr().out.splitlines()
                       if l.startswith("{")][-1])
    assert out2["snapshot_version"] == v1
