"""File-diff source e2e (≙ FileBasedSourceTest semantics: previous-run
snapshot diff, modified-file re-pull, work-unit packing)."""

import os
import time

import pyspark.sql.functions as F

from gobblin_spark.sources.filebased import FileDiffSource


def _drop_file(spark, path, lo, hi):
    spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    ).coalesce(1).write.mode("overwrite").parquet(path)


def test_three_run_incremental_ingest(spark, tmp_table_dir):
    """Drop files across 3 runs; each run must read ONLY its delta (checked
    via lineage), and the accumulated target must equal reading the whole
    directory at the end."""
    data = os.path.join(tmp_table_dir, "incoming")
    target = os.path.join(tmp_table_dir, "target")
    src = FileDiffSource(os.path.join(tmp_table_dir, "state"),
                         pattern="*.parquet", max_partitions=4)

    # run 1: two files
    _drop_file(spark, os.path.join(data, "a"), 0, 100)
    _drop_file(spark, os.path.join(data, "b"), 100, 200)
    p1 = src.plan(data)
    assert len(p1.files_to_pull) == 2
    src.read(spark, p1).write.mode("append").parquet(target)
    src.commit(p1)

    # run 2: one new file — ONLY it may be planned
    _drop_file(spark, os.path.join(data, "c"), 200, 250)
    p2 = src.plan(data)
    assert len(p2.files_to_pull) == 1
    assert all("/c/" in f for f in p2.files_to_pull)
    src.read(spark, p2).write.mode("append").parquet(target)
    src.commit(p2)

    # run 3: nothing changed → empty plan
    p3 = src.plan(data)
    assert p3.empty

    # lineage: every committed run recorded exactly the files it pulled
    lin = src.lineage()
    assert len(lin) == 2
    assert len(lin[0]["files_pulled"]) == 2
    assert len(lin[1]["files_pulled"]) == 1

    got = spark.read.parquet(target)
    want = spark.read.parquet(data + "/a", data + "/b", data + "/c")
    assert got.count() == 250
    assert (got.exceptAll(want).count() == 0
            and want.exceptAll(got).count() == 0)


def test_modified_file_is_repulled(spark, tmp_table_dir):
    """mtime change re-pulls a file (snapshot entries are path|mtime, so a
    rewrite is 'new' — ≙ the reference pulling files whose snapshot entry
    changed)."""
    data = os.path.join(tmp_table_dir, "incoming")
    src = FileDiffSource(os.path.join(tmp_table_dir, "state"),
                         pattern="*.parquet")
    _drop_file(spark, os.path.join(data, "a"), 0, 10)
    p1 = src.plan(data)
    src.commit(p1)

    time.sleep(0.02)
    _drop_file(spark, os.path.join(data, "a"), 0, 20)  # overwrite in place
    p2 = src.plan(data)
    assert len(p2.files_to_pull) >= 1  # the rewritten file comes back
    assert src.read(spark, p2).count() == 20


def test_crash_before_commit_replans_same_delta(spark, tmp_table_dir):
    data = os.path.join(tmp_table_dir, "incoming")
    src = FileDiffSource(os.path.join(tmp_table_dir, "state"),
                         pattern="*.parquet")
    _drop_file(spark, os.path.join(data, "a"), 0, 10)
    p1 = src.plan(data)
    # crash: no commit. replanning yields the identical delta.
    p1b = src.plan(data)
    assert p1b.files_to_pull == p1.files_to_pull


def test_work_unit_packing(spark, tmp_table_dir):
    data = os.path.join(tmp_table_dir, "incoming")
    src = FileDiffSource(os.path.join(tmp_table_dir, "state"),
                         pattern="*.parquet", max_partitions=3)
    for i in range(7):
        _drop_file(spark, os.path.join(data, f"f{i}"), i * 10, i * 10 + 10)
    p = src.plan(data)
    assert len(p.files_to_pull) == 7
    # ceil(7/3)=3 per unit → 3 units (≙ filesPerPartition rounding)
    assert len(p.work_units) == 3
    assert sum(len(u) for u in p.work_units) == 7


def test_text_and_json_formats(spark, tmp_table_dir):
    """Non-parquet extract formats (≙ the reference's text/Avro file
    sources, gobblin-core TextFileBasedSource / hadoop text extractors):
    the same snapshot-diff plan reads jsonl and raw text lines."""
    import json as _json

    data = os.path.join(tmp_table_dir, "incoming")
    os.makedirs(data, exist_ok=True)
    with open(os.path.join(data, "a.jsonl"), "w") as fh:
        for i in range(5):
            fh.write(_json.dumps({"id": i, "v": i * 2}) + "\n")
    src = FileDiffSource(os.path.join(tmp_table_dir, "state_j"),
                         pattern="*.jsonl")
    p = src.plan(data)
    df = src.read(spark, p, fmt="json")
    assert sorted(r["v"] for r in df.collect()) == [0, 2, 4, 6, 8]
    src.commit(p)
    assert src.plan(data).empty

    with open(os.path.join(data, "b.log"), "w") as fh:
        fh.write("line one\nline two\n")
    src_t = FileDiffSource(os.path.join(tmp_table_dir, "state_t"),
                           pattern="*.log")
    pt = src_t.plan(data)
    lines = src_t.read(spark, pt, fmt="text")
    assert {r["value"] for r in lines.collect()} == {"line one", "line two"}


def test_file_diff_source_text_csv_json_formats(spark, tmp_table_dir):
    """≙ the reference's Avro/Hadoop-text file sources: the snapshot-diff
    source must ingest non-parquet formats through the same plan/read/commit
    protocol. Text lines, headered CSV, and JSON-lines each round-trip."""
    import json as _json

    from gobblin_spark.sinks import text_lines, write_files

    base = os.path.join(tmp_table_dir, "multi")
    # text: one file of raw lines
    txt_dir = os.path.join(base, "t1")
    write_files(
        text_lines(
            spark.range(0, 5).selectExpr("concat('line-', id) AS s"), "s"
        ),
        txt_dir, fmt="text",
    )
    src_txt = FileDiffSource(os.path.join(tmp_table_dir, "st_txt"),
                             pattern="*.txt")
    p = src_txt.plan(base)
    got = {r["value"] for r in src_txt.read(spark, p, fmt="text").collect()}
    assert got == {f"line-{i}" for i in range(5)}
    src_txt.commit(p)
    assert src_txt.plan(base).empty  # no new files → empty delta

    # csv with header, via the staged csv sink
    csv_base = os.path.join(tmp_table_dir, "csvsrc")
    write_files(
        spark.range(0, 4).selectExpr("id", "id * 3 AS v"),
        os.path.join(csv_base, "c1"), fmt="csv",
        options={"header": "true"},
    )
    src_csv = FileDiffSource(os.path.join(tmp_table_dir, "st_csv"),
                             pattern="*.csv")
    pc = src_csv.plan(csv_base)
    df = spark.read.option("header", "true").option(
        "inferSchema", "true").csv(pc.files_to_pull)
    assert {(r["id"], r["v"]) for r in df.collect()} == {
        (i, i * 3) for i in range(4)
    }

    # json lines
    js_base = os.path.join(tmp_table_dir, "jssrc")
    write_files(
        spark.range(0, 3).selectExpr("id", "concat('n', id) AS name"),
        os.path.join(js_base, "j1"), fmt="json",
    )
    src_js = FileDiffSource(os.path.join(tmp_table_dir, "st_js"),
                            pattern="*.json")
    pj = src_js.plan(js_base)
    rows = {
        (r["id"], r["name"])
        for r in src_js.read(spark, pj, fmt="json").collect()
    }
    assert rows == {(0, "n0"), (1, "n1"), (2, "n2")}


def test_file_diff_source_over_object_store(spark, tmp_table_dir):
    """The whole plan→read→commit→re-plan loop through ObjectStoreFs: no
    POSIX walk/getmtime/replace anywhere in the source's metadata path, so
    it runs unchanged against a conditional-PUT object store."""
    from gobblin_spark.fsio import CommitConflict, ObjectStoreFs

    data = os.path.join(tmp_table_dir, "incoming")
    src = FileDiffSource(os.path.join(tmp_table_dir, "state"),
                         pattern="*.parquet", max_partitions=4,
                         fs=ObjectStoreFs())
    _drop_file(spark, os.path.join(data, "a"), 0, 100)
    p1 = src.plan(data)
    assert len(p1.files_to_pull) == 1
    assert src.read(spark, p1).count() == 100
    src.commit(p1)

    # delta-only re-plan
    _drop_file(spark, os.path.join(data, "b"), 100, 150)
    p2 = src.plan(data)
    assert len(p2.files_to_pull) == 1 and "/b/" in p2.files_to_pull[0]
    src.commit(p2)
    assert src.plan(data).empty
    assert len(src.lineage()) == 2

    # racing planners: both plan against the same snapshot state, one
    # commits first — the loser's commit must fail loudly (its diff is
    # stale), not silently clobber the winner's snapshot
    import pytest

    twin = FileDiffSource(os.path.join(tmp_table_dir, "state"),
                          pattern="*.parquet", fs=ObjectStoreFs())
    pa = src.plan(data)
    pb = twin.plan(data)
    src.commit(pa)
    with pytest.raises(CommitConflict):
        twin.commit(pb)
