"""Targeted deletion (merge.delete_where + delete/purge CLI): DELETE FROM
t WHERE col=v as tombstones through the normal LWW apply — crash-safe,
changelog-visible, LWW-consistent with later events — and the purge
pipeline that completes PHYSICAL erasure (no retained manifest or data
file holds the deleted rows)."""

import json
import os

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from gobblin_spark.cli import main as cli_main
from gobblin_spark.lakehouse import LakeTable, merge_lww
from gobblin_spark.lakehouse.merge import (
    delete_where,
    merge_lww_mor,
    read_current,
    table_changes,
)

SCHEMA = StructType([
    StructField("repo", StringType()),
    StructField("path", StringType()),
    StructField("commit", StringType()),
    StructField("lang", StringType()),
    StructField("__seq", LongType()),
    StructField("__deleted", BooleanType()),
])
KEYS = ["repo", "path"]
COLS = ["seq", "op", "repo", "path", "commit", "lang"]


def _batch(spark, rows):
    return spark.createDataFrame(rows, COLS)


def _rows(n, lang="python", start=0):
    return [(start + i, "U", f"r{i % 6}", f"p{start + i}", f"c{i}", lang)
            for i in range(n)]


def _new(spark, root, **kw):
    kw.setdefault("stats_cols", ["lang"])
    return LakeTable.create(spark, root, SCHEMA, KEYS, n_buckets=8, **kw)


def test_delete_where_tombstones_matching_keys(spark, tmp_table_dir):
    t = _new(spark, tmp_table_dir + "/t")
    merge_lww(t, _batch(spark, _rows(60, "python")
                        + _rows(20, "go", start=1000)), KEYS)
    v0 = t.current_version()

    res = delete_where(t, {"lang": "go"})
    assert res["deleted"] == 20
    left = read_current(t)
    assert left.count() == 60
    assert left.filter(F.col("lang") == "go").count() == 0

    # changelog-visible: downstream consumers see 'delete' rows
    ch = table_changes(t, v0)
    assert ch.filter(F.col("_change_type") == "delete").count() == 20

    # tombstones must NOT retain the deleted payload
    snap = t.snapshot()
    stored = t.read()
    dead = stored.filter(F.col("__deleted"))
    assert dead.count() == 20
    assert dead.filter(F.col("commit").isNotNull()).count() == 0
    assert dead.filter(F.col("lang").isNotNull()).count() == 0
    assert snap.properties["delete_where"] == {"lang": "go"}

    # idempotent-ish: re-delete matches nothing
    assert delete_where(t, {"lang": "go"})["deleted"] == 0


def test_delete_lww_interplay_with_later_events(spark, tmp_table_dir):
    t = _new(spark, tmp_table_dir + "/t")
    merge_lww(t, _batch(spark, _rows(10, "go")), KEYS)
    res = delete_where(t, {"lang": "go"})
    # a LATER event recreates its key (Iceberg-DELETE semantics) ...
    merge_lww(t, _batch(
        spark, [(res["seq"] + 5, "U", "r0", "p0", "cnew", "go")]), KEYS)
    # ... an EARLIER (late-arriving) event loses to the tombstone
    merge_lww(t, _batch(
        spark, [(0, "U", "r1", "p1", "cold", "go")]), KEYS)
    got = {(r["repo"], r["path"]): r["commit"]
           for r in read_current(t).collect()}
    assert got == {("r0", "p0"): "cnew"}


def test_delete_on_mor_table_with_unfolded_deltas(spark, tmp_table_dir):
    t = _new(spark, tmp_table_dir + "/t")
    merge_lww_mor(t, _batch(spark, _rows(40, "python")), KEYS)
    merge_lww_mor(t, _batch(spark, _rows(15, "go", start=500)), KEYS)
    res = delete_where(t, {"lang": "go"})
    assert res["deleted"] == 15
    assert read_current(t).filter(F.col("lang") == "go").count() == 0
    assert read_current(t).count() == 40


def test_purge_cli_erases_physically(spark, tmp_table_dir):
    d = tmp_table_dir
    t = _new(spark, d + "/t")
    merge_lww(t, _batch(spark, _rows(50, "python")
                        + _rows(12, "secret", start=2000)), KEYS)

    assert cli_main(["purge", "--table", d + "/t",
                     "--where", "lang=secret"]) == 0

    # live state clean
    t2 = LakeTable(spark, d + "/t")
    cur = read_current(t2)
    assert cur.count() == 50
    assert cur.filter(F.col("lang") == "secret").count() == 0
    # only the current snapshot remains, and NO retained manifest or data
    # file on disk contains the deleted payload
    assert len(t2.history()) == 1
    stored = t2.read()
    assert stored.filter(F.col("lang") == "secret").count() == 0
    assert stored.filter(F.col("__deleted")).count() == 0  # GC'd
    data_root = os.path.join(d, "t", "data")
    whole = (spark.read.option("recursiveFileLookup", "true")
             .parquet(data_root))
    assert whole.filter(F.col("lang") == "secret").count() == 0


def test_delete_cli_dry_run_and_apply(spark, tmp_table_dir, capsys):
    d = tmp_table_dir
    t = _new(spark, d + "/t")
    merge_lww(t, _batch(spark, _rows(30, "python")
                        + _rows(5, "go", start=900)), KEYS)
    assert cli_main(["delete", "--table", d + "/t", "--where", "lang=go",
                     "--dry-run"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["would_delete"] == 5 and out["deleted"] == 0
    assert read_current(t).count() == 35  # dry run wrote nothing

    assert cli_main(["delete", "--table", d + "/t",
                     "--where", "lang=go"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["deleted"] == 5
    assert read_current(t).count() == 30


def test_purge_reports_tag_pinned_snapshots_blocking_erasure(
        spark, tmp_table_dir, capsys):
    """A tag on a PRE-deletion snapshot pins it through expire/vacuum, so
    the deleted payload survives on disk — purge must report the blocking
    tags and exit 2 instead of printing unconditional success
    (compliance-sensitive: right-to-be-forgotten must not silently fail).
    --drop-blocking-tags completes erasure in one step."""
    d = tmp_table_dir
    t = _new(spark, d + "/t")
    merge_lww(t, _batch(spark, _rows(20, "python")
                        + _rows(6, "secret", start=2000)), KEYS)
    t.set_tag("audit")  # durable retention pin on the pre-deletion state

    rc = cli_main(["purge", "--table", d + "/t", "--where", "lang=secret"])
    assert rc == 2
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["erasure_complete"] is False
    assert list(out["pinned_snapshots_blocking_erasure"]) == ["audit"]
    # the pinned snapshot's files indeed still hold the payload (the
    # condition the old code reported success over)
    whole = (spark.read.option("recursiveFileLookup", "true")
             .parquet(os.path.join(d, "t", "data")))
    assert whole.filter(F.col("lang") == "secret").count() > 0

    rc = cli_main(["purge", "--table", d + "/t", "--where", "lang=secret",
                   "--drop-blocking-tags"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["erasure_complete"] is True
    assert out["pinned_snapshots_blocking_erasure"] == {}
    whole = (spark.read.option("recursiveFileLookup", "true")
             .parquet(os.path.join(d, "t", "data")))
    assert whole.filter(F.col("lang") == "secret").count() == 0
    assert "audit" not in LakeTable(spark, d + "/t").tags()


def test_delete_where_date_column_string_probe(spark, tmp_table_dir):
    """CLI probes arrive as strings; on a DATE column the probe must parse
    (ISO) and match rows — and an unparseable probe must RAISE, never
    silently delete 0 rows and report success."""
    from pyspark.sql.types import DateType

    schema = StructType([
        StructField("k", StringType()),
        StructField("day", DateType()),
        StructField("__seq", LongType()),
        StructField("__deleted", BooleanType()),
    ])
    t = LakeTable.create(spark, tmp_table_dir + "/t", schema, ["k"],
                         n_buckets=4)
    rows = [(i, "U", f"k{i}", f"2024-01-0{1 + i % 3}") for i in range(12)]
    batch = (spark.createDataFrame(rows, ["seq", "op", "k", "day"])
             .withColumn("day", F.to_date("day")))
    merge_lww(t, batch, ["k"])

    res = delete_where(t, {"day": "2024-01-02"})
    assert res["deleted"] == 4
    assert read_current(t).count() == 8

    with pytest.raises(ValueError, match="not parseable"):
        delete_where(t, {"day": "not-a-date"})
    assert read_current(t).count() == 8  # nothing written


def test_delete_where_range_predicate(spark, tmp_table_dir):
    """DELETE WHERE col >= v: victims discovered via the per-file
    [min,max] value-bounds pruning; LWW/tombstone semantics unchanged."""
    from gobblin_spark.cli import main as cli

    t = _new(spark, tmp_table_dir + "/t")
    rows = [(i, "U", f"r{i}", f"p{i}", "c1", lang)
            for i, lang in enumerate(["ada", "go", "rust", "zig"] * 10)]
    merge_lww(t, _batch(spark, rows), KEYS)

    # dry-run first: range clause through the CLI parser
    rc = cli(["delete", "--table", tmp_table_dir + "/t",
              "--where", "lang>=rust", "--dry-run", "--local-cores", "4"])
    assert rc == 0

    res = delete_where(t, range_predicate={
        "lang": {"lo": "rust", "hi": None,
                 "lo_strict": False, "hi_strict": False}})
    assert res["deleted"] == 20  # rust + zig
    left = read_current(t).select("lang").distinct().collect()
    assert sorted(r["lang"] for r in left) == ["ada", "go"]

    # equality + range AND-compose
    res2 = delete_where(t, {"lang": "go"}, range_predicate={
        "path": {"lo": "p0", "hi": "p2",
                 "lo_strict": False, "hi_strict": True}})
    gone = {f"p{i}" for i in range(40)
            if ["ada", "go", "rust", "zig"][i % 4] == "go"
            and "p0" <= f"p{i}" < "p2"}
    assert res2["deleted"] == len(gone) > 0
    assert read_current(t).filter(
        F.col("path").isin(list(gone))).count() == 0

    # no predicate at all is refused, never a silent full-table delete
    with pytest.raises(ValueError, match="needs a predicate"):
        delete_where(t)
