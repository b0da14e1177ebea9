"""Content-fingerprint verification (merge.table_fingerprint + the
fingerprint/verify CLI): the replay-convergence primitive the engine's
north-star criterion names — two replays of the same stream (different
batch splits, different merge modes) must fingerprint-equal; any visible
state difference must be detected."""

import json

import pyspark.sql.functions as F

from gobblin_spark.cli import main as cli_main
from gobblin_spark.engine import CdcEngine
from gobblin_spark.lakehouse import LakeTable
from gobblin_spark.lakehouse.merge import merge_lww, table_fingerprint
from gobblin_spark.sources import generate_change_events

KEYS = ["repo", "path"]


def _events(spark, d, n=2500):
    generate_change_events(
        spark, n, n_repos=10, paths_per_repo=40,
        dup_frac=0.05, delete_frac=0.08, ooo_window=120,
    ).write.parquet(d + "/events")
    return spark.read.parquet(d + "/events")


def _replay(spark, ev, root, state, mode, cuts):
    prev = 0
    for cut in cuts:
        eng = CdcEngine(
            spark, ev.filter(F.col("seq") <= cut), root, state,
            max_records_per_batch=100000, n_buckets=8,
            merge_mode=mode, compact_every=2,
        )
        eng.run_until_caught_up()
        prev = cut
    return LakeTable(spark, root)


def test_convergent_replays_fingerprint_equal(spark, tmp_table_dir):
    d = tmp_table_dir
    ev = _events(spark, d)
    hi = int(ev.agg(F.max("seq")).first()[0])

    a = _replay(spark, ev, d + "/ta", d + "/sa", "cow", [hi // 2, hi])
    b = _replay(spark, ev, d + "/tb", d + "/sb", "mor",
                [hi // 4, 3 * hi // 4, hi])

    for algo in ("sha256", "xxhash64"):
        fa = table_fingerprint(a, algo=algo)
        fb = table_fingerprint(b, algo=algo)
        assert fa["rows"] == fb["rows"] > 0
        assert fa["fingerprint"] == fb["fingerprint"]
        assert fa["columns"] == fb["columns"]


def test_fingerprint_detects_divergence(spark, tmp_table_dir):
    d = tmp_table_dir
    ev = _events(spark, d)
    hi = int(ev.agg(F.max("seq")).first()[0])
    a = _replay(spark, ev, d + "/ta", d + "/sa", "cow", [hi])
    b = _replay(spark, ev, d + "/tb", d + "/sb", "cow", [hi])

    fa = table_fingerprint(a)
    assert fa["fingerprint"] == table_fingerprint(b)["fingerprint"]

    # mutate ONE key's state in b: a late upsert with a fresh max seq
    one = ev.filter(F.col("op") != "D").limit(1).select(*KEYS).first()
    patch = (ev.limit(1)
             .withColumn("seq", F.lit(hi + 1000))
             .withColumn("op", F.lit("U"))
             .withColumn("repo", F.lit(one["repo"]))
             .withColumn("path", F.lit(one["path"]))
             .withColumn("commit", F.lit("divergent")))
    merge_lww(b, patch, KEYS)
    fb2 = table_fingerprint(b)
    assert fb2["fingerprint"] != fa["fingerprint"]
    assert fb2["rows"] == fa["rows"]  # same cardinality, different content


def test_fingerprint_is_version_pinned(spark, tmp_table_dir):
    d = tmp_table_dir
    ev = _events(spark, d)
    hi = int(ev.agg(F.max("seq")).first()[0])
    t = _replay(spark, ev, d + "/t", d + "/s", "cow", [hi // 2])
    v1 = t.current_version()
    f1 = table_fingerprint(t, version=v1)
    _replay(spark, ev, d + "/t", d + "/s", "cow", [hi])
    # historical fingerprint unchanged by later commits
    f1b = table_fingerprint(t, version=v1)
    assert f1b["fingerprint"] == f1["fingerprint"]
    assert table_fingerprint(t)["fingerprint"] != f1["fingerprint"]


def test_cli_fingerprint_and_verify(spark, tmp_table_dir, capsys):
    d = tmp_table_dir
    ev = _events(spark, d)
    hi = int(ev.agg(F.max("seq")).first()[0])
    _replay(spark, ev, d + "/ta", d + "/sa", "cow", [hi])
    _replay(spark, ev, d + "/tb", d + "/sb", "mor", [hi // 2, hi])

    assert cli_main(["fingerprint", "--table", d + "/ta"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] > 0 and out["algo"] == "sha256"

    assert cli_main(
        ["verify", "--table", d + "/ta", "--other", d + "/tb"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["match"] is True

    # divergence → exit code 2
    one = ev.filter(F.col("op") != "D").limit(1)
    merge_lww(LakeTable(spark, d + "/tb"),
              one.withColumn("seq", F.lit(hi + 999))
                 .withColumn("op", F.lit("U"))
                 .withColumn("commit", F.lit("divergent")),
              KEYS)
    assert cli_main(
        ["verify", "--table", d + "/ta", "--other", d + "/tb"]) == 2
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["match"] is False


def test_fingerprint_canonical_rendering_is_injective(spark, tmp_table_dir):
    """Adversarial rows that collide under a separator-joined rendering
    (value containing the separator shifts field boundaries; a literal
    NULL-sentinel string collides with NULL) must fingerprint DIFFERENTLY:
    the per-column fixed-length-digest encoding is injective over the row
    tuple."""
    from pyspark.sql.types import (
        BooleanType, LongType, StringType, StructField, StructType,
    )

    schema = StructType([
        StructField("k", StringType()),
        StructField("a", StringType()),
        StructField("b", StringType()),
        StructField("__seq", LongType()),
        StructField("__deleted", BooleanType()),
    ])
    batch_schema = StructType([
        StructField("seq", LongType()),
        StructField("op", StringType()),
        StructField("k", StringType()),
        StructField("a", StringType()),
        StructField("b", StringType()),
    ])

    def table_with(root, a, b):
        t = LakeTable.create(spark, root, schema, ["k"], n_buckets=2)
        merge_lww(t, spark.createDataFrame([(1, "U", "k1", a, b)],
                                           batch_schema), ["k"])
        return t

    # boundary-shift pair: ('a\x1fb','c') vs ('a','b\x1fc')
    t1 = table_with(tmp_table_dir + "/t1", "a\x1fb", "c")
    t2 = table_with(tmp_table_dir + "/t2", "a", "b\x1fc")
    assert (table_fingerprint(t1)["fingerprint"]
            != table_fingerprint(t2)["fingerprint"])

    # literal sentinel vs real NULL
    t3 = table_with(tmp_table_dir + "/t3", "\x00NULL", "x")
    t4 = table_with(tmp_table_dir + "/t4", None, "x")
    assert (table_fingerprint(t3)["fingerprint"]
            != table_fingerprint(t4)["fingerprint"])
    # and empty string vs NULL
    t5 = table_with(tmp_table_dir + "/t5", "", "x")
    assert (table_fingerprint(t5)["fingerprint"]
            != table_fingerprint(t4)["fingerprint"])
