"""Multi-table catalog: named-table registry behind CommitFs (≙ the
reference registering published datasets in the Hive metastore —
HiveRegistrationPublisher.java:56 / StunlockPartitionedHiveDataPublisher
.java:297-317 — so consumers address tables by NAME, not path)."""

import json
import os
import threading

import pyspark.sql.functions as F
import pytest

from gobblin_spark.catalog import Catalog, CatalogError
from gobblin_spark.fsio import LocalFs, ObjectStoreFs
from gobblin_spark.lakehouse import LakeTable
from gobblin_spark.lakehouse.merge import read_current
from gobblin_spark.sources import generate_change_events


@pytest.fixture(params=["local", "objectstore"])
def commit_fs(request):
    return LocalFs() if request.param == "local" else ObjectStoreFs()


def test_catalog_crud(tmp_table_dir, commit_fs):
    cat = Catalog(os.path.join(tmp_table_dir, "cat"), fs=commit_fs)
    assert cat.list() == []
    e = cat.register("events_cdc", "/lake/t", state_root="/lake/s",
                     properties={"owner": "data-eng"})
    assert cat.get("events_cdc").table_root == "/lake/t"
    assert cat.get("events_cdc").properties == {"owner": "data-eng"}

    # create is exactly-once: re-register without overwrite refuses
    with pytest.raises(CatalogError, match="already registered"):
        cat.register("events_cdc", "/lake/other")
    # overwrite replaces locations but keeps created_ms
    created = cat.get("events_cdc").created_ms
    e2 = cat.register("events_cdc", "/lake/t2", overwrite=True)
    assert e2.table_root == "/lake/t2" and e2.created_ms == created

    cat.register("docs", "/lake/docs")
    assert [x.name for x in cat.list()] == ["docs", "events_cdc"]

    cat.update_properties("docs", {"tier": "gold"})
    assert cat.get("docs").properties["tier"] == "gold"

    cat.drop("docs")
    assert [x.name for x in cat.list()] == ["events_cdc"]
    with pytest.raises(CatalogError, match="no table named"):
        cat.get("docs")
    with pytest.raises(CatalogError, match="no table named"):
        cat.drop("docs")
    with pytest.raises(CatalogError, match="invalid table name"):
        cat.register("../evil", "/lake/x")
    assert e.name == "events_cdc"


def test_catalog_concurrent_register_one_winner(tmp_table_dir, commit_fs):
    cat = Catalog(os.path.join(tmp_table_dir, "cat"), fs=commit_fs)
    wins, losses = [], []
    barrier = threading.Barrier(8)

    def attempt(i):
        barrier.wait()
        try:
            cat.register("t", f"/lake/w{i}")
            wins.append(i)
        except CatalogError:
            losses.append(i)

    threads = [threading.Thread(target=attempt, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(wins) == 1 and len(losses) == 7
    assert cat.get("t").table_root == f"/lake/w{wins[0]}"


def test_catalog_cli_named_table_e2e(spark, tmp_table_dir, capsys):
    """The ergonomics the catalog exists for: ingest --register-as, then
    every follow-up job addresses the table by NAME — compact, status,
    history, changes — and describe joins the live manifest."""
    from gobblin_spark.cli import main

    d = tmp_table_dir
    cat_root = os.path.join(d, "catalog")
    generate_change_events(
        spark, 2000, n_repos=10, paths_per_repo=40,
        dup_frac=0.05, delete_frac=0.05, ooo_window=100,
    ).write.parquet(d + "/events")

    def run(argv):
        rc = main(argv)
        assert rc == 0
        out = capsys.readouterr().out
        try:  # some commands (status) pretty-print one multi-line doc
            return json.loads(out)
        except json.JSONDecodeError:
            return json.loads([l for l in out.splitlines()
                               if l.startswith("{") or l.startswith("[")][-1])

    # publish-time registration (≙ HiveRegistrationPublisher)
    res = run(["ingest", "--events", d + "/events", "--table", d + "/t",
               "--state", d + "/s", "--merge-mode", "mor",
               "--max-records-per-batch", "600",
               "--catalog", cat_root, "--register-as", "commits"])
    assert res["batches"] >= 2

    listed = run(["catalog", "list", "--catalog", cat_root])
    assert [e["name"] for e in listed] == ["commits"]
    desc = run(["catalog", "describe", "--catalog", cat_root,
                "--name", "commits"])
    assert desc["table_root"] == d + "/t"
    assert desc["table"]["merge_keys"] == ["repo", "path"]
    assert desc["table"]["rows"] > 0

    # jobs resolve the name: state root comes from the catalog entry
    st = run(["status", "--catalog", cat_root, "--table", "commits"])
    assert st["committed_batches"] >= 2

    # add fresh deltas, then compact BY NAME
    from gobblin_spark.lakehouse.merge import merge_lww_mor
    ev = spark.read.parquet(d + "/events")
    data = ev.filter(F.col("op").isin("I", "U", "D")).drop("version")
    t = LakeTable(spark, d + "/t")
    merge_lww_mor(t, data.filter(F.col("seq") > 1500), ["repo", "path"],
                  seq_col="seq")
    v_before = LakeTable(spark, d + "/t").current_version()
    cp = run(["compact", "--catalog", cat_root, "--table", "commits"])
    assert cp["snapshot_version"] > v_before
    t = LakeTable(spark, d + "/t")
    assert int(t.snapshot().properties.get("mor_deltas", 0)) == 0

    hist = run(["history", "--catalog", cat_root, "--table", "commits"])
    assert hist[-1]["version"] == cp["snapshot_version"]
    ch = run(["changes", "--catalog", cat_root, "--table", "commits",
              "--from-version", "1"])
    assert ch["total"] > 0

    # visible state unharmed by all the name indirection
    got = {(r["repo"], r["path"]) for r in read_current(t).collect()}
    assert len(got) == read_current(t).count()

    run(["catalog", "drop", "--catalog", cat_root, "--name", "commits"])
    assert run(["catalog", "list", "--catalog", cat_root]) == []
