"""Named snapshot tags (≙ Iceberg tags): stable refs for time travel,
durable retention pins (expire_snapshots never drops a tagged version),
CLI surface, and object-store parameterization."""

import json

import pytest

from gobblin_spark.cli import main as cli_main
from gobblin_spark.fsio import LocalFs, ObjectStoreFs
from gobblin_spark.lakehouse import LakeTable, merge_lww
from gobblin_spark.lakehouse.merge import read_current, table_fingerprint

from tests.test_merge import KEYS, data_events, make_events


@pytest.mark.parametrize("fs_cls", [LocalFs, ObjectStoreFs])
def test_tag_pins_version_through_retention(spark, tmp_table_dir, fs_cls):
    fs = fs_cls()
    ev = make_events(spark, 2000)
    de = data_events(ev)
    import pyspark.sql.functions as F
    hi = int(de.agg(F.max("seq")).first()[0])

    t = LakeTable.create(
        spark, tmp_table_dir + "/t",
        __import__("tests.test_merge", fromlist=["TARGET_SCHEMA"])
        .TARGET_SCHEMA, KEYS, n_buckets=8, fs=fs)
    merge_lww(t, de.filter(F.col("seq") <= hi // 3), KEYS)
    t.set_tag("release-1")
    v1 = t.resolve_tag("release-1")
    fp1 = table_fingerprint(t, version=v1, algo="xxhash64")["fingerprint"]

    merge_lww(t, de.filter(
        (F.col("seq") > hi // 3) & (F.col("seq") <= 2 * hi // 3)), KEYS)
    merge_lww(t, de.filter(F.col("seq") > 2 * hi // 3), KEYS)

    # retention keeps the tagged version, expires the untagged middle one
    expired = t.expire_snapshots(keep_last=1)
    assert v1 not in expired and len(expired) > 0
    assert table_fingerprint(
        t, version=v1, algo="xxhash64")["fingerprint"] == fp1
    # vacuum keeps its files live (manifest still present)
    t.vacuum()
    assert read_current(t, version=v1).count() > 0

    # overwrite moves the pin; drop removes it; next expire collects it
    t.set_tag("release-1", t.current_version())
    assert t.resolve_tag("release-1") == t.current_version()
    t.set_tag("old", v1)
    t.drop_tag("old")
    with pytest.raises(KeyError):
        t.resolve_tag("old")
    assert v1 in t.expire_snapshots(keep_last=1)


def test_tag_validation(spark, tmp_table_dir):
    from tests.test_merge import new_table

    t = new_table(spark, tmp_table_dir + "/t")
    with pytest.raises(ValueError, match="bad tag"):
        t.set_tag("a/b")
    with pytest.raises(ValueError, match="no snapshot"):
        t.set_tag("x", 999)
    assert t.tags() == {}


def test_tag_cli_and_export_at_tag(spark, tmp_table_dir, capsys):
    from tests.test_merge import new_table

    d = tmp_table_dir
    ev = make_events(spark, 1500)
    de = data_events(ev)
    import pyspark.sql.functions as F
    hi = int(de.agg(F.max("seq")).first()[0])
    t = new_table(spark, d + "/t")
    merge_lww(t, de.filter(F.col("seq") <= hi // 2), KEYS)
    n_at_tag = read_current(t).count()

    assert cli_main(["tag", "set", "--table", d + "/t",
                     "--name", "snap-a"]) == 0
    capsys.readouterr()
    merge_lww(t, de.filter(F.col("seq") > hi // 2), KEYS)

    assert cli_main(["tag", "list", "--table", d + "/t"]) == 0
    tags = json.loads(capsys.readouterr().out.strip())
    assert "snap-a" in tags

    assert cli_main(["export", "--table", d + "/t", "--out", d + "/at_tag",
                     "--tag", "snap-a"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] == n_at_tag
    assert cli_main(["fingerprint", "--table", d + "/t",
                     "--tag", "snap-a"]) == 0
    fp = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert fp["rows"] == n_at_tag


def test_rollback_and_changes_accept_tags(spark, tmp_table_dir, capsys):
    from tests.test_merge import new_table

    d = tmp_table_dir
    ev = make_events(spark, 1500)
    de = data_events(ev)
    import pyspark.sql.functions as F
    hi = int(de.agg(F.max("seq")).first()[0])
    t = new_table(spark, d + "/t")
    merge_lww(t, de.filter(F.col("seq") <= hi // 2), KEYS)
    n_half = read_current(t).count()
    assert cli_main(["tag", "set", "--table", d + "/t",
                     "--name", "half"]) == 0
    capsys.readouterr()
    merge_lww(t, de.filter(F.col("seq") > hi // 2), KEYS)

    # changelog between the tag and current
    assert cli_main(["changes", "--table", d + "/t", "--from-tag", "half",
                     "--local-cores", "8"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["from_version"] == t.resolve_tag("half")
    assert out["total"] > 0

    # rollback to the tag restores the tagged row count
    assert cli_main(["rollback", "--table", d + "/t", "--tag", "half"]) == 0
    capsys.readouterr()
    assert read_current(LakeTable(spark, d + "/t")).count() == n_half

    # refusals: both or neither selector
    import pytest
    with pytest.raises(SystemExit):
        cli_main(["rollback", "--table", d + "/t"])
    with pytest.raises(SystemExit):
        cli_main(["changes", "--table", d + "/t", "--local-cores", "8"])
