"""Driver-side point lookup (pointread.py): the ms-latency primary-key
read. Two contracts: (1) the Python xxhash64 port is BIT-EXACT against
Spark's expression (the bucket routing depends on it); (2) the local read
returns exactly what the distributed point_lookup returns — live, deleted,
missing keys, across COW and unfolded-MOR tables — and falls back rather
than guessing for dialects/layouts it doesn't handle."""

import random
import string
import time

import pyspark.sql.functions as F

from gobblin_spark.lakehouse import LakeTable
from gobblin_spark.lakehouse.merge import (
    merge_lww,
    merge_lww_mor,
    point_lookup,
    read_current,
)
from gobblin_spark.lakehouse.pointread import (
    FALLBACK,
    bucket_of,
    point_lookup_local,
    xxhash64,
)

from tests.test_merge import (
    KEYS,
    data_events,
    make_events,
    new_table,
)


def test_xxhash64_parity_with_spark(spark):
    """Random strings (incl. unicode + empty), ints, longs, null chaining:
    the Python port must produce Spark's exact signed 64-bit values —
    lengths cross every XXH64 stripe boundary (0, <4, <8, <32, >=32)."""
    random.seed(11)
    rows = []
    for n in [0, 1, 3, 4, 7, 8, 31, 32, 33, 100]:
        rows.append(("".join(random.choices(string.printable, k=n)),
                     "αβγ日本語🙂"[: n % 7],
                     random.randint(-2**31, 2**31 - 1),
                     random.randint(-2**63, 2**63 - 1)))
    for _ in range(60):
        rows.append(
            ("".join(random.choices(string.printable,
                                    k=random.randint(0, 80))),
             "".join(random.choices("abc/._-日本語", k=random.randint(0, 40))),
             random.randint(-2**31, 2**31 - 1),
             random.randint(-2**63, 2**63 - 1)))
    df = spark.createDataFrame(rows, "s string, t string, i int, l long")
    got = df.select(
        F.xxhash64("s").alias("hs"),
        F.xxhash64("s", "t").alias("hst"),
        F.xxhash64("i").alias("hi"),
        F.xxhash64("l").alias("hl"),
        F.xxhash64("s", "t", "i", "l").alias("hall"),
    ).collect()
    for (s, t, i, l), r in zip(rows, got):
        assert xxhash64([s]) == r["hs"]
        assert xxhash64([s, t]) == r["hst"]
        assert xxhash64([i], int_sizes=[32]) == r["hi"]
        assert xxhash64([l]) == r["hl"]
        assert xxhash64([s, t, i, l],
                        int_sizes=[64, 64, 32, 64]) == r["hall"]
    h = df.select(F.xxhash64(F.lit(None).cast("string"),
                             F.lit("x")).alias("h")).first()["h"]
    assert xxhash64([None, "x"]) == h


def test_bucket_of_matches_buckets_of(spark, tmp_table_dir):
    ev = make_events(spark, 400)
    t = new_table(spark, tmp_table_dir + "/t")
    merge_lww(t, data_events(ev), KEYS)
    snap = t.snapshot()
    keys = [(r["repo"], r["path"]) for r in
            data_events(ev).select(*KEYS).distinct().limit(20).collect()]
    for repo, path in keys:
        one = spark.createDataFrame([(repo, path)], KEYS)
        want = next(iter(t.buckets_of(one)))
        assert bucket_of([repo, path], snap.n_buckets) == want


def _parity(spark, t, keys_live, keys_deleted):
    want = {(r["repo"], r["path"]): r["commit"]
            for r in read_current(t).collect()}
    for k in keys_live:
        local = point_lookup_local(t, {"repo": k[0], "path": k[1]})
        assert local is not FALLBACK and local is not None
        assert local["commit"] == want[k]
        spark_rows = point_lookup(
            t, {"repo": k[0], "path": k[1]}, prefer_local=False).collect()
        assert len(spark_rows) == 1
        assert {c: spark_rows[0][c] for c in local} == local
    for k in keys_deleted:
        assert point_lookup_local(t, {"repo": k[0], "path": k[1]}) is None
    assert point_lookup_local(t, {"repo": "no_such", "path": "x"}) is None


def test_local_lookup_parity_cow_and_mor(spark, tmp_table_dir):
    ev = make_events(spark, 2500)
    d = data_events(ev)

    cow = new_table(spark, tmp_table_dir + "/cow")
    merge_lww(cow, d, KEYS)
    mor = new_table(spark, tmp_table_dir + "/mor")
    for i in range(4):  # several unfolded delta batches
        merge_lww_mor(mor, d.filter(F.pmod(F.col("seq"), F.lit(4)) == i),
                      KEYS, seq_col="seq")

    live = {(r["repo"], r["path"]) for r in read_current(cow).collect()}
    seen = {(r["repo"], r["path"])
            for r in d.select(*KEYS).distinct().collect()}
    deleted = sorted(seen - live)[:3]
    probe = sorted(live)[:5]
    _parity(spark, cow, probe, deleted)
    _parity(spark, mor, probe, deleted)

    # and through the public API: point_lookup uses the local path by
    # default and returns an identical DataFrame
    k = probe[0]
    a = point_lookup(cow, {"repo": k[0], "path": k[1]}).collect()
    b = point_lookup(cow, {"repo": k[0], "path": k[1]},
                     prefer_local=False).collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]


def test_local_lookup_parity_patch_and_cell_dialects(spark, tmp_table_dir):
    """The 'column' and 'cell' dialects fold locally too: partial updates
    (null = unchanged), per-column write seqs, pre-delete cell exclusion —
    each probe must equal the distributed path exactly."""
    rows = [
        # key a: partial updates — b set at seq 2, a updated at seq 3
        (1, "I", "r", "a", "a1", "b1"),
        (2, "U", "r", "a", None, "b2"),
        (3, "U", "r", "a", "a3", None),
        # key b: delete at 5 supersedes; late pre-delete patch at 4 must
        # NOT resurface column state under 'cell'
        (1, "I", "r", "b", "x1", "y1"),
        (5, "D", "r", "b", None, None),
        (4, "U", "r", "b", "x4", None),
        # key c: live after delete
        (2, "D", "r", "c", None, None),
        (6, "U", "r", "c", "c6", None),
    ]
    for dialect in ("column", "cell"):
        batch = spark.createDataFrame(
            rows, ["seq", "op", "repo", "path", "ca", "cb"])
        from pyspark.sql.types import (
            BooleanType, LongType, StringType, StructField, StructType,
        )
        fields = [
            StructField("repo", StringType()),
            StructField("path", StringType()),
            StructField("ca", StringType()),
            StructField("cb", StringType()),
            StructField("__seq", LongType()),
            StructField("__deleted", BooleanType()),
        ]
        if dialect == "cell":
            from pyspark.sql.types import MapType
            fields += [
                StructField("__cells", MapType(StringType(), LongType())),
                StructField("__del_seq", LongType()),
            ]
        t = LakeTable.create(
            spark, f"{tmp_table_dir}/{dialect}", StructType(fields),
            ["repo", "path"], n_buckets=4,
            properties={"merge_dialect": dialect})
        # two MOR deltas split mid-history → the local fold must resolve
        # across files, not just pick a row
        merge_lww_mor(t, batch.filter(F.col("seq") <= 2), ["repo", "path"],
                      seq_col="seq")
        merge_lww_mor(t, batch.filter(F.col("seq") > 2), ["repo", "path"],
                      seq_col="seq")
        for p in ("a", "b", "c", "missing"):
            key = {"repo": "r", "path": p}
            local = point_lookup(t, key).collect()
            dist = point_lookup(t, key, prefer_local=False).collect()
            assert [r.asDict() for r in local] == \
                [r.asDict() for r in dist], (dialect, p)
        # spot-check the semantics themselves
        got = {r["path"]: (r["ca"], r["cb"])
               for r in point_lookup(
                   t, {"repo": "r", "path": "a"}).collect()}
        assert got == {"a": ("a3", "b2")}
        assert point_lookup(t, {"repo": "r", "path": "b"}).count() == 0


def test_local_lookup_fallbacks(spark, tmp_table_dir):
    """Unknown dialects and schema-version drift answer FALLBACK (the
    Spark path owns those folds); the public API still answers
    correctly."""
    import dataclasses

    ev = make_events(spark, 600)
    t = new_table(spark, tmp_table_dir + "/t")
    merge_lww(t, data_events(ev), KEYS)
    k = read_current(t).select(*KEYS).first()
    key = {"repo": k["repo"], "path": k["path"]}

    snap = t.snapshot()
    odd = dataclasses.replace(
        snap, properties={**snap.properties, "merge_dialect": "exotic"})
    t.snapshot = lambda v=None: odd
    assert point_lookup_local(t, key) is FALLBACK
    t2 = LakeTable(spark, tmp_table_dir + "/t")
    drift = dataclasses.replace(
        t2.snapshot(), schema_version=t2.snapshot().schema_version + 1)
    t2.snapshot = lambda v=None: drift
    assert point_lookup_local(t2, key) is FALLBACK
    # oversized candidate sets also defer to the distributed read
    t3 = LakeTable(spark, tmp_table_dir + "/t")
    assert point_lookup_local(t3, key, max_candidate_files=0) is FALLBACK
    rows = point_lookup(t3, key).collect()
    assert len(rows) == 1


def test_local_lookup_is_fast(spark, tmp_table_dir):
    """The product claim: after table open, a key resolves in milliseconds
    with ZERO Spark jobs (asserted via the status tracker)."""
    ev = make_events(spark, 2500)
    t = new_table(spark, tmp_table_dir + "/t")
    merge_lww(t, data_events(ev), KEYS)
    keys = [(r["repo"], r["path"])
            for r in read_current(t).limit(10).collect()]
    point_lookup_local(t, {"repo": keys[0][0], "path": keys[0][1]})  # warm

    jobs_before = len(spark.sparkContext.statusTracker().getJobIdsForGroup())
    t0 = time.perf_counter()
    for repo, path in keys:
        point_lookup_local(t, {"repo": repo, "path": path})
    per_key = (time.perf_counter() - t0) / len(keys)
    jobs_after = len(spark.sparkContext.statusTracker().getJobIdsForGroup())
    assert jobs_after == jobs_before, "local lookup must launch no Spark job"
    assert per_key < 0.25, f"{per_key * 1e3:.0f} ms/key"
