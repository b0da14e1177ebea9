"""Engine e2e for the 'column' (patch) merge dialect: Debezium/Mongo-style
patch streams — null payload column = unchanged — through the FULL engine
loop (planning, batching, MOR deltas + compaction or COW, restart, replay),
converging to a pure-Python patch oracle. The dialect is a table property,
so a restarted engine rediscovers it from the manifest."""

from __future__ import annotations

import os

import pytest
from pyspark.sql.types import (
    IntegerType, LongType, StringType, StructField, StructType,
)

from gobblin_spark.engine import CdcEngine
from gobblin_spark.lakehouse import LakeTable
from gobblin_spark.lakehouse.merge import point_lookup, read_current

EVENT_SCHEMA = StructType([
    StructField("seq", LongType()),
    StructField("event_group", IntegerType()),
    StructField("op", StringType()),
    StructField("repo", StringType()),
    StructField("path", StringType()),
    StructField("commit", StringType()),
    StructField("lang", StringType()),
    StructField("content", StringType()),
    StructField("schema_version", IntegerType()),
    StructField("version", LongType()),
    StructField("size_bytes", LongType()),
])


def patch_stream():
    """Deterministic adversarial patch stream: interleaved single-column
    patches, delete-clears-state, post-delete rebuild, duplicate
    re-delivery, out-of-order seqs across 20 keys."""
    rows = []
    seq = 0

    def ev(op, key, commit=None, lang=None, content=None):
        nonlocal seq
        rows.append((seq, key % 4, op, f"repo_{key % 3}", f"src/f{key}.txt",
                     commit, lang, content, 1, 0,
                     len(content) if content else None))
        seq += 1

    for k in range(20):
        ev("U", k, commit=f"c{k}_0", lang="py", content=f"body {k} v0")
    for k in range(20):            # patch only the commit
        ev("U", k, commit=f"c{k}_1")
    for k in range(0, 20, 2):      # patch only the content on even keys
        ev("U", k, content=f"body {k} v2")
    for k in range(0, 20, 5):      # delete every 5th key
        ev("D", k)
    for k in (0, 10):              # rebuild two deleted keys from scratch
        ev("U", k, lang="rs")
        ev("U", k, commit=f"c{k}_3")
    # duplicate re-delivery of an early patch (exact content, later seq)
    rows.append((seq, 1 % 4, "U", "repo_1", "src/f1.txt",
                 "c1_1", None, None, 1, 0, None))
    return rows


def patch_oracle(rows):
    """Pure-Python column-granular replay."""
    per_key: dict[tuple, list] = {}
    for r in sorted(rows, key=lambda r: r[0]):
        per_key.setdefault((r[3], r[4]), []).append(r)
    out = {}
    for key, evs in per_key.items():
        last_del = max((r[0] for r in evs if r[2] == "D"), default=None)
        live = [r for r in evs if r[2] != "D"
                and (last_del is None or r[0] > last_del)]
        if not live:
            continue
        state = {}
        for col, idx in (("commit", 5), ("lang", 6), ("content", 7)):
            vals = [(r[0], r[idx]) for r in live if r[idx] is not None]
            state[col] = max(vals)[1] if vals else None
        out[key] = (state["commit"], state["lang"], state["content"])
    return out


@pytest.mark.parametrize("merge_mode", ["cow", "mor"])
def test_patch_dialect_engine_convergence(spark, tmp_table_dir, merge_mode):
    rows = patch_stream()
    events = spark.createDataFrame(rows, EVENT_SCHEMA)
    want = patch_oracle(rows)

    def make_engine():
        return CdcEngine(
            spark, events,
            table_root=os.path.join(tmp_table_dir, merge_mode, "table"),
            state_root=os.path.join(tmp_table_dir, merge_mode, "state"),
            max_records_per_batch=25,
            n_buckets=4,
            merge_mode=merge_mode,
            merge_dialect="column",
            compact_every=2,
        )

    eng = make_engine()
    first = eng.run_batch()
    assert first is not None

    if merge_mode == "mor":
        # read across UNFOLDED deltas mid-run: patch resolution on read
        mid = read_current(eng.table)
        assert mid.count() > 0

    # restart: dialect must be rediscovered from the table property, and
    # the default 'row' argument must NOT override it
    eng = CdcEngine(
        spark, events,
        table_root=os.path.join(tmp_table_dir, merge_mode, "table"),
        state_root=os.path.join(tmp_table_dir, merge_mode, "state"),
        max_records_per_batch=25,
        n_buckets=4,
        merge_mode=merge_mode,
        compact_every=2,
    )
    assert eng.table.snapshot().merge_dialect == "column"
    eng.run_until_caught_up()

    got = {(r["repo"], r["path"]): (r["commit"], r["lang"], r["content"])
           for r in read_current(eng.table).collect()}
    assert got == want

    # replay from scratch over the same state is a no-op
    res = make_engine().run_until_caught_up()
    assert res == []

    # point lookup honors the dialect (rebuilt-after-delete key)
    row = point_lookup(eng.table,
                       {"repo": "repo_0", "path": "src/f0.txt"}).collect()
    assert len(row) == 1
    assert (row[0]["commit"], row[0]["lang"]) == ("c0_3", "rs")

    # deleted, never-rebuilt key stays gone
    assert point_lookup(eng.table,
                        {"repo": "repo_2", "path": "src/f5.txt"}).count() == 0


def test_patch_dialect_compaction_folds_and_gc(spark, tmp_table_dir):
    """After compaction the table holds at most one row per key, values
    still match the oracle, and gc_horizon drops dead tombstones."""
    from gobblin_spark.lakehouse.merge import compact

    rows = patch_stream()
    events = spark.createDataFrame(rows, EVENT_SCHEMA)
    eng = CdcEngine(
        spark, events,
        table_root=os.path.join(tmp_table_dir, "table"),
        state_root=os.path.join(tmp_table_dir, "state"),
        max_records_per_batch=30,
        n_buckets=4,
        merge_mode="mor",
        merge_dialect="column",
        compact_every=None,
        compact_delta_ratio=None,
    )
    eng.run_until_caught_up()
    t = eng.table
    max_seq = max(r[0] for r in rows)
    compact(t, gc_horizon_seq=max_seq)
    stored = t.read()
    # one row per key after the fold
    assert stored.count() == stored.select("repo", "path").distinct().count()
    # tombstones at/below the horizon are gone
    assert stored.filter("__deleted").count() == 0
    got = {(r["repo"], r["path"]): (r["commit"], r["lang"], r["content"])
           for r in read_current(t).collect()}
    assert got == patch_oracle(rows)


def test_streaming_refuses_column_dialect(spark, tmp_table_dir):
    """Streaming ingest must refuse a patch-dialect table: epoch boundaries
    can't guarantee the seq-monotone admission the per-epoch fold needs."""
    from pyspark.sql.types import StructType

    from gobblin_spark.streaming.ingest import stream_ingest

    rows = patch_stream()
    ev_dir = os.path.join(tmp_table_dir, "ev")
    spark.createDataFrame(rows, EVENT_SCHEMA).write.parquet(ev_dir)
    eng = CdcEngine(
        spark, spark.read.parquet(ev_dir),
        table_root=os.path.join(tmp_table_dir, "table"),
        state_root=os.path.join(tmp_table_dir, "state"),
        merge_dialect="column", n_buckets=4,
    )
    eng.run_batch()
    with pytest.raises(NotImplementedError, match="column"):
        stream_ingest(spark, ev_dir, os.path.join(tmp_table_dir, "table"),
                      os.path.join(tmp_table_dir, "state"),
                      os.path.join(tmp_table_dir, "ckpt"))


def test_patch_dialect_across_schema_evolution(spark, tmp_table_dir):
    """Patch semantics compose with the schema registry: v1-era rows (no
    size_bytes), an op='S' marker evolving the target to v2, then v2 patch
    rows setting ONLY size_bytes. The new column backfills per key from its
    latest non-null value; untouched keys read null; unrelated columns keep
    their pre-evolution values (read-time conformance + per-column fold)."""
    rows = []
    # v1 era: full rows for keys 0..5
    for k in range(6):
        rows.append((k, k % 4, "U", f"repo_{k % 3}", f"src/f{k}.txt",
                     f"c{k}", "py", f"body {k}", 1, 0, None))
    # schema-change marker at seq 6 (v2 adds size_bytes int)
    rows.append((6, 0, "S", None, None, None, None, None, 2, 0, None))
    # v2 era: size_bytes-only patches for even keys + one commit patch
    for i, k in enumerate(range(0, 6, 2)):
        rows.append((7 + i, k % 4, "U", f"repo_{k % 3}", f"src/f{k}.txt",
                     None, None, None, 2, 0, 1000 + k))
    rows.append((10, 1 % 4, "U", "repo_1", "src/f1.txt",
                 "c1_v2", None, None, 2, 0, None))

    events = spark.createDataFrame(rows, EVENT_SCHEMA)
    eng = CdcEngine(
        spark, events,
        table_root=os.path.join(tmp_table_dir, "table"),
        state_root=os.path.join(tmp_table_dir, "state"),
        max_records_per_batch=5,  # evolution happens mid-run
        n_buckets=4,
        merge_mode="mor",
        merge_dialect="column",
        compact_every=2,
    )
    eng.run_until_caught_up()
    assert int(eng.table.snapshot().properties["registry_version"]) >= 2

    got = {(r["repo"], r["path"]): (r["commit"], r["content"],
                                    r["size_bytes"])
           for r in read_current(eng.table).collect()}
    assert got[("repo_0", "src/f0.txt")] == ("c0", "body 0", 1000)
    assert got[("repo_2", "src/f2.txt")] == ("c2", "body 2", 1002)
    # commit patched in v2, size never set -> null; body kept from v1
    assert got[("repo_1", "src/f1.txt")] == ("c1_v2", "body 1", None)
    # untouched v1 keys: evolved column reads null
    assert got[("repo_0", "src/f3.txt")] == ("c3", "body 3", None)
    assert len(got) == 6


def test_column_dialect_is_deprecated_with_warning(spark, tmp_table_dir):
    """Disposition of the 'column' dialect: DEPRECATED in favor of 'cell'
    (same patch semantics, order-independent). Batch ingest still honors
    it for existing tables but must say so loudly; 'cell' and 'row' stay
    warning-free."""
    import warnings

    d = tmp_table_dir
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        CdcEngine(spark,
                  spark.createDataFrame(patch_stream(), EVENT_SCHEMA),
                  d + "/t", d + "/s",
                  merge_dialect="column", n_buckets=4)
    dep = [w for w in rec if issubclass(w.category, DeprecationWarning)
           and "column" in str(w.message)]
    assert dep, "column dialect must emit a DeprecationWarning"
    assert "cell" in str(dep[0].message)  # points at the replacement

    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        CdcEngine(spark,
                  spark.createDataFrame(patch_stream(), EVENT_SCHEMA),
                  d + "/t2", d + "/s2",
                  merge_dialect="cell", n_buckets=4)
    assert not [w for w in rec
                if issubclass(w.category, DeprecationWarning)]
