"""Incremental view maintenance vs from-scratch re-aggregation, BOTH
regimes, with the pruning fraction made observable.

The incremental step's cost driver is the changelog diff, which reads only
buckets whose file sets differ between the two versions. Buckets are
KEY-HASH partitions, so the pruning fraction is ~min(1, touched_keys /
n_buckets): a sync touching fewer keys than the table has buckets reads a
sliver; a wide update touching every bucket re-reads the table on both
sides of the diff (plus join) and LOSES to a plain re-aggregate at small
scale, where per-job fixed costs dominate. Both regimes are measured and
reported with buckets_read_frac so the asymptotic claim is checkable from
the artifact: at 100 TB / 2^16 buckets, a 1k-key sync reads ~1.5% of the
table; the full path reads 100% every sync at any scale.

Usage: python scripts/bench_aggview.py
Writes BENCH/aggview_incremental.json.
"""

import json
import os
import shutil
import sys
import tempfile
import time

os.environ.setdefault("SPARK_DRIVER_MEM", "3g")
if os.path.isdir("/dev/shm"):
    os.environ.setdefault("GOBBLIN_LOCAL_DIR", "/dev/shm/spark-local")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_EVENTS = int(os.environ.get("BENCH_EVENTS", "1500000"))


def changed_bucket_frac(table, v_old, v_new):
    """Fraction of the new snapshot's buckets whose file set differs —
    exactly table_changes' pruning unit AND the chooser's signal."""
    from gobblin_spark.lakehouse.merge import changed_units

    changed, unit_n, _ = changed_units(
        table.snapshot(v_old), table.snapshot(v_new))
    return len(changed) / max(1, unit_n), len(changed), unit_n


def run_regime(spark, d, ev, hi, n_buckets, touch_per_100k, tag):
    import pyspark.sql.functions as F

    from gobblin_spark.aggview import agg_sync
    from gobblin_spark.engine import CdcEngine
    from gobblin_spark.lakehouse import LakeTable
    from gobblin_spark.lakehouse.merge import merge_lww, read_current

    root = os.path.join(d, tag)
    eng = CdcEngine(
        spark, ev, os.path.join(root, "t"), os.path.join(root, "s"),
        max_records_per_batch=max(1, N_EVENTS // 4), n_buckets=n_buckets)
    eng.run_until_caught_up()
    src = LakeTable(spark, os.path.join(root, "t"))
    kw = dict(group_cols=["lang"], n_buckets=8)

    t0 = time.time()
    agg_sync(spark, os.path.join(root, "t"), os.path.join(root, "vs"),
             os.path.join(root, "view"), **kw)
    bootstrap_sec = time.time() - t0
    # twin view for the default chooser path (same bootstrap state)
    agg_sync(spark, os.path.join(root, "t"), os.path.join(root, "vs_c"),
             os.path.join(root, "view_c"), **kw)

    v_before = src.current_version()
    state = read_current(src)
    batch = (
        state.where(
            F.pmod(F.xxhash64("repo", "path"), F.lit(100_000))
            < touch_per_100k)
        .select(
            "repo", "path",
            F.lit("upd").alias("commit"), F.col("lang"), F.col("content"),
            # one update per key: any seq > hi wins LWW per key, so
            # cross-key uniqueness is not required
            (F.lit(hi + 1)
             + F.pmod(F.xxhash64("repo", "path"), F.lit(1_000_000))
             ).cast("long").alias("seq"),
            F.lit("U").alias("op"),
        ))
    n_touch = batch.count()
    merge_lww(src, batch, ["repo", "path"])
    frac, n_changed, unit_n = changed_bucket_frac(
        src, v_before, src.current_version())

    # forced-incremental path (the pre-chooser behavior)
    t0 = time.time()
    agg_sync(spark, os.path.join(root, "t"), os.path.join(root, "vs"),
             os.path.join(root, "view"),
             full_reaggregate_threshold=None, **kw)
    incremental_sec = time.time() - t0

    # the DEFAULT path: agg_sync's regime chooser picks from the
    # changed-unit fraction (threshold 0.5)
    t0 = time.time()
    rc = agg_sync(spark, os.path.join(root, "t"), os.path.join(root, "vs_c"),
                  os.path.join(root, "view_c"), **kw)
    chooser_sec = time.time() - t0

    # the naive consumer: full scan + GROUP BY + view rewrite, every sync
    t0 = time.time()
    agg_sync(spark, os.path.join(root, "t"), os.path.join(root, "vs_full"),
             os.path.join(root, "view_full"), **kw)
    full_sec = time.time() - t0

    rows = sum(f.rows for f in src.snapshot().files if f.rows)
    return {
        "regime": tag,
        "src_buckets": n_buckets,
        "table_rows": rows,
        "touched_keys": n_touch,
        "changed_buckets": n_changed,
        "buckets_read_frac": round(frac, 4),
        "bootstrap_sec": round(bootstrap_sec, 3),
        "incremental_sec": round(incremental_sec, 3),
        "chooser_sec": round(chooser_sec, 3),
        "chooser_mode": rc["mode"],
        "full_reaggregate_sec": round(full_sec, 3),
        "speedup_vs_full": round(full_sec / max(1e-9, incremental_sec), 2),
        "chooser_speedup_vs_full": round(
            full_sec / max(1e-9, chooser_sec), 2),
    }


def main():
    import pyspark.sql.functions as F

    from bench import host_supply_probe
    from gobblin_spark.session import get_spark
    from gobblin_spark.sources import generate_change_events

    probe = host_supply_probe()
    spark = get_spark("bench-aggview", parallelism=8, shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    d = tempfile.mkdtemp(prefix="gobblin_aggbench_", dir=scratch)
    try:
        ev_path = os.path.join(d, "events")
        generate_change_events(
            spark, N_EVENTS, n_repos=200, paths_per_repo=N_EVENTS // 1000,
            dup_frac=0.05, delete_frac=0.05, ooo_window=5000, n_groups=32,
            content_tokens=12,
        ).write.parquet(ev_path)
        ev = spark.read.parquet(ev_path)
        hi = int(ev.agg(F.max("seq")).first()[0])

        regimes = [
            # wide: touched keys >> buckets -> every bucket's files differ,
            # the diff re-reads the table on both sides and loses at small
            # scale (fixed costs dominate a sub-second scan)
            run_regime(spark, d, ev, hi, n_buckets=32, touch_per_100k=500,
                       tag="wide_1k_keys_32_buckets"),
            # narrow: touched keys << buckets -> the diff reads a sliver;
            # this is the 100 TB shape (2^16 buckets, ~1k keys per sync)
            run_regime(spark, d, ev, hi, n_buckets=512, touch_per_100k=3,
                       tag="narrow_single_digit_keys_512_buckets"),
        ]
        out = {
            "metric": "aggview_incremental_vs_full_reaggregate",
            "n_events": N_EVENTS,
            "regimes": regimes,
            "host_supply_probe": probe,
            "reading": (
                "buckets_read_frac is the diff's pruning fraction ~ min(1, touched_keys/n_buckets) AND agg_sync's chooser signal (threshold 0.5, manifest math only). chooser_mode/chooser_sec show the default path: wide regime (frac 1.0) now takes the from-scratch re-aggregate instead of losing 0.3x on a both-sides diff; narrow regime (frac ~0.01) stays incremental. The asymptotic claim is unchanged: at 100 TB the full path scans the table EVERY sync; the incremental path reads ~touched_keys/n_buckets of it, and the chooser only abandons it when the diff would re-read most of the table anyway."),
        }
        path = os.path.join(REPO, "BENCH", "aggview_incremental.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out))
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
