"""MOR-vs-COW in MOR's regime: batch ≪ table.

The headline bench applies batches comparable to the table size (dev SF),
where copy-on-write wins by construction. At 100 TB the real shape is a
SMALL change batch against a LARGE target; this script measures that:

  1. seed the target directly with a full keyspace snapshot (expression-
     built, __seq = -1 so every event outranks it) — ~80× the batch size
  2. apply K small event batches in BOTH modes
  3. report per-batch apply wall + events/sec. COW must rewrite every
     affected bucket (≈ the whole table for a random key spread); MOR
     appends O(batch) delta files and amortizes one compaction — the
     100 TB shape.

Writes BENCH/mor_regime.json and prints it.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
if os.path.isdir("/dev/shm"):
    os.environ.setdefault("GOBBLIN_LOCAL_DIR", "/dev/shm/spark-local")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_REPOS = int(os.environ.get("BENCH_REGIME_REPOS", "300"))
PATHS_PER_REPO = int(os.environ.get("BENCH_REGIME_PATHS", "4000"))
N_UPDATES = int(os.environ.get("BENCH_REGIME_EVENTS", "120000"))
SMALL_BATCHES = int(os.environ.get("BENCH_REGIME_BATCHES", "8"))
CONTENT_TOKENS = int(os.environ.get("BENCH_REGIME_TOKENS", "32"))


def seed_df(spark, n_repos: int, paths_per_repo: int, tokens: int):
    """Full-keyspace base snapshot in target-schema-v1 shape, built from
    pure Spark expressions (no event replay needed to seed a big table)."""
    import pyspark.sql.functions as F

    from gobblin_spark.sources.change_events import LANGS, _content_expr

    n = n_repos * paths_per_repo
    df = spark.range(n)
    repo = F.concat(F.lit("repo_"),
                    F.format_string("%04d", (F.col("id") % n_repos).cast("int")))
    path = F.concat(F.lit("src/f"),
                    (F.col("id") / n_repos).cast("long").cast("string"),
                    F.lit(".txt"))
    lang_idx = F.pmod(F.xxhash64(repo, path, F.lit(48)), F.lit(len(LANGS)))
    lang = F.element_at(F.array(*[F.lit(x) for x in LANGS]),
                        lang_idx.cast("int") + 1)
    return df.select(
        repo.alias("repo"),
        path.alias("path"),
        F.substring(F.sha2(F.concat_ws("|", repo, path, F.lit("1")), 256),
                    1, 40).alias("commit"),
        lang.alias("lang"),
        _content_expr(repo, path, F.lit(1), n_tokens=tokens).alias("content"),
        F.lit(-1).cast("long").alias("__seq"),
        F.lit(False).alias("__deleted"),
    )


def main() -> None:
    from gobblin_spark.engine import CdcEngine
    from gobblin_spark.session import get_spark
    from gobblin_spark.sources import generate_change_events

    spark = get_spark("gobblin-spark-bench-regime", parallelism=CPUS,
                      shuffle_partitions=max(CPUS, 16))
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="gobblin_regime_")
    t0 = time.time()
    ev_path = os.path.join(work, "events")
    generate_change_events(
        spark,
        n_updates=N_UPDATES,
        n_repos=N_REPOS,
        paths_per_repo=PATHS_PER_REPO,
        dup_frac=0.02,
        delete_frac=0.03,
        ooo_window=2000,
        content_tokens=CONTENT_TOKENS,
        n_groups=CPUS,
    ).write.mode("overwrite").parquet(ev_path)
    spark.catalog.clearCache()
    events = spark.read.parquet(ev_path)
    n_events = events.count()
    gen_sec = round(time.time() - t0, 3)
    small_cap = max(1, n_events // SMALL_BATCHES)

    from bench import host_supply_probe

    out_modes: dict[str, dict] = {}
    for mode in ("cow", "mor", "auto"):
        # per-leg supply probes: legs run sequentially and this host's
        # streaming supply flaps 5x+ on a minutes timescale, so a
        # mode-vs-mode ratio is only interpretable next to the probes
        probe_pre = host_supply_probe()
        eng = CdcEngine(
            spark,
            events,
            table_root=os.path.join(work, f"table_{mode}"),
            state_root=os.path.join(work, f"state_{mode}"),
            max_records_per_batch=small_cap,
            n_buckets=max(32, CPUS),
            merge_mode=mode,
            compact_every=SMALL_BATCHES,  # one amortized compaction in-loop
            compact_delta_ratio=None,  # fixed schedule for the comparison
        )
        t_seed = time.time()
        eng.table.overwrite(
            seed_df(spark, N_REPOS, PATHS_PER_REPO, CONTENT_TOKENS),
            seq_col="__seq",
        )
        seed_sec = round(time.time() - t_seed, 3)
        table_rows = eng.table.stats()["rows"]
        warm = eng.run_batch()  # JIT/codegen warm-up batch, untimed
        per_batch: list[dict] = []
        t1 = time.time()
        while True:
            r = eng.run_batch()
            if r.empty:
                break
            per_batch.append({
                "rows": r.rows_read,
                "wall_sec": round(r.wall_ms / 1000.0, 3),
                "phase_ms": r.phase_ms,
            })
        wall = time.time() - t1
        applied = sum(b["rows"] for b in per_batch)
        # what the auto chooser actually picked, from the commit log
        from gobblin_spark.state.store import StateStore
        chosen = [c["metrics"].get("merge_mode")
                  for c in sorted(
                      StateStore(os.path.join(work, f"state_{mode}"))
                      .committed_batches(),
                      key=lambda c: c.get("committed_ms", 0))
                  if c.get("kind") != "rollup"]
        out_modes[mode] = {
            "chosen_modes": chosen if mode == "auto" else None,
            "probe_pre": probe_pre,
            "probe_post": host_supply_probe(),
            "seed_sec": seed_sec,
            "table_rows_seeded": table_rows,
            "warmup_rows": warm.rows_read,
            "batches": len(per_batch),
            "batch_cap": small_cap,
            "events_applied": applied,
            "wall_sec": round(wall, 3),
            "events_per_sec": round(applied / wall, 1) if wall > 0 else 0.0,
            "per_batch": per_batch,
        }

    # --- per-bucket compaction temperature: skewed churn (2 hot buckets)
    # against the seeded table; targeted pass vs table-wide rewrite
    import pyspark.sql.functions as F

    from gobblin_spark.lakehouse.merge import (
        compact,
        hot_buckets,
        merge_lww_mor,
    )
    from gobblin_spark.lakehouse.table import bucket_expr

    n_buckets = max(32, CPUS)
    data = events.filter(F.col("op").isin("I", "U", "D")).drop("version")
    skew = (data.withColumn("__b", bucket_expr(["repo", "path"], n_buckets))
            .filter(F.col("__b") < 2).drop("__b"))
    n_skew = skew.count()
    eng = CdcEngine(
        spark, events,
        table_root=os.path.join(work, "table_skew"),
        state_root=os.path.join(work, "state_skew"),
        n_buckets=n_buckets, merge_mode="mor")
    eng.table.overwrite(seed_df(spark, N_REPOS, PATHS_PER_REPO,
                                CONTENT_TOKENS), seq_col="__seq")
    # a hot tenant churning: the same two buckets receive delta batch
    # after delta batch while the other 30 stay cold
    hi_seq = int(data.agg(F.max("seq")).first()[0])
    for i in range(6):
        merge_lww_mor(
            eng.table,
            skew.withColumn("seq", F.col("seq") + F.lit((i + 1) * (hi_seq + 1))),
            ["repo", "path"], seq_col="seq")
    snap = eng.table.snapshot()
    delta_rows = sum(f.rows for f in snap.files if not f.reduced)
    base_rows = sum(f.rows for f in snap.files if f.reduced)
    hot = hot_buckets(snap, 0.25)
    # the scheduling gap the per-bucket trigger closes: table-wide ratio
    # stays silent under skew while the hot buckets drown in deltas
    t2 = time.time()
    n_with_deltas = (eng.current_state().count(), )[0]
    read_with_deltas = round(time.time() - t2, 3)
    pre = {f.path for f in snap.files}
    t2 = time.time()
    after = compact(eng.table, buckets=hot)
    compact_wall = round(time.time() - t2, 3)
    new_files = [f for f in after.files if f.path not in pre]
    t2 = time.time()
    n_after = eng.current_state().count()
    read_after = round(time.time() - t2, 3)
    assert n_after == n_with_deltas
    per_bucket_doc = {
        "skew_rows": n_skew,
        "buckets_total": n_buckets,
        "hot_buckets": sorted(hot),
        "table_wide_delta_ratio": round(delta_rows / max(base_rows, 1), 4),
        "table_trigger_fires_at_0.25": delta_rows / max(base_rows, 1) >= 0.25,
        "bucket_trigger_fires_at_0.25": bool(hot),
        "targeted_compact_wall_sec": compact_wall,
        "files_rewritten": len(new_files),
        "rows_rewritten": sum(f.rows for f in new_files),
        "table_rows": base_rows,
        "read_current_wall_with_lingering_deltas": read_with_deltas,
        "read_current_wall_after_targeted_compact": read_after,
    }

    ratio = (out_modes["mor"]["events_per_sec"]
             / max(out_modes["cow"]["events_per_sec"], 0.001))
    auto_vs_best = (out_modes["auto"]["events_per_sec"]
                    / max(out_modes["cow"]["events_per_sec"],
                          out_modes["mor"]["events_per_sec"], 0.001))
    doc = {
        "metric": "small_batch_apply_events_per_sec",
        "regime": {
            "table_rows": out_modes["mor"]["table_rows_seeded"],
            "batch_rows_cap": small_cap,
            "table_to_batch_ratio": round(
                out_modes["mor"]["table_rows_seeded"] / small_cap, 1),
        },
        "cpus": CPUS,
        "events_total": n_events,
        "generate_sec": gen_sec,
        "modes": out_modes,
        "mor_over_cow_speedup": round(ratio, 2),
        # merge_mode='auto' should track the winning static mode in this
        # regime (batch ≪ table ⇒ chooser picks MOR every batch)
        "auto_vs_best_static": round(auto_vs_best, 2),
        "per_bucket_trigger": per_bucket_doc,
    }
    bench_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH")
    os.makedirs(bench_dir, exist_ok=True)
    with open(os.path.join(bench_dir, "mor_regime.json"), "w") as fh:
        json.dump(doc, fh, indent=2)
    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(doc))


if __name__ == "__main__":
    main()
