"""Per-phase timing of the MOR batch loop at one parallelism level.
Usage: python scripts/profile_phases.py [cpus] [n_updates] [mode]"""

import json
import os
import shutil
import sys
import tempfile
import time

os.environ.setdefault("SPARK_DRIVER_MEM", "48g")  # local-mode heap = the whole 'cluster'
if os.path.isdir("/dev/shm"):
    os.environ.setdefault("GOBBLIN_LOCAL_DIR", "/dev/shm/spark-local")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_updates = int(sys.argv[2]) if len(sys.argv) > 2 else 600000
    mode = sys.argv[3] if len(sys.argv) > 3 else "mor"
    toks = int(sys.argv[4]) if len(sys.argv) > 4 else 24

    from gobblin_spark.engine import CdcEngine
    from gobblin_spark.session import get_spark
    from gobblin_spark.sources import generate_change_events

    spark = get_spark(f"profile-{cpus}", parallelism=cpus,
                      shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="gobblin_profile_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None)
    ev_dir = os.environ.get("BENCH_EVENTS_DIR")
    if ev_dir and os.path.isdir(ev_dir):
        ev_path = ev_dir
    else:
        ev_path = os.path.join(work, "events")
        generate_change_events(
            spark, n_updates, n_repos=200,
            dup_frac=0.05, delete_frac=0.05, ooo_window=5000, n_groups=32,
            content_tokens=toks, paths_per_repo=max(2000, n_updates // 1000),
        ).write.mode("overwrite").parquet(ev_path)
        spark.catalog.clearCache()  # drop the generator's persisted intermediates
    events = spark.read.parquet(ev_path)
    n = events.count()
    eng = CdcEngine(
        spark, events,
        table_root=os.path.join(work, "table"),
        state_root=os.path.join(work, "state"),
        max_records_per_batch=max(1, n // 4),
        n_buckets=max(32, cpus),
        merge_mode=mode,
        compact_every=4,
        compact_delta_ratio=None,  # fixed schedule: batch ≈ table/4 here
    )
    warm = eng.run_batch()
    print("warmup phases:", json.dumps(warm.phase_ms), file=sys.stderr)
    t0 = time.time()
    results = eng.run_until_caught_up()
    wall = time.time() - t0
    agg: dict[str, int] = {}
    for r in results:
        for k, v in r.phase_ms.items():
            agg[k] = agg.get(k, 0) + v
    applied = sum(r.rows_read for r in results)
    print(json.dumps({
        "cpus": cpus, "mode": mode, "events": applied,
        "wall_sec": round(wall, 2),
        "events_per_sec": round(applied / wall, 1),
        "phase_ms_total": agg,
        "batches": len(results),
    }))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
