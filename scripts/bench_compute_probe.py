"""Compute-bound scaling counterexample for BENCH/SCALING.md.

Runs a pure-compute Spark stage (iterated sha256 over generated longs — no
input IO, no shuffle payload, negligible memory traffic) at two
parallelism levels in fresh JVMs. On hardware with per-core headroom this
scales near-linearly; comparing its ratio with the CDC apply's ratio on
the same box separates ENGINE scaling (what the north rule's N→4N
criterion is about) from the single-VM memory-bandwidth throttle that
caps byte-moving stages in this sandbox.

Usage: python scripts/bench_compute_probe.py [base_cpus]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_ROWS = int(os.environ.get("PROBE_ROWS", "4000000"))
ITERS = int(os.environ.get("PROBE_ITERS", "48"))


def run_level(cpus: int) -> dict:
    from pyspark.sql import functions as F

    from gobblin_spark.session import get_spark

    spark = get_spark(f"probe-{cpus}", parallelism=cpus,
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.range(0, N_ROWS, 1, cpus * 4)
    col = F.col("id").cast("string")
    for _ in range(ITERS):
        col = F.sha2(col, 256)
    df.select(F.max(col)).collect()  # warm-up (JIT/codegen)
    t0 = time.time()
    df.select(F.max(col)).collect()
    wall = time.time() - t0
    spark.stop()
    return {"cpus": cpus, "wall_sec": round(wall, 3),
            "rows_per_sec": round(N_ROWS / wall, 1)}


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--worker":
        print(json.dumps(run_level(int(sys.argv[2]))))
        return
    base = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    levels = {}
    for cpus in (base, base * 4):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker",
             str(cpus)],
            capture_output=True, text=True, cwd=REPO,
        )
        levels[cpus] = json.loads(
            [l for l in proc.stdout.splitlines() if l.startswith("{")][-1])
        print(f"local[{cpus}]: {levels[cpus]['rows_per_sec']} rows/sec",
              file=sys.stderr)
    lo, hi = levels[base], levels[base * 4]
    eff = (hi["rows_per_sec"] / lo["rows_per_sec"]) / 4
    out = {"metric": "compute_bound_scaling_probe", "n_rows": N_ROWS,
           "sha_iters": ITERS, "levels": levels,
           "efficiency_Nx4": round(eff, 3)}
    with open(os.path.join(REPO, "BENCH",
                           f"compute_probe_{base}x{base*4}.json"), "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
