"""Micro-bench: manifest value-stats bloom skipping for secondary
equality predicates.

Builds a compacted CDC table with value-stats blooms on `lang`, then for
each distinct lang value measures the filtered read (files planned + wall)
WITH blooms vs with them stripped (full scan + row filter). ABAB-
alternated, best-of-2 per arm, host-supply probe embedded. Writes
BENCH/value_stats_skipping.json.

Usage: python scripts/bench_value_stats.py [n_events]
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from gobblin_spark.lakehouse import LakeTable  # noqa: E402
from gobblin_spark.lakehouse.merge import merge_lww, read_current  # noqa: E402
from gobblin_spark.session import get_spark  # noqa: E402
from gobblin_spark.sources import generate_change_events  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000


def probe() -> dict:
    import hashlib
    t0 = time.time()
    n = 0
    buf = b"x" * 65536
    while time.time() - t0 < 1.0:
        hashlib.sha256(buf).digest()
        n += 1
    return {"sha256_64k_per_sec": n}


def main():
    from pyspark.sql.types import (
        BooleanType, LongType, StringType, StructField, StructType,
    )

    spark = get_spark("bench-vs", parallelism=8, shuffle_partitions=8)
    d = tempfile.mkdtemp(prefix="bench_vs_")
    ev_path = os.path.join(d, "events")
    generate_change_events(spark, N, n_repos=50, paths_per_repo=200,
                           dup_frac=0.05, delete_frac=0.05,
                           ooo_window=500).write.parquet(ev_path)
    ev = spark.read.parquet(ev_path).filter(F.col("op").isin("I", "U", "D"))

    schema = StructType([
        StructField("repo", StringType()), StructField("path", StringType()),
        StructField("commit", StringType()), StructField("lang", StringType()),
        StructField("content", StringType()),
        StructField("__seq", LongType()),
        StructField("__deleted", BooleanType()),
    ])
    t = LakeTable.create(spark, os.path.join(d, "t"), schema,
                         ["repo", "path"], n_buckets=32,
                         stats_cols=["lang"])
    cols = ["seq", "op", "repo", "path", "commit", "lang", "content"]
    merge_lww(t, ev.select(*cols), ["repo", "path"])
    # rare-value regime: a handful of keys in one niche lang — the case
    # secondary skipping exists for (uniform values saturate every file's
    # bloom; that regime measures pure overhead instead)
    hi = int(ev.agg(F.max("seq")).first()[0])
    rare = spark.createDataFrame(
        [(hi + 1 + i, "U", f"zr{i % 4}", f"zp{i}", "zc", "zig", "zz")
         for i in range(20)], cols)
    merge_lww(t, rare, ["repo", "path"])

    langs = [r["lang"] for r in
             read_current(t).select("lang").distinct().collect()]
    planned = []
    orig = LakeTable.read_file_set

    def spy(self, files, s=None):
        planned.append(len(files))
        return orig(self, files, s)

    snap = t.snapshot()
    import dataclasses
    stripped = dataclasses.replace(
        snap, files=[dataclasses.replace(f, value_stats=None)
                     for f in snap.files])

    results = []
    LakeTable.read_file_set = spy
    try:
        for lang in sorted(langs):
            rec = {"value": lang}
            for arm in ("bloom", "full", "bloom", "full"):
                if arm == "full":
                    t.snapshot = lambda v=None, _s=stripped: _s
                else:
                    t.snapshot = lambda v=None, _s=snap: _s
                t0 = time.time()
                n = read_current(t, value_eq={"lang": lang}).count()
                wall = time.time() - t0
                key_w = f"wall_{arm}"
                key_f = f"files_{arm}"
                rec[key_w] = min(rec.get(key_w, 1e9), round(wall, 3))
                rec[key_f] = planned[-1]
                rec["rows"] = n
            results.append(rec)
    finally:
        LakeTable.read_file_set = orig
        del t.snapshot

    total_files = len(snap.files)
    avg_skip = (1 - sum(r["files_bloom"] for r in results)
                / max(1, sum(r["files_full"] for r in results)))
    best = max(results, key=lambda r: r["files_full"] - r["files_bloom"])
    out = {
        "bench": "value_stats_skipping",
        "n_events": N,
        "n_files": total_files,
        "n_values": len(langs),
        # uniform values saturate every file's bloom (skip 0, overhead
        # noise-level); the rare/selective value is the regime skipping
        # exists for
        "avg_file_skip_ratio": round(avg_skip, 3),
        "best_value": best["value"],
        "best_value_skip_ratio": round(
            1 - best["files_bloom"] / max(1, best["files_full"]), 3),
        "wall_bloom_sum": round(sum(r["wall_bloom"] for r in results), 3),
        "wall_full_sum": round(sum(r["wall_full"] for r in results), 3),
        "host_supply_probe": probe(),
        "per_value": results,
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/value_stats_skipping.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: v for k, v in out.items() if k != "per_value"}))


if __name__ == "__main__":
    main()
