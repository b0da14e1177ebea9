"""Micro-bench: bucket-spec evolution cost profile.

Measures, on a MOR table with many delta files:
  1. the rescale commit itself (metadata-only — must be O(manifest),
     milliseconds, regardless of data size);
  2. read_current wall before vs after the rescale (residue-mapped
     planning must be free);
  3. driver-local point-lookup latency before the rescale, after it
     (mixed specs), and after compaction migrates everything to the new
     spec (more buckets → fewer candidate files per probe).

Writes BENCH/rescale_cost.json. Usage: python scripts/bench_rescale.py [n]
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from gobblin_spark.lakehouse import LakeTable  # noqa: E402
from gobblin_spark.lakehouse.merge import (  # noqa: E402
    compact, merge_lww_mor, point_lookup, read_current,
)
from gobblin_spark.session import get_spark  # noqa: E402
from gobblin_spark.sources import generate_change_events  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
DELTAS = 12
PROBES = 16


def main():
    from pyspark.sql.types import (
        BooleanType, LongType, StringType, StructField, StructType,
    )

    spark = get_spark("bench-rescale", parallelism=8, shuffle_partitions=8)
    d = tempfile.mkdtemp(prefix="bench_rs_")
    generate_change_events(spark, N, n_repos=50, paths_per_repo=200,
                           dup_frac=0.05, delete_frac=0.05,
                           ooo_window=500).write.parquet(d + "/events")
    ev = spark.read.parquet(d + "/events").filter(
        F.col("op").isin("I", "U", "D")).select(
        "seq", "op", "repo", "path", "commit", "lang", "content")

    schema = StructType([
        StructField("repo", StringType()), StructField("path", StringType()),
        StructField("commit", StringType()), StructField("lang", StringType()),
        StructField("content", StringType()),
        StructField("__seq", LongType()),
        StructField("__deleted", BooleanType()),
    ])
    t = LakeTable.create(spark, d + "/t", schema, ["repo", "path"],
                         n_buckets=16)
    hi = int(ev.agg(F.max("seq")).first()[0])
    for i in range(DELTAS):
        lo_c, hi_c = i * hi // DELTAS, (i + 1) * hi // DELTAS
        merge_lww_mor(t, ev.filter(
            (F.col("seq") > lo_c) & (F.col("seq") <= hi_c)), ["repo", "path"])

    keys = [(r["repo"], r["path"]) for r in
            read_current(t).select("repo", "path").limit(PROBES).collect()]

    def lookup_ms():
        walls = []
        for repo, path in keys:
            t0 = time.time()
            point_lookup(t, {"repo": repo, "path": path}).collect()
            walls.append((time.time() - t0) * 1000)
        return round(sum(walls) / len(walls), 1)

    def read_wall():
        t0 = time.time()
        read_current(t).write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    out = {"bench": "rescale_cost", "n_events": N, "deltas": DELTAS,
           "files_before": len(t.snapshot().files)}
    # warm then measure
    read_wall()
    out["read_wall_before"] = min(read_wall(), read_wall())
    lookup_ms()
    out["lookup_ms_before"] = lookup_ms()

    t0 = time.time()
    t.rescale_buckets(128)
    out["rescale_commit_ms"] = round((time.time() - t0) * 1000, 1)

    out["read_wall_after_rescale"] = min(read_wall(), read_wall())
    out["lookup_ms_after_rescale_mixed_specs"] = lookup_ms()

    t0 = time.time()
    compact(t)
    out["compact_migration_wall"] = round(time.time() - t0, 3)
    out["files_after_compact"] = len(t.snapshot().files)
    out["read_wall_after_compact"] = min(read_wall(), read_wall())
    out["lookup_ms_after_compact_128_buckets"] = lookup_ms()

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/rescale_cost.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
