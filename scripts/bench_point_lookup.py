"""Micro-bench: manifest key_bounds file skipping for point lookups.

Builds a MOR table with many outstanding delta batches (the
between-compactions regime), then measures for a set of probe keys how
many files a point lookup reads WITH the recorded key_bounds vs with
bounds stripped (bucket pruning only), plus wall time. Writes one JSON
line and BENCH/key_bounds_skipping.json.

Usage: python scripts/bench_point_lookup.py [n_events] [n_deltas]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from gobblin_spark.lakehouse import LakeTable  # noqa: E402
from gobblin_spark.lakehouse.merge import merge_lww_mor, point_lookup  # noqa: E402
from gobblin_spark.session import get_spark  # noqa: E402
from gobblin_spark.sources import generate_change_events  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
DELTAS = int(sys.argv[2]) if len(sys.argv) > 2 else 16
PROBES = 24


def main():
    import tempfile

    from pyspark.sql.types import (
        BooleanType, LongType, StringType, StructField, StructType,
    )

    spark = get_spark("bench-pl", parallelism=8, shuffle_partitions=8)
    d = tempfile.mkdtemp(prefix="bench_pl_")
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
    def build(name, batch_of):
        t = LakeTable.create(spark, os.path.join(d, name), schema,
                             ["repo", "path"], n_buckets=32)
        for i in range(DELTAS):
            merge_lww_mor(t, batch_of(i), ["repo", "path"], seq_col="seq")
        return t

    def measure(t):
        snap = t.snapshot()
        keys = [(r["repo"], r["path"]) for r in
                ev.select("repo", "path").distinct().limit(PROBES).collect()]

        def run(strip_bounds: bool):
            seen = []
            orig = LakeTable.read_file_set

            def spy(self, files, s=None):
                seen.append(len(files))
                return orig(self, files, s)

            if strip_bounds:
                for f in snap.files:
                    f.key_bounds = None
            LakeTable.read_file_set = spy
            t0 = time.time()
            try:
                for repo, path in keys:
                    point_lookup(t, {"repo": repo, "path": path}).collect()
            finally:
                LakeTable.read_file_set = orig
            return sum(seen) / len(seen), time.time() - t0

        fw, ww = run(strip_bounds=False)
        fo, wo = run(strip_bounds=True)   # strips AFTER the bounded pass
        return {
            "table_files": len(snap.files),
            "files_read_with_key_bounds": round(fw, 2),
            "files_read_bucket_pruning_only": round(fo, 2),
            "skip_ratio": round(1 - fw / fo, 3),
            "wall_sec_with": round(ww, 2),
            "wall_sec_without": round(wo, 2),
        }

    # regime 1 — uniform batches: every delta touches the whole key space,
    # so per-column [min,max] covers everything and skips ~nothing. This is
    # the honest null result: bounds pay off only with clustering.
    hi = ev.agg(F.max("seq")).first()[0]
    step = (hi + 1) // DELTAS + 1
    uniform = measure(build("t_uniform", lambda i: ev.filter(
        (F.col("seq") >= i * step) & (F.col("seq") < (i + 1) * step))))

    # regime 2 — clustered bursts (the CDC-realistic shape: a push updates
    # one repo/subtree at a time): each delta holds a narrow repo slice,
    # so its bounds exclude most probes.
    clustered = measure(build("t_clustered", lambda i: ev.filter(
        F.pmod(F.xxhash64("repo"), F.lit(DELTAS)) == i)))

    out = {
        "metric": "point_lookup_files_read_avg",
        "n_events": N, "n_delta_batches": DELTAS, "n_probes": PROBES,
        "uniform_batches": uniform,
        "clustered_bursts": clustered,
    }
    line = json.dumps(out)
    print(line)
    bench_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH")
    os.makedirs(bench_dir, exist_ok=True)
    with open(os.path.join(bench_dir, "key_bounds_skipping.json"), "w") as fh:
        fh.write(line + "\n")


if __name__ == "__main__":
    main()
