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
        saved_bounds = [f.key_bounds for f in snap.files]

        def run(strip_bounds: bool):
            seen = []
            orig = LakeTable.read_file_set

            def spy(self, files, s=None):
                seen.append(len(files))
                return orig(self, files, s)

            for f, b in zip(snap.files, saved_bounds):
                f.key_bounds = None if strip_bounds else b
            LakeTable.read_file_set = spy
            t0 = time.time()
            try:
                for repo, path in keys:
                    point_lookup(t, {"repo": repo, "path": path},
                                 prefer_local=False).collect()
            finally:
                LakeTable.read_file_set = orig
                for f, b in zip(snap.files, saved_bounds):
                    f.key_bounds = b
            return sum(seen) / len(seen), time.time() - t0

        # ABAB alternation, best-of per arm: round 3's artifact showed a
        # 35% wall delta at IDENTICAL files-read in the uniform regime —
        # the bounded pass always ran first (cold) and the manifest-side
        # predicate is a microsecond Python loop, so order/supply was the
        # suspect. Alternating + min removes the ordering confound.
        walls_w, walls_o, files_w, files_o = [], [], [], []
        for _ in range(2):
            fw, ww = run(strip_bounds=False)
            fo, wo = run(strip_bounds=True)
            walls_w.append(ww); walls_o.append(wo)
            files_w.append(fw); files_o.append(fo)

        # the DEFAULT path: driver-side pyarrow read, zero Spark jobs
        from gobblin_spark.lakehouse.pointread import point_lookup_local
        point_lookup_local(t, {"repo": keys[0][0], "path": keys[0][1]})
        t0 = time.time()
        for repo, path in keys:
            point_lookup_local(t, {"repo": repo, "path": path})
        local_ms = (time.time() - t0) * 1000 / len(keys)

        return {
            "table_files": len(snap.files),
            "files_read_with_key_bounds": round(files_w[0], 2),
            "files_read_bucket_pruning_only": round(files_o[0], 2),
            "skip_ratio": round(1 - files_w[0] / files_o[0], 3),
            "wall_sec_with": round(min(walls_w), 2),
            "wall_sec_without": round(min(walls_o), 2),
            "wall_sec_with_reps": [round(w, 2) for w in walls_w],
            "wall_sec_without_reps": [round(w, 2) for w in walls_o],
            "local_path_ms_per_key": round(local_ms, 1),
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
    lat = {
        "metric": "point_lookup_ms_per_key",
        "n_events": N, "n_delta_batches": DELTAS, "n_probes": PROBES,
        "local_uniform_ms": uniform["local_path_ms_per_key"],
        "local_clustered_ms": clustered["local_path_ms_per_key"],
        "spark_uniform_ms": round(
            uniform["wall_sec_with"] * 1000 / PROBES, 1),
        "spark_clustered_ms": round(
            clustered["wall_sec_with"] * 1000 / PROBES, 1),
        "note": "local = driver-side pyarrow read (the point_lookup "
                "default for the row dialect), zero Spark jobs; spark = "
                "distributed path (prefer_local=False), the fallback for "
                "patch/cell dialects and oversized candidate sets",
    }
    with open(os.path.join(bench_dir, "point_lookup_latency.json"),
              "w") as fh:
        fh.write(json.dumps(lat) + "\n")


if __name__ == "__main__":
    main()
