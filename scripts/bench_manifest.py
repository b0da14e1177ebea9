"""Manifest-sharding benchmark: commit cost vs live-file count.

Builds a table up to N live files via metadata-only commits, then measures
a single-file append commit at increasing table sizes. Under sharded
manifests the bytes written per commit stay O(delta + table/_MAX_SHARDS);
under the legacy inline manifest they were O(live files). Run:

    python scripts/bench_manifest.py [N ...]
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.types import LongType, StringType, StructField, StructType

from gobblin_spark.fsio import LocalFs
from gobblin_spark.lakehouse.table import DataFile, LakeTable
from gobblin_spark.session import get_spark


class MeteredFs(LocalFs):
    def __init__(self):
        self.bytes_published = 0
        self.publishes = 0

    def publish_if_absent(self, content, target):
        self.bytes_published += len(content)
        self.publishes += 1
        return super().publish_if_absent(content, target)

    def reset(self):
        self.bytes_published = 0
        self.publishes = 0


def one_file(i):
    return DataFile(path=f"data/x/{i}.parquet", bucket=i % 32, rows=1000,
                    bytes=1 << 20, schema_version=1, min_seq=i * 1000,
                    max_seq=i * 1000 + 999, has_tombstones=False)


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [1000, 5000, 10000]
    spark = get_spark("bench_manifest", parallelism=4, shuffle_partitions=4)
    schema = StructType([StructField("k", StringType()),
                         StructField("v", LongType())])
    fs = MeteredFs()
    root = tempfile.mkdtemp(prefix="bench_manifest_")
    t = LakeTable.create(spark, os.path.join(root, "t"), schema, ["k"],
                         n_buckets=32, fs=fs)
    points = []
    n_live = 0
    next_id = 0
    for target in sorted(sizes):
        # grow to target in 500-file batches (bounded shard count en route)
        while n_live < target:
            batch = min(500, target - n_live)
            snap = t.snapshot()
            t.commit(keep_files=snap.files,
                     add_files=[one_file(next_id + j) for j in range(batch)],
                     expected_version=snap.version)
            next_id += batch
            n_live += batch
        # measure: 5 single-file append commits at this table size
        fs.reset()
        t0 = time.perf_counter()
        for _ in range(5):
            snap = t.snapshot()
            t.commit(keep_files=snap.files, add_files=[one_file(next_id)],
                     expected_version=snap.version)
            next_id += 1
            n_live += 1
        wall = time.perf_counter() - t0
        snap = t.snapshot()
        inline_estimate = len(json.dumps(snap.to_json()).encode()) + sum(
            len(json.dumps([f.to_json() for f in fl]).encode())
            for _, fl in snap.shard_map or [])
        points.append({
            "live_files": n_live,
            "commit_ms_avg": round(wall / 5 * 1000, 2),
            "bytes_per_commit": fs.bytes_published // 5,
            "publishes_per_commit": fs.publishes / 5,
            "shards": len(snap.shard_refs or []),
            "full_manifest_bytes": inline_estimate,
        })
    flat = (points[-1]["bytes_per_commit"] /
            max(1, points[0]["bytes_per_commit"]))
    out = {
        "metric": "manifest_commit_cost_vs_live_files",
        "points": points,
        "bytes_growth_last_over_first": round(flat, 3),
        "o_delta": flat < 3.0,
    }
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH", "manifest_scaling.json"),
            "w") as fh:
        json.dump(out, fh, indent=2)


if __name__ == "__main__":
    main()
