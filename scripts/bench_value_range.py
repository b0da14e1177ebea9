"""Micro-bench: per-file [min,max] value-bounds skipping for RANGE
predicates (the sibling of bench_value_stats.py's equality blooms).

Builds a compacted CDC table with stats on an integer `size` column whose
values CLUSTER by ingest batch (the realistic shape: monotone-ish columns
— sizes, timestamps, offsets — correlate with arrival order, so per-file
ranges are narrow slices of the global range). Measures, for selective /
mid / full-range intervals: files planned + wall WITH bounds vs with the
bounds stripped from the manifest (full scan + row filter), ABAB
alternated. Writes BENCH/value_range_skipping.json.

Usage: python scripts/bench_value_range.py [n_keys_per_batch] [n_batches]
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gobblin_spark.lakehouse import LakeTable  # noqa: E402
from gobblin_spark.lakehouse.merge import read_current  # noqa: E402
from gobblin_spark.session import get_spark  # noqa: E402

N_KEYS = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
BATCHES = int(sys.argv[2]) if len(sys.argv) > 2 else 8


def main():
    import pyspark.sql.functions as F
    from pyspark.sql.types import (
        BooleanType, LongType, StringType, StructField, StructType,
    )

    spark = get_spark("bench-vr", parallelism=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    d = tempfile.mkdtemp(prefix="bench_vr_")
    schema = StructType([
        StructField("repo", StringType()), StructField("path", StringType()),
        StructField("size", LongType()),
        StructField("__seq", LongType()),
        StructField("__deleted", BooleanType()),
    ])
    t = LakeTable.create(spark, os.path.join(d, "t"), schema,
                         ["repo", "path"], n_buckets=16,
                         key_cols=["repo", "path"], stats_cols=["size"])
    # control twin: identical data, NO stats (manifest-shard reuse makes
    # stripping bounds from the same table a no-op — commit reuses the
    # untouched shard files byte-for-byte)
    t2 = LakeTable.create(spark, os.path.join(d, "t2"), schema,
                          ["repo", "path"], n_buckets=16,
                          key_cols=["repo", "path"])
    # batch b appends keys with size in [b*1000, b*1000+999]: per-append
    # file bounds are narrow slices (the time-correlated column shape)
    for b in range(BATCHES):
        df = (spark.range(N_KEYS)
              .select(F.concat(F.lit("r"), (F.col("id") % 64)
                               .cast("string")).alias("repo"),
                      F.concat(F.lit(f"b{b}_p"),
                               F.col("id").cast("string")).alias("path"),
                      (F.lit(b * 1000)
                       + F.pmod(F.xxhash64("id", F.lit(b)), F.lit(1000))
                       ).alias("size"),
                      (F.lit(b * N_KEYS) + F.col("id")).alias("__seq"),
                      F.lit(False).alias("__deleted")))
        t.append(df, seq_col="__seq")
        t2.append(df, seq_col="__seq")

    snap = t.snapshot()
    n_files = len(snap.files)
    planned = []
    orig = LakeTable.read_file_set

    def spy(self, files, s=None):
        planned.append(len(files))
        return orig(self, files, s)

    def timed_read(tbl, iv):
        t0 = time.time()
        n = read_current(tbl, value_range=iv).count()
        return round(time.time() - t0, 3), planned[-1], n

    intervals = {
        "one_batch": {"size": {"lo": 2000, "hi": 2999,
                               "lo_strict": False, "hi_strict": False}},
        "half_range": {"size": {"lo": BATCHES * 1000 // 2, "hi": None,
                                "lo_strict": False, "hi_strict": False}},
        "full_range": {"size": {"lo": 0, "hi": None,
                                "lo_strict": False, "hi_strict": False}},
    }
    assert all(f.value_bounds for f in t.snapshot().files)
    assert not any(f.value_bounds for f in t2.snapshot().files)

    LakeTable.read_file_set = spy
    out = {"n_files": n_files, "rows": sum(f.rows for f in snap.files),
           "batches": BATCHES, "intervals": {}}
    try:
        for name, iv in intervals.items():
            rec = {}
            for _ in range(2):  # ABAB, keep best wall per arm
                wb, fb, nb = timed_read(t, iv)
                ws, fs_, ns = timed_read(t2, iv)
                assert nb == ns, (name, nb, ns)
                rec.setdefault("rows", nb)
                rec["files_planned_bounded"] = fb
                rec["files_planned_stripped"] = fs_
                rec["wall_bounded"] = min(rec.get("wall_bounded", 99), wb)
                rec["wall_stripped"] = min(rec.get("wall_stripped", 99), ws)
            rec["files_skipped_frac"] = round(1 - rec[
                "files_planned_bounded"] / rec["files_planned_stripped"], 3)
            out["intervals"][name] = rec
    finally:
        LakeTable.read_file_set = orig

    js = json.dumps(out, indent=1)
    print(js)
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH",
            "value_range_skipping.json"), "w") as f:
        f.write(js + "\n")


if __name__ == "__main__":
    main()
