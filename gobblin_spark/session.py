"""SparkSession factory with scale-oriented defaults.

Defaults chosen for the 100TB design point (AQE on, skew-join handling on,
Arrow transfer on) while remaining correct on local[N].
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "gobblin-spark",
    parallelism: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    parallelism: local core count (``local[p]``). Defaults to
    ``$SPARK_GRAFT_CPUS`` or ``*``. On a real cluster this builder is not
    used — ``spark-submit --py-files`` provides the session master.
    """
    if parallelism is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
    else:
        master = f"local[{parallelism}]"
    if shuffle_partitions is None:
        cores = os.cpu_count() or 8
        if parallelism:
            cores = parallelism
        shuffle_partitions = max(8, cores)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime re-plan, coalesce tiny shuffle partitions, split skew.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for all pandas/Arrow UDF exchange (input_hint mandate).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # Keep partition sizes bounded at scale.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.autoBroadcastJoinThreshold", "67108864")
        # zstd for data files AND shuffle/spill blocks: a CDC apply's cost
        # is dominated by bytes moved (scan + shuffle + write of the
        # payload), so trading CPU for bytes raises events/sec/core on any
        # IO- or network-bound cluster. ~30-40% smaller than the snappy/lz4
        # defaults on text-heavy payloads, at a compression speed that
        # stays off the critical path.
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.io.compression.codec", "zstd")
        .config("spark.io.compression.zstd.level", "1")
        # Quieter, faster local runs.
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    # Shuffle/spill scratch: benches set GOBBLIN_LOCAL_DIR to tmpfs so a
    # single VM disk doesn't masquerade as the cluster's aggregate IO.
    local_dir = os.environ.get("GOBBLIN_LOCAL_DIR")
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
