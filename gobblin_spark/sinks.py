"""Format writers: staging→publish file sinks beyond the lakehouse table.

≙ the reference's writer family — FsDataWriter's staging-then-commit move
(gobblin-core/src/main/java/gobblin/writer/FsDataWriter.java:165-186),
AvroHdfsDataWriter, the fork's AvroToOrcDataWriter, text writers, and
AvroKafkaDataWriter (kafka sink). Spark-first: each format is a native
DataFrameWriter (JVM, columnar, parallel); this module adds the two-phase
publish semantics — write into a hidden staging dir, then one atomic
directory rename into the final location — so readers never observe a
partial output and a crashed write leaves only an invisible staging dir.

Formats:
- parquet / orc / json / csv / text — Spark built-ins, always available.
- avro — requires the external spark-avro package (not bundled in pip
  pyspark); ``write_files(fmt="avro")`` raises a clear error when absent.
- kafka — requires the spark-sql-kafka package; ``kafka_sink`` builds the
  (key, value) projection and raises at write time if the connector is
  absent.
"""

from __future__ import annotations

import os
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

BUILTIN_FORMATS = {"parquet", "orc", "json", "csv", "text"}
GATED_FORMATS = {
    "avro": "spark-avro (org.apache.spark:spark-avro) is not on the "
            "classpath in this environment; add it via --packages",
    "kafka": "spark-sql-kafka (org.apache.spark:spark-sql-kafka-0-10) is "
             "not on the classpath; add it via --packages",
}


class FormatUnavailable(RuntimeError):
    pass


def write_files(
    df: DataFrame,
    out_dir: str,
    fmt: str = "parquet",
    mode: str = "errorifexists",
    partition_by: list[str] | None = None,
    options: dict[str, str] | None = None,
) -> str:
    """Two-phase publish: write to ``<parent>/.staging-<uuid>``, then one
    atomic rename to ``out_dir`` (≙ FsDataWriter staging commit +
    BaseDataPublisher final move). Returns the published path.

    mode="overwrite" replaces an existing out_dir atomically-enough for a
    single publisher (rename old away, rename staging in, delete old);
    default refuses to clobber.
    """
    parent = os.path.dirname(os.path.abspath(out_dir)) or "."
    os.makedirs(parent, exist_ok=True)
    staging = os.path.join(parent, f".staging-{uuid.uuid4().hex}")
    w = df.write.format(fmt).mode("overwrite")
    for k, v in (options or {}).items():
        w = w.option(k, v)
    if partition_by:
        w = w.partitionBy(*partition_by)
    try:
        w.save(staging)
    except Exception as exc:
        # gated connectors (avro/kafka) surface as missing-data-source
        # analysis errors when the package jar is absent
        if fmt in GATED_FORMATS and "Failed to find data source" in str(exc):
            raise FormatUnavailable(GATED_FORMATS[fmt]) from exc
        raise
    if os.path.exists(out_dir):
        if mode != "overwrite":
            import shutil

            shutil.rmtree(staging, ignore_errors=True)
            raise FileExistsError(out_dir)
        # READER CONTRACT: the two renames leave a brief window where
        # out_dir is absent — a concurrent reader must either list-then-read
        # with retry or coordinate externally. Single-publisher directories
        # (this engine's usage) never hit it; readers needing snapshot
        # isolation should consume a LakeTable (manifest-pinned file sets)
        # instead of a raw directory sink.
        old = os.path.join(parent, f".old-{uuid.uuid4().hex}")
        os.rename(out_dir, old)
        os.rename(staging, out_dir)
        import shutil

        shutil.rmtree(old, ignore_errors=True)
    else:
        os.rename(staging, out_dir)
    return out_dir


def text_lines(df: DataFrame, column: str) -> DataFrame:
    """Project one string column into the text writer's required shape
    (single 'value' column) — ≙ the reference's SimpleDataWriter writing
    raw record bytes per line."""
    return df.select(F.col(column).cast("string").alias("value"))


def kafka_sink(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    key_cols: list[str] | None = None,
):
    """Build the Kafka-sink write: rows serialized to JSON values with an
    optional concatenated key (≙ fork's AvroKafkaDataWriter publishing
    records to a topic). Returns the configured DataFrameWriter; .save()
    raises FormatUnavailable if the connector jar is absent."""
    cols = []
    if key_cols:
        cols.append(F.concat_ws("|", *[F.col(c).cast("string")
                                       for c in key_cols]).alias("key"))
    payload = [c for c in df.columns]
    cols.append(F.to_json(F.struct(*payload)).alias("value"))
    out = df.select(*cols)
    return (
        out.write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
    )
