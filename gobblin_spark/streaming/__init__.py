from gobblin_spark.streaming.ingest import (  # noqa: F401
    kafka_stream_source,
    stream_ingest,
)
