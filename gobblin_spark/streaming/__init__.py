from gobblin_spark.streaming.ingest import stream_ingest  # noqa: F401
