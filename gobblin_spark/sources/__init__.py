from gobblin_spark.sources.change_events import (
    generate_change_events,
    generate_repo_table,
    EVENT_SCHEMA_FIELDS,
)
from gobblin_spark.sources.filebased import FileDiffSource, FilePlan

__all__ = [
    "generate_change_events",
    "generate_repo_table",
    "EVENT_SCHEMA_FIELDS",
    "FileDiffSource",
    "FilePlan",
]
