from gobblin_spark.lakehouse.table import (
    ConcurrentCommitError,
    LakeTable,
    Snapshot,
)
from gobblin_spark.lakehouse.merge import merge_lww

__all__ = ["LakeTable", "Snapshot", "ConcurrentCommitError", "merge_lww"]
