from gobblin_spark.state.store import StateStore, WorkUnitState

__all__ = ["StateStore", "WorkUnitState"]
