from gobblin_spark.plans.planner import (
    BatchPlan,
    Planner,
    WorkUnit,
    bin_pack_wfd,
)

__all__ = ["Planner", "WorkUnit", "BatchPlan", "bin_pack_wfd"]
