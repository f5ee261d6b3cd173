from ptgnn_tpu.ops.pallas.segment_kernels import (
    AggregationPlan,
    adjacency_segment_reduce,
    build_aggregation_plan,
    plan_from_adjacency,
    plan_num_tiles,
    planned_segment_reduce,
)

__all__ = [
    "AggregationPlan",
    "adjacency_segment_reduce",
    "build_aggregation_plan",
    "plan_from_adjacency",
    "plan_num_tiles",
    "planned_segment_reduce",
]
