from usip_tpu.ops.geometry import (
    apply_se3,
    gather_points,
    knn,
    pairwise_dist,
    pairwise_sqdist,
    safe_sqrt,
)
from usip_tpu.ops.grouping import (
    BallQueryResult,
    NodeAssignment,
    assign_points_to_nodes,
    ball_query,
)
from usip_tpu.ops.sampling import (
    farthest_point_sampling,
    random_subset,
    sample_nodes,
)
from usip_tpu.ops.segment import (
    masked_scatter_max,
    scatter_back,
    segment_mean_count,
)

__all__ = [
    "apply_se3",
    "gather_points",
    "knn",
    "pairwise_dist",
    "pairwise_sqdist",
    "safe_sqrt",
    "BallQueryResult",
    "NodeAssignment",
    "assign_points_to_nodes",
    "ball_query",
    "farthest_point_sampling",
    "random_subset",
    "sample_nodes",
    "masked_scatter_max",
    "scatter_back",
    "segment_mean_count",
]
