from .factors import (
    BetweenFactors,
    PoseGraph,
    empty_between,
    empty_graph,
    add_between,
    FIRST_PRIOR_VARIANCES,
    ODOM_VARIANCES,
)
from .solver import GraphSolution, solve_pose_graph

__all__ = [
    "BetweenFactors",
    "PoseGraph",
    "empty_between",
    "empty_graph",
    "add_between",
    "FIRST_PRIOR_VARIANCES",
    "ODOM_VARIANCES",
    "GraphSolution",
    "solve_pose_graph",
]
