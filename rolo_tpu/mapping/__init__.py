from .keyframes import (
    KeyframeDB,
    init_db,
    add_keyframe,
    should_add_keyframe,
    update_poses,
    extract_submap,
)
from .scan2map import (
    FactorSet,
    Scan2MapResult,
    corner_factors,
    surf_factors,
    scan2map_optimize,
    constrain_transform,
)

__all__ = [
    "KeyframeDB",
    "init_db",
    "add_keyframe",
    "should_add_keyframe",
    "update_poses",
    "extract_submap",
    "FactorSet",
    "Scan2MapResult",
    "corner_factors",
    "surf_factors",
    "scan2map_optimize",
    "constrain_transform",
]
