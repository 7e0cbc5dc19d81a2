from .voxelmap import (
    VoxelMap,
    build_voxel_map,
    lookup,
    polar_coord,
    polar_origin,
    uniform_coord,
    hash_coord,
)
from .knn import knn_indices, estimate_covariances, regularize_covariance

__all__ = [
    "VoxelMap",
    "build_voxel_map",
    "lookup",
    "polar_coord",
    "polar_origin",
    "uniform_coord",
    "hash_coord",
    "knn_indices",
    "estimate_covariances",
    "regularize_covariance",
]
