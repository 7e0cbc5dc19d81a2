"""State estimation: manifold pose ESKF + odometry fusion.

TPU-native equivalent of the reference's PoseESEKF / IKFoM stack
(/root/reference/include/rolo/eskf/) and TransformFusion
(/root/reference/src/lidarOdometry.cpp:47-323).
"""

from .eskf import (
    ESKFState,
    FutureRollout,
    init_filter,
    predict,
    process_measurement,
    state_predict,
    state_propagate,
    update_iterated,
)
from .fusion import (
    FusedPose,
    FusionState,
    FuturePrediction,
    fused_pose,
    init_fusion,
    on_front_odometry,
    on_mapping_odometry,
    predict_future,
)

__all__ = [
    "ESKFState",
    "FutureRollout",
    "init_filter",
    "predict",
    "process_measurement",
    "state_predict",
    "state_propagate",
    "update_iterated",
    "FusedPose",
    "FusionState",
    "FuturePrediction",
    "fused_pose",
    "init_fusion",
    "on_front_odometry",
    "on_mapping_odometry",
    "predict_future",
]
