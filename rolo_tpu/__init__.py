"""rolo_tpu: a TPU-native LiDAR odometry / SLAM engine.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of ROLO-SLAM
(reference at /root/reference): rotation-optimized rot-GICP front-end,
scan-to-submap back-end, scan-context loop closure, ground-contact priors,
pose-graph optimization, and a pose ESKF — implemented as pure functions over
fixed-shape arrays, batched and sharded with pjit over device meshes.
"""

from .config import RoloConfig, load_config

__version__ = "0.1.0"
__all__ = ["RoloConfig", "load_config", "__version__"]
