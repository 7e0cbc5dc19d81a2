"""Synthetic LiDAR world: raycast scan generation with exact ground truth.

The reference's system-level test strategy is replaying a recorded rosbag
through the full launch graph (/root/reference/README.md:44-52, SURVEY.md
section 4); its 8.9 GB test bag is an external download and no public
dataset ships in either repo. This package supplies the equivalent fixture
generatively: a deterministic raycast simulator of a ground vehicle driving
a spinning multi-beam LiDAR through uneven terrain with structures —
ROLO-SLAM's headline domain — producing scans with per-point ring/time
fields, motion distortion, sensor noise, and an exact ground-truth
trajectory for ATE scoring (the TUM oracle, backMapping.cpp:2679-2699).
"""

from .scene import Scene, default_scene, loop_trajectory_pose
from .lidar import LidarModel, simulate_scan
from .dataset import SimConfig, generate_sequence, ground_map_points

__all__ = [
    "Scene",
    "default_scene",
    "loop_trajectory_pose",
    "LidarModel",
    "simulate_scan",
    "SimConfig",
    "generate_sequence",
    "ground_map_points",
]
