"""Odometry fusion: back-end mapping odometry x front-end incremental
odometry through the pose ESKF, plus the future-pose rollout.

Re-design of TransformFusion (/root/reference/src/lidarOdometry.cpp:47-323).
The reference runs this as 20 Hz / 30 Hz ROS timers over message queues;
here the pipeline is synchronous per scan, so the queue bookkeeping
collapses: the caller reports (a) each new front-end odometry pose (feeds
the filter, lidarOdometryHandler + fusionTimerHandler :137-184), (b) each
new back-end mapping pose together with the front-end pose at that scan
(mappingOdometryHandler :110-117 + the queue trim :149-155), and reads the
fused pose mapping o (front_anchor^-1 o filtered_now) (:193-198).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import FilterConfig
from ..geometry.se3 import SE3
from . import eskf


class FusionState(NamedTuple):
    filter: eskf.ESKFState
    # lidarOdomAffineFront: front-end pose at the latest mapping update
    front_rot: jnp.ndarray  # [3, 3]
    front_trans: jnp.ndarray  # [3]
    # mappingOdomAffine
    mapping_rot: jnp.ndarray  # [3, 3]
    mapping_trans: jnp.ndarray  # [3]
    has_mapping: jnp.ndarray  # [] bool (mappingOdomTime != -1)


def init_fusion(cfg: FilterConfig = FilterConfig(), dtype=jnp.float32) -> FusionState:
    return FusionState(
        filter=eskf.init_filter(cfg, dtype),
        front_rot=jnp.eye(3, dtype=dtype),
        front_trans=jnp.zeros(3, dtype),
        mapping_rot=jnp.eye(3, dtype=dtype),
        mapping_trans=jnp.zeros(3, dtype),
        has_mapping=jnp.asarray(False),
    )


@partial(jax.jit, static_argnames=("cfg",))
def on_front_odometry(
    state: FusionState,
    stamp: jnp.ndarray,
    rot: jnp.ndarray,
    trans: jnp.ndarray,
    cfg: FilterConfig = FilterConfig(),
) -> Tuple[FusionState, jnp.ndarray]:
    """Feed one front-end odometry pose into the regulator filter
    (fusionTimerHandler measurement path, lidarOdometry.cpp:166-184)."""
    f, ok = eskf.process_measurement(state.filter, stamp, trans, rot, cfg)
    return state._replace(filter=f), ok


def on_mapping_odometry(
    state: FusionState,
    mapping_rot: jnp.ndarray,
    mapping_trans: jnp.ndarray,
    front_rot: jnp.ndarray,
    front_trans: jnp.ndarray,
) -> FusionState:
    """Record a back-end mapping pose and the front-end pose of the same
    scan (mappingOdometryHandler :110-117; the queue scan at :149-155 pairs
    mapping time with the first front-end odom after it)."""
    return state._replace(
        mapping_rot=mapping_rot,
        mapping_trans=mapping_trans,
        front_rot=front_rot,
        front_trans=front_trans,
        has_mapping=jnp.asarray(True),
    )


class FusedPose(NamedTuple):
    rot: jnp.ndarray  # [3, 3]
    trans: jnp.ndarray  # [3]
    velocity: jnp.ndarray  # [3]
    speed: jnp.ndarray  # []
    valid: jnp.ndarray  # [] bool


@partial(jax.jit, static_argnames=("cfg",))
def fused_pose(
    state: FusionState,
    stamp: jnp.ndarray,
    cfg: FilterConfig = FilterConfig(),
) -> FusedPose:
    """fusionTimerHandler publication path (lidarOdometry.cpp:186-249):
    dead-reckon a *copy* of the filter to `stamp`, then compose
    mapping o (front_anchor^-1 o filtered_now). The filter itself is not
    advanced (pose_preview copy, :186-188)."""
    preview, _ = eskf.state_predict(state.filter, stamp, cfg)
    now = SE3(preview.rot, preview.pos)
    front = SE3(state.front_rot, state.front_trans)
    mapping = SE3(state.mapping_rot, state.mapping_trans)
    incre = front.inverse().compose(now)
    fused = mapping.compose(incre)
    valid = state.has_mapping & state.filter.initialized
    return FusedPose(
        rot=fused.rot,
        trans=fused.trans,
        velocity=preview.vel,
        speed=jnp.linalg.norm(preview.vel),
        valid=valid,
    )


class FuturePrediction(NamedTuple):
    """predictTimerHandler output (lidarOdometry.cpp:252-322): the future
    path in the CURRENT lidar frame (z zeroed for path points, :290) and
    the final future pose consumed by the prior stack."""

    local_pos: jnp.ndarray  # [M, 3]
    local_quat: jnp.ndarray  # [M, 4] (w, x, y, z)
    mask: jnp.ndarray  # [M]
    final_pos: jnp.ndarray  # [3] last valid local pose
    final_quat: jnp.ndarray  # [4]
    local_velocity: jnp.ndarray  # [3]
    heading_rate: jnp.ndarray  # []
    valid: jnp.ndarray  # [] bool


@partial(jax.jit, static_argnames=("cfg",))
def predict_future(
    state: FusionState, cfg: FilterConfig = FilterConfig()
) -> FuturePrediction:
    """Roll the filter mean forward (statePropagate) and express every
    future pose relative to the current filter pose
    (lidarOdometry.cpp:270-316)."""
    from ..geometry import so3

    roll = eskf.state_propagate(state.filter, cfg)
    cur = SE3(state.filter.rot, state.filter.pos)
    cur_inv = cur.inverse()

    rots = jax.vmap(so3.quat_to_matrix)(roll.quat)
    local = jax.vmap(lambda r, t: cur_inv.compose(SE3(r, t)))(rots, roll.pos)
    local_quat = jax.vmap(so3.matrix_to_quat)(local.rot)
    local_pos = local.trans.at[:, 2].set(0.0)  # z zeroed (:290)

    fi = roll.final_index
    return FuturePrediction(
        local_pos=local_pos,
        local_quat=local_quat,
        mask=roll.mask,
        final_pos=local_pos[fi],
        final_quat=local_quat[fi],
        local_velocity=cur.rot.T @ state.filter.vel,
        heading_rate=state.filter.omega[2],
        valid=state.filter.initialized & jnp.any(roll.mask),
    )
