"""Pod-scale batched entry points: registrations, odometry sequences,
pose-graph solves, and prior solves over a device mesh.

This is the workload BASELINE.md sets as the scaling target ("thousands of
concurrent scan-pair registrations / pose-graph relinearizations sharded
with pjit over a mesh"). Each function is jit(vmap(kernel)) with batch
shardings: XLA partitions the batch across the mesh, every instance runs
the identical masked program (LM while-loops run until ALL lanes in a
device's shard converge), and cross-device reductions only appear in the
summary statistics — so scaling is embarrassingly parallel and efficiency
is bounded by compile-once + dispatch overheads, not collectives.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..config import PriorConfig, RegistrationConfig
from ..frontend.odometry import OdometryOutput, run_sequence
from ..prior.ground import GroundMap
from ..prior.vehicle import SolverResult, VehicleModel, solve_pose
from ..registration.rotgicp import ScanPairResult, register_scan_pair
from .mesh import batch_sharding, replicated, shard_batch


@partial(jax.jit, static_argnames=("cfg", "voxel_capacity", "k"))
def registration_batch(
    src_xyz: jnp.ndarray,  # [B, N, 3]
    src_mask: jnp.ndarray,  # [B, N]
    tgt_xyz: jnp.ndarray,
    tgt_mask: jnp.ndarray,
    init_translation: jnp.ndarray,  # [B, 3]
    last_translation: jnp.ndarray,  # [B, 3]
    interval_tn: jnp.ndarray,  # [B]
    interval_tn_1: jnp.ndarray,  # [B]
    cfg: RegistrationConfig = RegistrationConfig(),
    voxel_capacity: int = 8192,
    k: int = 20,
) -> ScanPairResult:
    """vmapped rot-GICP scan-pair registration. Shard inputs with
    shard_batch(...) to split the batch over a mesh."""
    return jax.vmap(
        lambda s, sm, t, tm, g, l, dn, dn1: register_scan_pair(
            s, sm, t, tm, g, l, dn, dn1, cfg, voxel_capacity, k
        )
    )(src_xyz, src_mask, tgt_xyz, tgt_mask, init_translation, last_translation,
      interval_tn, interval_tn_1)


@partial(jax.jit, static_argnames=("cfg", "voxel_capacity", "k"))
def odometry_batch(
    feats_xyz: jnp.ndarray,  # [B, T, N, 3]
    feats_mask: jnp.ndarray,  # [B, T, N]
    intervals: jnp.ndarray,  # [B, T]
    cfg: RegistrationConfig = RegistrationConfig(),
    voxel_capacity: int = 8192,
    k: int = 20,
) -> OdometryOutput:
    """Many front-end odometry sequences at once: lax.scan over time inside
    each instance, vmap over sequences — the sequential per-scan feedback
    (SURVEY.md "hard parts") stays inside a lane while the batch axis
    shards freely."""
    return jax.vmap(
        lambda x, m, dt: run_sequence(x, m, dt, cfg, voxel_capacity, k)
    )(feats_xyz, feats_mask, intervals)


@partial(jax.jit, static_argnames=("cfg",))
def prior_solve_batch(
    gm: GroundMap,
    vehicle: VehicleModel,
    x: jnp.ndarray,  # [B]
    y: jnp.ndarray,  # [B]
    yaw: jnp.ndarray,  # [B]
    cfg: PriorConfig = PriorConfig(),
) -> SolverResult:
    """Batched wheel-contact pose solves against one shared ground map
    (replicate gm, shard the queries)."""
    return jax.vmap(lambda xi, yi, yawi: solve_pose(gm, vehicle, xi, yi, yawi, cfg))(x, y, yaw)


class ShardedRegistrationInputs(NamedTuple):
    src_xyz: jnp.ndarray
    src_mask: jnp.ndarray
    tgt_xyz: jnp.ndarray
    tgt_mask: jnp.ndarray
    init_translation: jnp.ndarray
    last_translation: jnp.ndarray
    interval_tn: jnp.ndarray
    interval_tn_1: jnp.ndarray


def shard_registration_inputs(
    mesh: Mesh,
    src_xyz,
    src_mask,
    tgt_xyz,
    tgt_mask,
    init_translation=None,
    last_translation=None,
    interval: float = 0.1,
    axis_name: str = "batch",
) -> ShardedRegistrationInputs:
    """Place a registration batch on a mesh (batch axis 0 sharded)."""
    b = src_xyz.shape[0]
    dtype = src_xyz.dtype
    if init_translation is None:
        init_translation = jnp.zeros((b, 3), dtype)
    if last_translation is None:
        last_translation = jnp.zeros((b, 3), dtype)
    dt = jnp.full((b,), interval, dtype)
    tree = ShardedRegistrationInputs(
        src_xyz, src_mask, tgt_xyz, tgt_mask,
        init_translation, last_translation, dt, dt,
    )
    return shard_batch(tree, mesh, axis_name)
