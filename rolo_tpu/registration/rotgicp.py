"""Top-level rot-GICP registration: the TPU equivalent of
fast_gicp::RotVGICP driven the way LidarOdometry::scanRegeistration drives it
(/root/reference/src/lidarOdometry.cpp:448-501):

  1. per-point covariances for source and target (kNN + PLANE),
  2. polar voxel map over the target features,
  3. SO(3)-only LM rotation registration from identity,
  4. continuous-time translation NLS reusing the rotation-stage
     correspondences.

All steps are jit-compatible; `jax.vmap(register_scan_pair_*)` batches
thousands of scan pairs across a mesh.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import RegistrationConfig
from ..voxel.knn import estimate_cov6
from ..voxel.voxelmap import build_voxel_map
from . import gicp, lm


class ScanPairResult(NamedTuple):
    """Result of one scan-pair registration.

    rot: [3,3] rotation estimate (maps source frame -> target frame);
    trans: [3] translation including the CT correction;
    """

    rot: jnp.ndarray
    trans: jnp.ndarray
    rot_error: jnp.ndarray
    ct_error: jnp.ndarray
    rot_iterations: jnp.ndarray
    ct_iterations: jnp.ndarray
    converged: jnp.ndarray


@partial(
    jax.jit,
    static_argnames=("cfg", "voxel_capacity", "k"),
)
def register_scan_pair(
    src_xyz: jnp.ndarray,
    src_mask: jnp.ndarray,
    tgt_xyz: jnp.ndarray,
    tgt_mask: jnp.ndarray,
    init_translation: jnp.ndarray,
    last_translation: jnp.ndarray,
    interval_tn: jnp.ndarray,
    interval_tn_1: jnp.ndarray,
    cfg: RegistrationConfig = RegistrationConfig(),
    voxel_capacity: int = 8192,
    k: int = 20,
) -> ScanPairResult:
    """Register source features against target features.

    Mirrors scanRegeistration: `src_xyz` must already be translated by the
    forward-predicted translation (`init_translation` = that prediction,
    lidarOdometry.cpp:459); rotation is solved about the sensor origin with
    polar voxel binning, then the translation correction is solved with the
    velocity-continuity regularizer. Returned trans = init + ct correction
    (lidarOdometry.cpp:500: Translation += Reg_translation).
    """
    dtype = src_xyz.dtype
    src_cov = estimate_cov6(src_xyz, src_mask, k=k, method=cfg.regularization)
    tgt_cov = estimate_cov6(tgt_xyz, tgt_mask, k=k, method=cfg.regularization)

    polar_res = (
        jnp.asarray(cfg.polar_resolution, dtype) if cfg.voxel_type == "polar" else None
    )
    vmap = build_voxel_map(
        tgt_xyz,
        tgt_cov,
        tgt_mask,
        voxel_capacity,
        polar_res=polar_res,
        resolution=cfg.voxel_resolution,
    )
    ctx = gicp.make_context(
        src_xyz,
        src_mask,
        src_cov,
        vmap,
        polar_res=polar_res,
        resolution=cfg.voxel_resolution,
        neighbor_search=cfg.neighbor_search,
    )

    rot_res = lm.lm_register_rotation(
        ctx,
        jnp.eye(3, dtype=dtype),
        jnp.zeros(3, dtype=dtype),
        max_outer=cfg.max_outer_iterations,
        max_inner=cfg.lm_max_inner_iterations,
        rot_eps=cfg.rotation_epsilon,
        trans_eps=cfg.transformation_epsilon,
        init_lambda_factor=cfg.lm_init_lambda_factor,
    )

    # Translation stage: correspondences bound at the final rotation state,
    # rebound between rounds (lm_translation_rebind; rounds=1 == reference).
    ct_res = lm.lm_translation_rebind(
        ctx,
        rot_res.rot,
        jnp.zeros(3, dtype=dtype),
        init_translation,
        last_translation,
        interval_tn,
        interval_tn_1,
        cfg.ct_lambda,
        rebind_rounds=cfg.ct_rebind_rounds,
        max_outer=cfg.max_outer_iterations,
        max_inner=cfg.lm_max_inner_iterations,
        trans_eps=cfg.transformation_epsilon,
        init_lambda_factor=cfg.lm_init_lambda_factor,
    )

    return ScanPairResult(
        rot=rot_res.rot,
        trans=init_translation + ct_res.trans,
        rot_error=rot_res.error,
        ct_error=ct_res.error,
        rot_iterations=rot_res.iterations,
        ct_iterations=ct_res.iterations,
        converged=rot_res.converged & ct_res.converged,
    )


@partial(jax.jit, static_argnames=("cfg", "voxel_capacity", "k"))
def register_se3(
    src_xyz: jnp.ndarray,
    src_mask: jnp.ndarray,
    tgt_xyz: jnp.ndarray,
    tgt_mask: jnp.ndarray,
    init_rot: jnp.ndarray,
    init_trans: jnp.ndarray,
    cfg: RegistrationConfig = RegistrationConfig(),
    voxel_capacity: int = 8192,
    k: int = 20,
) -> lm.LMResult:
    """Full SE(3) VGICP alignment (optimizer type LevenbergMarquardt,
    lsq_registration_impl.hpp:225-270) — used for loop-closure submap
    verification and as a general-purpose registration primitive."""
    src_cov = estimate_cov6(src_xyz, src_mask, k=k, method=cfg.regularization)
    tgt_cov = estimate_cov6(tgt_xyz, tgt_mask, k=k, method=cfg.regularization)
    polar_res = (
        jnp.asarray(cfg.polar_resolution, src_xyz.dtype)
        if cfg.voxel_type == "polar"
        else None
    )
    vmap = build_voxel_map(
        tgt_xyz, tgt_cov, tgt_mask, voxel_capacity,
        polar_res=polar_res, resolution=cfg.voxel_resolution,
    )
    ctx = gicp.make_context(
        src_xyz, src_mask, src_cov, vmap,
        polar_res=polar_res, resolution=cfg.voxel_resolution,
        neighbor_search=cfg.neighbor_search,
    )
    return lm.lm_register_se3(
        ctx,
        init_rot,
        init_trans,
        max_outer=cfg.max_outer_iterations,
        max_inner=cfg.lm_max_inner_iterations,
        rot_eps=cfg.rotation_epsilon,
        trans_eps=cfg.transformation_epsilon,
        init_lambda_factor=cfg.lm_init_lambda_factor,
    )
