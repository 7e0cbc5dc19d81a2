"""Live ground segmentation from the projected scan.

The reference takes its ground map from an EXTERNAL perception node
(`point_seg ground_mapping` publishing /voxel_map,
/root/reference/launch/module_prior.launch:9) that is not in its repo; the
prior stack (prior_pose_node + backMapping groundMapHandler,
src/backMapping.cpp:403-417) consumes that live map in the estimate's own
odom frame. This module provides the in-repo equivalent: LeGO-LOAM-style
inter-ring slope ground marking over the dense range image, so the SLAM
system can feed its own prior stack without external input — keeping every
frame consistent with the (drifting) estimate, which is what makes the
prior patch ICP measure drift instead of noise.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .cloud import PaddedCloud
from .projection import RingImage


@partial(jax.jit, static_argnames=("horizon", "ground_rings", "out_capacity"))
def segment_ground(
    img: RingImage,
    horizon: int,
    ground_rings: int,
    slope_deg: float = 10.0,
    out_capacity: int = 8192,
) -> PaddedCloud:
    """Ground points of one scan (sensor frame).

    LeGO-LOAM groundMat criterion: for each column, the segment between
    vertically adjacent ring returns is ground when its slope to the
    horizontal is below `slope_deg`; both endpoints are marked. Only the
    lowest `ground_rings` rings are eligible (beams that can see ground).
    The per-ring compacted RingImage is first scattered back to the dense
    [R, H] grid so vertical neighbors share a column.
    """
    r, h = img.mask.shape
    # dense grid: scatter packed entries to their original columns
    ring_id = jnp.broadcast_to(jnp.arange(r)[:, None], (r, h))
    col = jnp.where(img.mask, img.col, 0)
    dense_xyz = jnp.zeros((r, horizon, 3), img.xyz.dtype)
    dense_ok = jnp.zeros((r, horizon), bool)
    flat_idx = (ring_id * horizon + col).reshape(-1)
    dense_xyz = dense_xyz.reshape(-1, 3).at[flat_idx].set(
        jnp.where(img.mask.reshape(-1, 1), img.xyz.reshape(-1, 3), 0.0)
    ).reshape(r, horizon, 3)
    dense_ok = dense_ok.reshape(-1).at[flat_idx].max(img.mask.reshape(-1)).reshape(r, horizon)

    lo = dense_xyz[:-1]  # ring b
    hi = dense_xyz[1:]  # ring b+1
    pair_ok = dense_ok[:-1] & dense_ok[1:]
    d = hi - lo
    slope = jnp.arctan2(jnp.abs(d[..., 2]), jnp.linalg.norm(d[..., :2], axis=-1) + 1e-9)
    flat = pair_ok & (slope < jnp.deg2rad(slope_deg))
    eligible = jnp.arange(r - 1)[:, None] < ground_rings

    gmask = jnp.zeros((r, horizon), bool)
    gmask = gmask.at[:-1].set(flat & eligible)
    gmask = gmask.at[1:].max(flat & eligible)
    gmask &= dense_ok

    # compact to a fixed-capacity cloud
    flat_mask = gmask.reshape(-1)
    order = jnp.argsort(~flat_mask)  # valid first, stable
    take = order[:out_capacity]
    xyz = dense_xyz.reshape(-1, 3)[take]
    mask = flat_mask[take]
    return PaddedCloud(xyz, mask)
