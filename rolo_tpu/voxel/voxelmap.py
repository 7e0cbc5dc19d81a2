"""Voxel maps over fixed-slot arrays: the TPU replacement for the
reference's pointer-based spatial hash
(/root/reference/include/rot_gicp/gicp/vmp_voxel.hpp:157-243).

Design: instead of an unordered_map of heap voxels, a voxel map is a sorted
array of (hash-key, integer-coord, stats) rows built with one sort + one
segment-reduce — the scatter-free pattern TPUs like. Lookup is a vectorized
binary search (searchsorted) + coordinate verification, so thousands of
queries per step run as one fused gather.

Supports both coordinate systems of the reference:
  - POLAR (theta, phi, r) bins — the "spherical alignment" structure used by
    rot-GICP (vmp_voxel.hpp:208-224),
  - UNIFORM cartesian bins (vmp_voxel.hpp:199-206).

Per-voxel statistics mirror AdditiveVmfVoxel (vmp_voxel.hpp:87-109):
num_points, mean position (mean_dir), mean of member covariances, and the
von-Mises-Fisher concentration kappa from the resultant length r_bar.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp

from ..ops.voxel_join import INVALID_PACK, pack_polar, pack_uniform, voxel_join

_INVALID_KEY = jnp.int32(0x7FFFFFFF)
# Number of consecutive slots probed on lookup to survive hash collisions.
_PROBE = 4


def polar_coord(xyz: jnp.ndarray, polar_res: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] point -> [..., 3] int32 (theta, phi, r) bin (vmp_voxel.hpp:208-211)."""
    r = jnp.linalg.norm(xyz, axis=-1)
    theta = jnp.arctan2(xyz[..., 1], xyz[..., 0]) + math.pi
    phi = jnp.arccos(jnp.clip(xyz[..., 2] / jnp.maximum(r, 1e-12), -1.0, 1.0))
    sph = jnp.stack([theta, phi, r], axis=-1)
    return jnp.floor(sph / polar_res).astype(jnp.int32)


def polar_origin(coord: jnp.ndarray, polar_res: jnp.ndarray) -> jnp.ndarray:
    """Bin center -> cartesian point (vmp_voxel.hpp:213-224)."""
    polar = (coord.astype(jnp.float32) + 0.5) * polar_res
    theta = polar[..., 0] - math.pi
    phi = polar[..., 1]
    r = polar[..., 2]
    sin_phi = jnp.sin(phi)
    return jnp.stack(
        [r * sin_phi * jnp.cos(theta), r * sin_phi * jnp.sin(theta), r * jnp.cos(phi)],
        axis=-1,
    )


def uniform_coord(xyz: jnp.ndarray, resolution: float) -> jnp.ndarray:
    """Cartesian bin (vmp_voxel.hpp:199-201: floor(x/res - 0.5))."""
    return jnp.floor(xyz / resolution - 0.5).astype(jnp.int32)


def hash_coord(coord: jnp.ndarray, salt: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """[..., 3] int32 -> int32 hash in [0, 2^30), strictly below _INVALID_KEY.

    Murmur3-style finalizer in uint32 arithmetic: the classic
    (x*p1 ^ y*p2 ^ z*p3) XOR hash collides heavily for small coordinate
    ranges, which would fragment voxel segments after the sort.
    """
    c = coord.astype(jnp.uint32)
    h = (
        c[..., 0] * jnp.uint32(0x9E3779B1)
        + c[..., 1] * jnp.uint32(0x85EBCA77)
        + c[..., 2] * jnp.uint32(0xC2B2AE3D)
    )
    if salt is not None:
        h = h + salt.astype(jnp.uint32) * jnp.uint32(0x27D4EB2F)
    h = h ^ (h >> jnp.uint32(16))
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> jnp.uint32(13))
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> jnp.uint32(16))
    return (h >> jnp.uint32(2)).astype(jnp.int32)


class VoxelMap(NamedTuple):
    """Sorted fixed-capacity voxel table.

    key [V] int32 sorted ascending (invalid slots = 0x7FFFFFFF);
    coord [V, 3] int32; num_points [V] f32; mean [V, 3]; cov [V, 3, 3];
    kappa [V] f32; valid [V] bool; pack [V] int32 exact packed bin
    (ops/voxel_join.py layout); stats [V, 16] join table
    (num | mean | cov-flat | pad) with zeroed invalid rows.
    """

    key: jnp.ndarray
    coord: jnp.ndarray
    num_points: jnp.ndarray
    mean: jnp.ndarray
    cov: jnp.ndarray
    kappa: jnp.ndarray
    valid: jnp.ndarray
    pack: jnp.ndarray
    stats: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.key.shape[0]


def _kappa_from_rbar(r_bar: jnp.ndarray) -> jnp.ndarray:
    """vMF concentration approximation (vmp_voxel.hpp:104-106)."""
    series = 3.0 * r_bar * (1.0 + 0.6 * r_bar**2 + (99.0 / 175.0) * r_bar**4)
    exact = r_bar * (3.0 - r_bar**2) / jnp.maximum(1.0 - r_bar**2, 1e-9)
    k = jnp.where(r_bar < 0.6, series, exact)
    return jnp.where(r_bar < 1e-8, 0.0, k)


def build_voxel_map(
    xyz: jnp.ndarray,
    covs: jnp.ndarray,
    mask: jnp.ndarray,
    capacity: int,
    polar_res: Optional[jnp.ndarray] = None,
    resolution: float = 1.0,
) -> VoxelMap:
    """Build a voxel map from a padded cloud (create_voxelmap,
    vmp_voxel.hpp:167-197). polar_res given -> POLAR bins, else UNIFORM."""
    if polar_res is not None:
        coord = polar_coord(xyz, polar_res)
    else:
        coord = uniform_coord(xyz, resolution)
    h = hash_coord(coord)
    sort_key = jnp.where(mask, h, _INVALID_KEY)

    order = jnp.argsort(sort_key)
    key_s = sort_key[order]
    coord_s = coord[order]
    xyz_s = xyz[order]
    cov_s = covs[order]
    sel_s = mask[order]

    same = jnp.all(coord_s[1:] == coord_s[:-1], axis=1) & sel_s[1:] & sel_s[:-1]
    new_seg = jnp.concatenate([jnp.ones((1,), bool), ~same])
    seg_id = jnp.cumsum(new_seg) - 1
    seg_id = jnp.where(sel_s, jnp.minimum(seg_id, capacity), capacity)

    w = sel_s.astype(jnp.float32)
    num = jnp.zeros((capacity + 1,), jnp.float32).at[seg_id].add(w)
    psum = jnp.zeros((capacity + 1, 3), xyz.dtype).at[seg_id].add(xyz_s * w[:, None])
    csum = jnp.zeros((capacity + 1, 3, 3), covs.dtype).at[seg_id].add(cov_s * w[:, None, None])
    vkey = jnp.full((capacity + 1,), _INVALID_KEY, jnp.int32).at[seg_id].min(key_s)
    # init must be INT32_MIN: a zero init would clamp negative (uniform)
    # coordinates and corrupt the table
    vcoord = jnp.full((capacity + 1, 3), -(2**31 - 1), jnp.int32).at[seg_id].max(
        jnp.where(sel_s[:, None], coord_s, -(2**31 - 1))
    )

    num = num[:capacity]
    valid = num > 0
    denom = jnp.maximum(num, 1.0)
    mean = psum[:capacity] / denom[:, None]
    cov = csum[:capacity] / denom[:, None, None]
    r_bar = jnp.linalg.norm(psum[:capacity], axis=-1) / denom
    # NOTE(reference parity): AdditiveVmfVoxel::append recomputes
    # r_bar = |running mean_dir sum| / n each append and finalize() divides
    # once more by n; the value kept is |sum p| / n (positions, not unit
    # dirs). kappa is computed from that (vmp_voxel.hpp:97,104-106). kappa is
    # not used by any solver path (weight is sqrt(num_points),
    # rot_vgicp_impl.hpp:258) but is exposed for parity.
    kappa = jnp.where(valid, _kappa_from_rbar(r_bar), 0.0)

    vcoord_final = vcoord[:capacity]
    if polar_res is not None:
        pack = pack_polar(vcoord_final)
    else:
        pack = pack_uniform(vcoord_final)
    pack = jnp.where(valid, pack, INVALID_PACK)
    stats = jnp.concatenate(
        [num[:, None], mean, cov.reshape(capacity, 9), jnp.zeros((capacity, 3), mean.dtype)],
        axis=-1,
    )
    stats = jnp.where(valid[:, None], stats, 0.0)  # matched invalid rows add 0

    return VoxelMap(
        key=jnp.where(valid, vkey[:capacity], _INVALID_KEY),
        coord=vcoord_final,
        num_points=num,
        mean=mean,
        cov=cov,
        kappa=kappa,
        valid=valid,
        pack=pack,
        stats=stats,
    )


def lookup(
    vmap: VoxelMap, coord: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Vectorized voxel lookup (lookup_voxel, vmp_voxel.hpp:226-233).

    coord [N, 3] int32 -> (found [N] bool, num_points [N], mean [N, 3],
    cov [N, 3, 3]). Probes _PROBE consecutive slots after the binary search
    to tolerate hash collisions.
    """
    h = hash_coord(coord)
    base = jnp.searchsorted(vmap.key, h)
    cap = vmap.capacity
    found = jnp.zeros(coord.shape[:-1], bool)
    slot = jnp.zeros(coord.shape[:-1], jnp.int32)
    for p in range(_PROBE):
        idx = jnp.minimum(base + p, cap - 1)
        hit = (
            (vmap.key[idx] == h)
            & jnp.all(vmap.coord[idx] == coord, axis=-1)
            & vmap.valid[idx]
        )
        slot = jnp.where(hit & ~found, idx, slot)
        found = found | hit
    num = jnp.where(found, vmap.num_points[slot], 0.0)
    mean = jnp.where(found[..., None], vmap.mean[slot], 0.0)
    cov = jnp.where(found[..., None, None], vmap.cov[slot], 0.0)
    return found, num, mean, cov


def lookup_join(
    vmap: VoxelMap, coord: jnp.ndarray, polar: bool
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """MXU one-hot-join lookup (ops/voxel_join.py): exact packed-bin
    equality turned into a matmul gather — the production binding path
    (the searchsorted `lookup` above is the reference-shaped fallback,
    ~100x slower on TPU at scan scale).

    coord [N, 3] int32 -> (found [N], num [N], mean [N, 3], cov [N, 3, 3]).
    """
    pack = pack_polar(coord) if polar else pack_uniform(coord)
    out = voxel_join(pack, vmap.pack, vmap.stats)  # [N, 16]
    num = out[..., 0]
    found = num > 0.0
    mean = out[..., 1:4]
    cov = out[..., 4:13].reshape(*coord.shape[:-1], 3, 3)
    return found, num, mean, cov
