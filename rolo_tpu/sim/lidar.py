"""Spinning multi-beam LiDAR raycaster.

Generates one scan = [n_beams, n_cols] rays against the analytic Scene:
slab-test boxes, quadratic vertical cylinders, and a marched+bisected
terrain heightfield — all vectorized over rays inside one jit. Each azimuth
column uses the sensor pose at its own capture time, so scans carry real
motion distortion (what the reference's deskew path exists to undo,
/root/reference/src/imageProjection.cpp:266-396); per-point `ring` and
relative-time fields match the reference's expected Velodyne point format
(/root/reference/include/rolo/utility.h:68-95).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .scene import Scene, terrain_height


class LidarModel(NamedTuple):
    """Sensor geometry/noise. `elev` is per-beam elevation (rad), top first
    (ring 0 = highest beam, matching the projection's row convention)."""

    elev: jnp.ndarray  # [n_beams]
    min_range: float
    max_range: float
    noise_std: float
    dropout: float


def velodyne32(min_range: float = 1.0, max_range: float = 100.0,
               noise_std: float = 0.02, dropout: float = 0.05) -> LidarModel:
    """HDL-32-like beam table: 32 beams, +10.67 .. -30.67 deg."""
    elev = np.linspace(10.67, -30.67, 32) * np.pi / 180.0
    return LidarModel(jnp.asarray(elev, jnp.float32), min_range, max_range, noise_std, dropout)


def velodyne16(min_range: float = 1.0, max_range: float = 80.0,
               noise_std: float = 0.02, dropout: float = 0.05) -> LidarModel:
    """VLP-16: +-15 deg (the M2UD config sensor, config/M2UD/params.yaml)."""
    elev = np.linspace(15.0, -15.0, 16) * np.pi / 180.0
    return LidarModel(jnp.asarray(elev, jnp.float32), min_range, max_range, noise_std, dropout)


class SimScan(NamedTuple):
    xyz: jnp.ndarray  # [n_beams * n_cols, 3] sensor frame (at each column's own time)
    ring: jnp.ndarray  # [n_beams * n_cols] int32
    rel_time: jnp.ndarray  # [n_beams * n_cols] seconds since sweep start
    mask: jnp.ndarray  # [n_beams * n_cols] valid hits


def _ray_boxes(scene: Scene, o: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Nearest box hit distance per ray; +inf when none. o, d: [R, 3]."""
    if scene.box_min.shape[0] == 0:
        return jnp.full(o.shape[:1], jnp.inf)
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-9, jnp.where(d >= 0, 1e-9, -1e-9), d)
    t1 = (scene.box_min[None] - o[:, None]) * inv[:, None]  # [R, B, 3]
    t2 = (scene.box_max[None] - o[:, None]) * inv[:, None]
    tn = jnp.max(jnp.minimum(t1, t2), axis=-1)  # [R, B]
    tf = jnp.min(jnp.maximum(t1, t2), axis=-1)
    hit = (tf >= jnp.maximum(tn, 1e-3)) & (tn > 1e-3)
    return jnp.min(jnp.where(hit, tn, jnp.inf), axis=-1)  # [R]


def _ray_cylinders(scene: Scene, o: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Nearest vertical-cylinder hit distance per ray; +inf when none."""
    if scene.cyl_xy.shape[0] == 0:
        return jnp.full(o.shape[:1], jnp.inf)
    oc = o[:, None, :2] - scene.cyl_xy[None]  # [R, C, 2]
    dd = d[:, None, :2]
    a = jnp.sum(dd * dd, axis=-1)
    b = 2.0 * jnp.sum(oc * dd, axis=-1)
    c = jnp.sum(oc * oc, axis=-1) - scene.cyl_r[None] ** 2
    disc = b * b - 4 * a * c
    ok = disc > 0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t = (-b - sq) / jnp.maximum(2 * a, 1e-9)
    z = o[:, None, 2] + t * d[:, None, 2]
    hit = ok & (t > 1e-3) & (z >= scene.cyl_z0[None]) & (z <= scene.cyl_z1[None])
    return jnp.min(jnp.where(hit, t, jnp.inf), axis=-1)


def _ray_terrain(scene: Scene, o: jnp.ndarray, d: jnp.ndarray, max_range: float,
                 n_march: int = 160, n_bisect: int = 14) -> jnp.ndarray:
    """First terrain crossing per ray via fixed-step march + bisection.
    Memory stays O(rays): the march is a lax.scan over steps."""
    ts = jnp.linspace(0.5, max_range, n_march)
    dt = ts[1] - ts[0]

    def above(t):
        p_xy = o[:, :2] + t[:, None] * d[:, :2]
        p_z = o[:, 2] + t * d[:, 2]
        return p_z - terrain_height(scene, p_xy)

    def march(carry, t_k):
        t_lo, t_hi, found, f_prev = carry
        t_vec = jnp.full(o.shape[:1], t_k)
        f_k = above(t_vec)
        crossing = (f_prev > 0) & (f_k <= 0) & ~found
        t_lo = jnp.where(crossing, t_k - dt, t_lo)
        t_hi = jnp.where(crossing, t_k, t_hi)
        return (t_lo, t_hi, found | crossing, f_k), None

    r = o.shape[0]
    init = (jnp.full((r,), jnp.inf), jnp.full((r,), jnp.inf), jnp.zeros((r,), bool),
            above(jnp.full((r,), 1e-3)))
    (t_lo, t_hi, found, _), _ = jax.lax.scan(march, init, ts)

    # bisect the bracket (inf-safe: unfound rays keep inf)
    def bisect(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        f_mid = above(jnp.where(found, mid, 1.0))
        lo = jnp.where(f_mid > 0, mid, lo)
        hi = jnp.where(f_mid > 0, hi, mid)
        return (lo, hi)

    safe_lo = jnp.where(found, t_lo, 1.0)
    safe_hi = jnp.where(found, t_hi, 2.0)
    lo, hi = jax.lax.fori_loop(0, n_bisect, bisect, (safe_lo, safe_hi))
    return jnp.where(found, 0.5 * (lo + hi), jnp.inf)


@partial(jax.jit, static_argnames=("scan_period",))
def simulate_scan(
    scene: Scene,
    model: LidarModel,
    col_rot: jnp.ndarray,  # [n_cols, 3, 3] sensor pose per azimuth column
    col_trans: jnp.ndarray,  # [n_cols, 3]
    key: jax.Array,
    scan_period: float = 0.1,
) -> SimScan:
    """One full 360-deg sweep. Ray directions in the sensor frame:
    azimuth decreasing with column (clockwise spin, matching the
    reference's column convention, imageProjection.cpp:434-443)."""
    n_beams = model.elev.shape[0]
    n_cols = col_rot.shape[0]
    az = -2.0 * jnp.pi * jnp.arange(n_cols) / n_cols  # [n_cols]
    ce, se = jnp.cos(model.elev), jnp.sin(model.elev)  # [n_beams]
    ca, sa = jnp.cos(az), jnp.sin(az)  # [n_cols]

    # sensor-frame directions [n_beams, n_cols, 3]
    d_sensor = jnp.stack(
        [ce[:, None] * ca[None, :], ce[:, None] * sa[None, :],
         jnp.broadcast_to(se[:, None], (n_beams, n_cols))],
        axis=-1,
    )
    # world-frame rays
    d_world = jnp.einsum("cij,bcj->bci", col_rot, d_sensor)
    o_world = jnp.broadcast_to(col_trans[None], (n_beams, n_cols, 3))

    o = o_world.reshape(-1, 3)
    d = d_world.reshape(-1, 3)

    t_box = _ray_boxes(scene, o, d)
    t_cyl = _ray_cylinders(scene, o, d)
    t_ter = _ray_terrain(scene, o, d, model.max_range)
    t = jnp.minimum(jnp.minimum(t_box, t_cyl), t_ter)

    k_noise, k_drop = jax.random.split(key)
    t = t + model.noise_std * jax.random.normal(k_noise, t.shape, t.dtype)
    keep = jax.random.uniform(k_drop, t.shape) >= model.dropout
    valid = jnp.isfinite(t) & (t >= model.min_range) & (t <= model.max_range) & keep

    t_safe = jnp.where(valid, t, 1.0)
    xyz = t_safe[:, None] * d_sensor.reshape(-1, 3)

    ring = jnp.broadcast_to(
        jnp.arange(n_beams, dtype=jnp.int32)[:, None], (n_beams, n_cols)
    ).reshape(-1)
    rel_time = jnp.broadcast_to(
        (scan_period * jnp.arange(n_cols) / n_cols)[None], (n_beams, n_cols)
    ).reshape(-1).astype(jnp.float32)
    return SimScan(xyz=xyz, ring=ring, rel_time=rel_time, mask=valid)
