"""Analytic world model: terrain heightfield, structures, and a vehicle
trajectory that follows the terrain.

Everything is closed-form so the raycaster (lidar.py) can evaluate it
vectorized over all rays on device, and so ground truth is exact. The
terrain is a sum of smooth sinusoidal bumps ("uneven terrain", the
ROLO-SLAM problem setting, /root/reference/README.md:57-67); structures are
axis-aligned boxes (buildings/containers) and vertical cylinders
(trees/poles) that give the LOAM feature extractor real corners and
surfaces.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp
import numpy as np


class Scene(NamedTuple):
    """Static world geometry, all float32 device-ready arrays."""

    # terrain: z = sum_k amp[k] * sin(fx[k] x + fy[k] y + phase[k])
    terrain_amp: jnp.ndarray  # [T]
    terrain_fx: jnp.ndarray  # [T]
    terrain_fy: jnp.ndarray  # [T]
    terrain_phase: jnp.ndarray  # [T]
    # boxes: axis-aligned, [B, 3] min corner, [B, 3] max corner
    box_min: jnp.ndarray
    box_max: jnp.ndarray
    # vertical cylinders: center xy, radius, z bottom (on terrain), height
    cyl_xy: jnp.ndarray  # [C, 2]
    cyl_r: jnp.ndarray  # [C]
    cyl_z0: jnp.ndarray  # [C]
    cyl_z1: jnp.ndarray  # [C]


def terrain_height(scene: Scene, xy: jnp.ndarray) -> jnp.ndarray:
    """z of the terrain surface at xy [..., 2]."""
    x = xy[..., 0:1]
    y = xy[..., 1:2]
    return jnp.sum(
        scene.terrain_amp * jnp.sin(scene.terrain_fx * x + scene.terrain_fy * y + scene.terrain_phase),
        axis=-1,
    )


def terrain_slope(scene: Scene, xy: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(dz/dx, dz/dy) of the terrain at xy [..., 2]."""
    x = xy[..., 0:1]
    y = xy[..., 1:2]
    c = scene.terrain_amp * jnp.cos(scene.terrain_fx * x + scene.terrain_fy * y + scene.terrain_phase)
    return jnp.sum(c * scene.terrain_fx, axis=-1), jnp.sum(c * scene.terrain_fy, axis=-1)


def default_scene(seed: int = 0, extent: float = 60.0, n_boxes: int = 14, n_cyls: int = 24,
                  roughness: float = 1.0) -> Scene:
    """A bounded outdoor scene: gently rolling terrain with buildings and
    poles scattered off the vehicle's loop path. `roughness` scales terrain
    amplitude (0 = flat ground)."""
    rng = np.random.default_rng(seed)

    # terrain: a few long-wavelength components + mild detail; slopes kept
    # below ~15 deg so the wheel-contact prior model stays in regime
    n_terms = 6
    wavelength = rng.uniform(25.0, 80.0, n_terms)
    amp = roughness * rng.uniform(0.2, 0.9, n_terms) * (wavelength / 80.0)
    ang = rng.uniform(0, 2 * np.pi, n_terms)
    freq = 2 * np.pi / wavelength
    fx = freq * np.cos(ang)
    fy = freq * np.sin(ang)
    phase = rng.uniform(0, 2 * np.pi, n_terms)

    def h(x, y):
        return np.sum(amp * np.sin(fx * x + fy * y + phase))

    # structures placed in rings around the origin, outside the inner loop
    # path (radius ~12-22 m used by loop_trajectory_pose) but inside range
    boxes_min, boxes_max = [], []
    for _ in range(n_boxes):
        r = rng.uniform(26.0, extent)
        th = rng.uniform(0, 2 * np.pi)
        cx, cy = r * np.cos(th), r * np.sin(th)
        sx, sy = rng.uniform(2.0, 8.0, 2)
        hgt = rng.uniform(2.5, 7.0)
        z0 = h(cx, cy) - 0.5
        boxes_min.append([cx - sx / 2, cy - sy / 2, z0])
        boxes_max.append([cx + sx / 2, cy + sy / 2, z0 + hgt])

    cyl_xy, cyl_r, cyl_z0, cyl_z1 = [], [], [], []
    for _ in range(n_cyls):
        r = rng.uniform(5.0, extent)
        th = rng.uniform(0, 2 * np.pi)
        cx, cy = r * np.cos(th), r * np.sin(th)
        # keep poles off the loop path annulus
        if 10.0 < np.hypot(cx, cy) < 24.0:
            cx *= 26.0 / max(np.hypot(cx, cy), 1e-3)
            cy *= 26.0 / max(np.hypot(cx, cy), 1e-3)
        z0 = h(cx, cy) - 0.2
        cyl_xy.append([cx, cy])
        cyl_r.append(rng.uniform(0.15, 0.5))
        cyl_z0.append(z0)
        cyl_z1.append(z0 + rng.uniform(2.0, 6.0))

    f32 = np.float32
    return Scene(
        terrain_amp=jnp.asarray(amp, f32),
        terrain_fx=jnp.asarray(fx, f32),
        terrain_fy=jnp.asarray(fy, f32),
        terrain_phase=jnp.asarray(phase, f32),
        box_min=jnp.asarray(np.array(boxes_min, f32).reshape(-1, 3)),
        box_max=jnp.asarray(np.array(boxes_max, f32).reshape(-1, 3)),
        cyl_xy=jnp.asarray(np.array(cyl_xy, f32).reshape(-1, 2)),
        cyl_r=jnp.asarray(cyl_r, f32),
        cyl_z0=jnp.asarray(cyl_z0, f32),
        cyl_z1=jnp.asarray(cyl_z1, f32),
    )


def loop_trajectory_pose(scene: Scene, t: jnp.ndarray, *, radius_x: float = 18.0,
                         radius_y: float = 14.0, period: float = 60.0,
                         sensor_height: float = 1.8) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Ground-vehicle pose at time(s) t [..]: an ellipse loop driven on the
    terrain, sensor `sensor_height` above the contact point, vehicle
    pitched/rolled to the local slope and yawed along the velocity.

    Returns (rot [..., 3, 3], trans [..., 3]) of the SENSOR in world. The
    vehicle closes the loop every `period` seconds — one full revisit for
    loop-closure tests per period.
    """
    w = 2.0 * jnp.pi / period
    x = radius_x * jnp.cos(w * t)
    y = radius_y * jnp.sin(w * t)
    vx = -radius_x * w * jnp.sin(w * t)
    vy = radius_y * w * jnp.cos(w * t)
    yaw = jnp.arctan2(vy, vx)

    xy = jnp.stack([x, y], axis=-1)
    z = terrain_height(scene, xy) + sensor_height
    gx, gy = terrain_slope(scene, xy)

    # slope in the heading frame -> pitch; lateral slope -> roll
    cy_, sy_ = jnp.cos(yaw), jnp.sin(yaw)
    pitch = -jnp.arctan(gx * cy_ + gy * sy_)
    roll = jnp.arctan(-gx * sy_ + gy * cy_)

    cr, sr = jnp.cos(roll), jnp.sin(roll)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cz, sz = cy_, sy_
    # R = Rz(yaw) Ry(pitch) Rx(roll)
    row0 = jnp.stack([cz * cp, cz * sp * sr - sz * cr, cz * sp * cr + sz * sr], axis=-1)
    row1 = jnp.stack([sz * cp, sz * sp * sr + cz * cr, sz * sp * cr - cz * sr], axis=-1)
    row2 = jnp.stack([-sp, cp * sr, cp * cr], axis=-1)
    rot = jnp.stack([row0, row1, row2], axis=-2)
    trans = jnp.stack([x, y, z], axis=-1)
    return rot, trans
