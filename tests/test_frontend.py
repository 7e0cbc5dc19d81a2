"""Front-end odometry: trajectory recovery on a synthetic moving sensor."""

import numpy as np
import jax.numpy as jnp

from rolo_tpu.config import RegistrationConfig
from rolo_tpu.frontend import run_sequence
from rolo_tpu.geometry import so3

RNG = np.random.default_rng(11)


def make_world(n=4096):
    """Static world points: walls and pillars around a courtyard."""
    pts = []
    for normal, d in [((1, 0, 0), 12.0), ((-1, 0, 0), 12.0), ((0, 1, 0), 15.0), ((0, -1, 0), 15.0)]:
        m = n // 6
        u = RNG.uniform(-10, 10, (m, 2))
        normal = np.array(normal, np.float64)
        t1 = np.cross(normal, [0, 0, 1.0])
        t1 /= np.linalg.norm(t1)
        t2 = np.cross(normal, t1)
        pts.append(d * normal + u[:, :1] * t1 + u[:, 1:] * t2)
    # pillars
    for cx, cy in [(4, 3), (-5, 2), (2, -6), (-3, -4)]:
        m = n // 12
        ang = RNG.uniform(0, 2 * np.pi, m)
        z = RNG.uniform(-1, 3, m)
        pts.append(np.stack([cx + 0.4 * np.cos(ang), cy + 0.4 * np.sin(ang), z], -1))
    pts = np.concatenate(pts)
    return pts[: (len(pts) // 512) * 512].astype(np.float32)


def test_sequence_trajectory():
    world = make_world()
    n = world.shape[0]
    t_steps = 6
    # sensor moves forward with slight yaw each frame
    poses = []
    p = np.eye(4)
    for i in range(t_steps):
        poses.append(p.copy())
        step = np.eye(4)
        yaw = 0.02
        step[:3, :3] = np.asarray(so3.rpy_to_matrix(jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(yaw)))
        step[:3, 3] = [0.25, 0.05, 0.0]
        p = p @ step

    scans = []
    for pose in poses:
        # scan = world seen from pose: p_local = R^T (p_world - t)
        r, t = pose[:3, :3], pose[:3, 3]
        local = (world - t) @ r
        local += RNG.normal(0, 0.005, local.shape)
        scans.append(local.astype(np.float32))

    feats = jnp.asarray(np.stack(scans))
    masks = jnp.ones((t_steps, n), bool)
    intervals = jnp.full((t_steps,), 0.1, jnp.float32)

    cfg = RegistrationConfig(ct_lambda=0.0)
    outs = run_sequence(feats, masks, intervals, cfg, voxel_capacity=8192, k=10)

    # Estimated pose of frame i should match ground-truth sensor pose.
    for i in [1, t_steps - 1]:
        est_t = np.asarray(outs.pose_trans[i])
        true_t = poses[i][:3, 3]
        err = np.linalg.norm(est_t - true_t)
        assert err < 0.15, (i, est_t, true_t)
        est_r = np.asarray(outs.pose_rot[i])
        rot_err = np.rad2deg(
            np.linalg.norm(np.asarray(so3.log(jnp.asarray(est_r.T @ poses[i][:3, :3]))))
        )
        assert rot_err < 1.5, (i, rot_err)
