"""Registration tests: rot-GICP must recover known rigid transforms on
synthetic structured scenes, and the linearizations must match autodiff."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rolo_tpu.geometry import so3
from rolo_tpu.config import RegistrationConfig
from rolo_tpu.registration import gicp, lm
from rolo_tpu.registration.rotgicp import register_scan_pair, register_se3
from rolo_tpu.voxel.knn import estimate_cov6
from rolo_tpu.voxel.voxelmap import build_voxel_map

RNG = np.random.default_rng(7)


def make_scene(n=2048, seed=3):
    """Structured scene around the origin: walls + edges, lidar-like."""
    rng = np.random.default_rng(seed)
    pts = []
    # three walls at different orientations, 5-15 m away
    for normal, d in [((1, 0, 0), 8.0), ((0, 1, 0), 10.0), ((0.6, 0.8, 0), 12.0)]:
        m = n // 4
        u = rng.uniform(-6, 6, (m, 2))
        normal = np.array(normal, np.float64)
        t1 = np.cross(normal, [0, 0, 1.0])
        t1 /= np.linalg.norm(t1)
        t2 = np.cross(normal, t1)
        p = d * normal + u[:, :1] * t1 + u[:, 1:] * t2
        pts.append(p)
    # a vertical edge structure
    m = n - sum(p.shape[0] for p in pts)
    z = rng.uniform(-3, 3, m)
    pts.append(np.stack([np.full(m, 6.0), np.full(m, -5.0), z], -1))
    pts = np.concatenate(pts).astype(np.float32)
    pts += rng.normal(0, 0.01, pts.shape).astype(np.float32)
    return pts


def pad(pts, cap):
    n = pts.shape[0]
    xyz = np.zeros((cap, 3), np.float32)
    xyz[:n] = pts
    mask = np.arange(cap) < n
    return jnp.asarray(xyz), jnp.asarray(mask)


CFG = RegistrationConfig()


class TestLinearize:
    def setup_method(self):
        pts = make_scene(1024)
        self.xyz, self.mask = pad(pts, 1024)
        self.covs = estimate_cov6(self.xyz, self.mask, k=10)
        polar = jnp.asarray([0.175, 0.175, 2.0], jnp.float32)
        vm = build_voxel_map(self.xyz, self.covs, self.mask, 2048, polar_res=polar)
        self.ctx = gicp.make_context(self.xyz, self.mask, self.covs, vm, polar_res=polar)

    def test_so3_linearize_matches_autodiff(self):
        rot = so3.exp(jnp.asarray([0.02, -0.01, 0.03]))
        trans = jnp.zeros(3)
        corr = gicp.update_correspondences(self.ctx, rot, trans)

        err, h, b = gicp.so3_linearize(self.ctx, corr, rot, trans)
        assert float(err) > 0

        # b must equal the gradient of 0.5 * error wrt a left perturbation
        def half_err(omega):
            r = so3.exp(omega) @ rot
            t = so3.exp(omega) @ trans
            return 0.5 * gicp.compute_error(self.ctx, corr, r, t)

        g = jax.grad(half_err)(jnp.zeros(3))
        np.testing.assert_allclose(np.asarray(g), np.asarray(b), rtol=2e-2, atol=1e-2)

    def test_se3_linearize_matches_autodiff(self):
        rot = so3.exp(jnp.asarray([0.02, -0.01, 0.03]))
        trans = jnp.asarray([0.1, -0.2, 0.05])
        corr = gicp.update_correspondences(self.ctx, rot, trans)
        err, h, b = gicp.se3_linearize(self.ctx, corr, rot, trans)

        def half_err(xi):
            # left perturbation: R' = exp(w) R, t' = exp(w) t + rho
            omega, rho = xi[:3], xi[3:]
            r = so3.exp(omega) @ rot
            t = so3.exp(omega) @ trans + rho
            return 0.5 * gicp.compute_error(self.ctx, corr, r, t)

        g = jax.grad(half_err)(jnp.zeros(6))
        np.testing.assert_allclose(np.asarray(g), np.asarray(b), rtol=2e-2, atol=1e-2)

    def test_error_zero_at_identity_selfmatch(self):
        corr = gicp.update_correspondences(self.ctx, jnp.eye(3), jnp.zeros(3))
        err = gicp.compute_error(self.ctx, corr, jnp.eye(3), jnp.zeros(3))
        # residuals are point-to-voxel-mean: small but nonzero
        n = float(jnp.sum(corr.weight > 0))
        assert n > 500  # most points must find their voxel
        assert float(err) / n < 5.0


class TestRotationRecovery:
    @pytest.mark.parametrize("angle_deg", [2.0, 5.0, 10.0])
    def test_recover_rotation(self, angle_deg):
        pts = make_scene(2048)
        axis = np.array([0.2, 0.3, 1.0])
        axis /= np.linalg.norm(axis)
        w = axis * np.deg2rad(angle_deg)
        r_true = np.asarray(so3.exp(jnp.asarray(w, jnp.float32)))
        # target = R_true @ source  => registration source->target must find R_true
        src = pts
        tgt = (r_true @ pts.T).T.astype(np.float32)
        src_xyz, src_mask = pad(src, 2048)
        tgt_xyz, tgt_mask = pad(tgt, 2048)

        res = register_scan_pair(
            src_xyz, src_mask, tgt_xyz, tgt_mask,
            jnp.zeros(3), jnp.zeros(3), 0.1, 0.1, CFG, 4096, 20,
        )
        r_est = np.asarray(res.rot)
        err_deg = np.rad2deg(
            np.linalg.norm(np.asarray(so3.log(jnp.asarray(r_est.T @ r_true))))
        )
        assert err_deg < 0.5, f"rotation error {err_deg} deg for {angle_deg} deg true"

    def test_recover_rotation_and_translation(self):
        pts = make_scene(2048)
        w = np.array([0.01, -0.02, 0.06], np.float32)
        r_true = np.asarray(so3.exp(jnp.asarray(w)))
        t_true = np.array([0.3, -0.2, 0.1], np.float32)
        src = pts
        tgt = (r_true @ pts.T).T + t_true
        src_xyz, src_mask = pad(src, 2048)
        tgt_xyz, tgt_mask = pad(tgt.astype(np.float32), 2048)

        res = register_scan_pair(
            src_xyz, src_mask, tgt_xyz, tgt_mask,
            jnp.zeros(3), jnp.zeros(3), 0.1, 0.1,
            RegistrationConfig(ct_lambda=0.0), 4096, 20,
        )
        r_est = np.asarray(res.rot)
        t_est = np.asarray(res.trans)
        rot_err = np.rad2deg(np.linalg.norm(np.asarray(so3.log(jnp.asarray(r_est.T @ r_true)))))
        assert rot_err < 1.0
        # translation solved after rotation: residual target is R p + t vs p + t_sol
        np.testing.assert_allclose(t_est, t_true, atol=0.1)


class TestSE3Registration:
    def test_full_se3(self):
        pts = make_scene(2048)
        w = np.array([0.02, 0.01, -0.04], np.float32)
        r_true = np.asarray(so3.exp(jnp.asarray(w)))
        t_true = np.array([0.2, 0.1, -0.15], np.float32)
        src = pts
        tgt = ((r_true @ pts.T).T + t_true).astype(np.float32)
        src_xyz, src_mask = pad(src, 2048)
        tgt_xyz, tgt_mask = pad(tgt, 2048)
        cfg = RegistrationConfig(voxel_type="uniform", voxel_resolution=1.0)
        res = register_se3(
            src_xyz, src_mask, tgt_xyz, tgt_mask, jnp.eye(3), jnp.zeros(3), cfg, 4096, 20
        )
        rot_err = np.rad2deg(
            np.linalg.norm(np.asarray(so3.log(jnp.asarray(np.asarray(res.rot).T @ r_true))))
        )
        t_err = np.linalg.norm(np.asarray(res.trans) - t_true)
        assert rot_err < 0.5, rot_err
        assert t_err < 0.08, t_err


class TestBatched:
    @pytest.mark.slow
    def test_vmap_registration(self):
        pts = make_scene(1024)
        src_xyz, src_mask = pad(pts, 1024)
        angles = [0.02, -0.03]
        tgts = []
        for a in angles:
            r = np.asarray(so3.exp(jnp.asarray([0.0, 0.0, a], jnp.float32)))
            tgts.append((r @ pts.T).T.astype(np.float32))
        tgt_xyz = jnp.stack([pad(t, 1024)[0] for t in tgts])
        tgt_mask = jnp.stack([pad(t, 1024)[1] for t in tgts])
        src_b = jnp.broadcast_to(src_xyz, (2, 1024, 3))
        mask_b = jnp.broadcast_to(src_mask, (2, 1024))

        fn = jax.vmap(
            lambda s, sm, t, tm: register_scan_pair(
                s, sm, t, tm, jnp.zeros(3), jnp.zeros(3), 0.1, 0.1, CFG, 2048, 10
            )
        )
        res = fn(src_b, mask_b, tgt_xyz, tgt_mask)
        for i, a in enumerate(angles):
            r_true = np.asarray(so3.exp(jnp.asarray([0.0, 0.0, a], jnp.float32)))
            err = np.rad2deg(
                np.linalg.norm(np.asarray(so3.log(jnp.asarray(np.asarray(res.rot[i]).T @ r_true))))
            )
            assert err < 0.5, (i, err)
