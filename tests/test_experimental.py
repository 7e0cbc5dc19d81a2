"""Gauss-Newton SE(3) variant and experimental multi-point GICP: both must
recover known rigid transforms on structured synthetic scenes (parity with
the reference's LSQ_OPTIMIZER_TYPE::GaussNewton and the unbuilt
FastGICPMultiPoints, lsq_registration_impl.hpp:207-222 /
experimental/fast_gicp_mp.hpp)."""

import numpy as np
import jax.numpy as jnp

from rolo_tpu.geometry import so3
from rolo_tpu.registration import experimental, gicp, lm
from rolo_tpu.voxel.knn import estimate_cov6
from rolo_tpu.voxel.voxelmap import build_voxel_map

from test_registration import make_scene, pad


def transform_pts(pts, rotvec, t):
    rot = np.asarray(so3.exp(jnp.asarray(rotvec, jnp.float32)))
    return pts @ rot.T + np.asarray(t, np.float32), rot


class TestGaussNewton:
    def test_recovers_se3(self):
        pts = make_scene(1024, seed=11)
        rotvec = [0.02, -0.015, 0.03]
        t = [0.3, -0.2, 0.1]
        moved, rot_true = transform_pts(pts, rotvec, t)

        src_xyz, src_mask = pad(pts, 1024)
        tgt_xyz, tgt_mask = pad(moved, 1024)
        src_cov = estimate_cov6(src_xyz, src_mask, k=10)
        tgt_cov = estimate_cov6(tgt_xyz, tgt_mask, k=10)
        polar = jnp.asarray([0.175, 0.175, 2.0], jnp.float32)
        vm = build_voxel_map(tgt_xyz, tgt_cov, tgt_mask, 2048, polar_res=polar)
        ctx = gicp.make_context(src_xyz, src_mask, src_cov, vm, polar_res=polar)

        res = lm.gn_register_se3(ctx, jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32))
        assert bool(res.converged)
        np.testing.assert_allclose(np.asarray(res.rot), rot_true, atol=5e-3)
        np.testing.assert_allclose(np.asarray(res.trans), t, atol=5e-2)


class TestMultiPoint:
    def test_recovers_se3(self):
        pts = make_scene(1024, seed=5)
        rotvec = [0.015, 0.01, -0.025]
        t = [0.25, 0.15, -0.1]
        moved, rot_true = transform_pts(pts, rotvec, t)

        src_xyz, src_mask = pad(pts, 1024)
        tgt_xyz, tgt_mask = pad(moved, 1024)
        prob = experimental.make_problem(src_xyz, src_mask, tgt_xyz, tgt_mask, k_cov=10)
        res = experimental.register_multipoint(
            prob, jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32), k=4
        )
        assert bool(res.converged)
        np.testing.assert_allclose(np.asarray(res.rot), rot_true, atol=5e-3)
        np.testing.assert_allclose(np.asarray(res.trans), t, atol=5e-2)

    def test_masks_far_neighbors(self):
        pts = make_scene(512, seed=9)
        src_xyz, src_mask = pad(pts, 512)
        prob = experimental.make_problem(src_xyz, src_mask, src_xyz, src_mask, k_cov=10)
        corr = experimental._bind_multipoint(
            prob, jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32), k=4, max_dist=1e-3
        )
        # identity transform: nearest neighbor of each point is itself (d=0),
        # all other neighbors are farther than 1e-3 and must be masked
        w = np.asarray(corr.weight)
        assert (w > 0).sum(axis=0).max() <= 1
