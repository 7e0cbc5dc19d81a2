"""Geometry unit tests against scipy/numpy oracles."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

import jax.numpy as jnp

from rolo_tpu.geometry import so3, se3
from rolo_tpu.geometry.se3 import SE3

RNG = np.random.default_rng(0)


def random_rotvecs(n, scale=2.0):
    return (RNG.standard_normal((n, 3)) * scale).astype(np.float32)


class TestSO3:
    def test_skew(self):
        v = np.array([1.0, 2.0, 3.0], np.float32)
        m = np.asarray(so3.skew(jnp.asarray(v)))
        np.testing.assert_allclose(m, -m.T)
        np.testing.assert_allclose(m @ np.array([4.0, 5, 6]), np.cross(v, [4.0, 5, 6]), rtol=1e-6)

    def test_exp_matches_scipy(self):
        w = random_rotvecs(64)
        ours = np.asarray(so3.exp(jnp.asarray(w)))
        ref = R.from_rotvec(w).as_matrix()
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_exp_small_angle(self):
        w = random_rotvecs(16, scale=1e-7)
        ours = np.asarray(so3.exp(jnp.asarray(w)))
        ref = R.from_rotvec(w.astype(np.float64)).as_matrix()
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_log_roundtrip(self):
        # log returns the principal rotvec; compare as rotations.
        w = random_rotvecs(64, scale=1.5)
        back = np.asarray(so3.log(so3.exp(jnp.asarray(w))))
        ref = R.from_rotvec(w).as_rotvec()  # scipy also returns principal value
        np.testing.assert_allclose(back, ref, atol=1e-4)

    def test_quat_matches_scipy(self):
        w = random_rotvecs(32)
        q = np.asarray(so3.exp_quat(jnp.asarray(w)))  # (w,x,y,z)
        ref = R.from_rotvec(w).as_quat()  # (x,y,z,w)
        ref_wxyz = np.concatenate([ref[:, 3:], ref[:, :3]], axis=1)
        sign = np.sign(np.sum(q * ref_wxyz, axis=1, keepdims=True))
        np.testing.assert_allclose(q * sign, ref_wxyz, atol=1e-5)

    def test_matrix_to_quat_roundtrip(self):
        w = random_rotvecs(64, scale=3.0)
        m = so3.exp(jnp.asarray(w))
        q = so3.matrix_to_quat(m)
        m2 = np.asarray(so3.quat_to_matrix(q))
        np.testing.assert_allclose(m2, np.asarray(m), atol=1e-5)

    def test_quat_rotate(self):
        w = random_rotvecs(8)
        v = RNG.standard_normal((8, 3)).astype(np.float32)
        q = so3.exp_quat(jnp.asarray(w))
        out = np.asarray(so3.quat_rotate(q, jnp.asarray(v)))
        ref = np.einsum("nij,nj->ni", R.from_rotvec(w).as_matrix(), v)
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_rpy_matches_scipy(self):
        rpy = RNG.uniform(-1.0, 1.0, (16, 3)).astype(np.float32)
        ours = np.asarray(so3.rpy_to_matrix(jnp.asarray(rpy[:, 0]), jnp.asarray(rpy[:, 1]), jnp.asarray(rpy[:, 2])))
        # pcl::getTransformation: R = Rz(yaw) Ry(pitch) Rx(roll)
        ref = R.from_euler("ZYX", rpy[:, ::-1]).as_matrix()
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_rpy_roundtrip(self):
        rpy = RNG.uniform(-1.2, 1.2, (32, 3)).astype(np.float32)
        m = so3.rpy_to_matrix(jnp.asarray(rpy[:, 0]), jnp.asarray(rpy[:, 1]), jnp.asarray(rpy[:, 2]))
        r2, p2, y2 = so3.matrix_to_rpy(m)
        np.testing.assert_allclose(np.stack([r2, p2, y2], -1), rpy, atol=1e-5)


class TestSE3:
    def test_compose_inverse(self):
        w = random_rotvecs(16)
        t = RNG.standard_normal((16, 3)).astype(np.float32)
        T = SE3(so3.exp(jnp.asarray(w)), jnp.asarray(t))
        eye = T.compose(T.inverse())
        np.testing.assert_allclose(np.asarray(eye.rot), np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-5)
        np.testing.assert_allclose(np.asarray(eye.trans), np.zeros((16, 3)), atol=1e-5)

    def test_apply_matches_matrix(self):
        w = random_rotvecs(4)
        t = RNG.standard_normal((4, 3)).astype(np.float32)
        pts = RNG.standard_normal((4, 100, 3)).astype(np.float32)
        T = SE3(so3.exp(jnp.asarray(w)), jnp.asarray(t))
        out = np.asarray(T.apply(jnp.asarray(pts)))
        m = np.asarray(T.as_matrix())
        ref = np.einsum("bij,bnj->bni", m[:, :3, :3], pts) + m[:, None, :3, 3]
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_exp_log_roundtrip(self):
        xi = (RNG.standard_normal((32, 6)) * 0.8).astype(np.float32)
        T = se3.exp(jnp.asarray(xi))
        back = np.asarray(se3.log(T))
        np.testing.assert_allclose(back, xi, atol=1e-4)

    def test_exp_zero(self):
        T = se3.exp(jnp.zeros((6,)))
        np.testing.assert_allclose(np.asarray(T.rot), np.eye(3), atol=1e-7)
        np.testing.assert_allclose(np.asarray(T.trans), np.zeros(3), atol=1e-7)

    def test_exp_pure_translation(self):
        xi = jnp.asarray(np.array([0, 0, 0, 1.0, 2.0, 3.0], np.float32))
        T = se3.exp(xi)
        np.testing.assert_allclose(np.asarray(T.trans), [1.0, 2.0, 3.0], atol=1e-6)

    def test_xyzrpy_roundtrip(self):
        vec = RNG.uniform(-1.0, 1.0, (16, 6)).astype(np.float32)
        T = SE3.from_xyzrpy(jnp.asarray(vec))
        back = np.asarray(T.to_xyzrpy())
        np.testing.assert_allclose(back, vec, atol=1e-5)

    def test_rigid_align_recovers_transform(self):
        """Kabsch (ComputeRigidAlignment analog): exact recovery of an
        applied rigid transform from noiseless correspondences."""
        w = random_rotvecs(1)[0]
        rot = so3.exp(jnp.asarray(w))
        t = jnp.asarray(np.array([0.5, -1.2, 2.0], np.float32))
        src = jnp.asarray(RNG.standard_normal((40, 3)).astype(np.float32))
        dst = src @ rot.T + t
        est = se3.rigid_align(src, dst)
        np.testing.assert_allclose(np.asarray(est.rot), np.asarray(rot), atol=1e-5)
        np.testing.assert_allclose(np.asarray(est.trans), np.asarray(t), atol=1e-5)

    def test_rigid_align_weights_ignore_outliers(self):
        src = jnp.asarray(RNG.standard_normal((20, 3)).astype(np.float32))
        dst = src + jnp.asarray([1.0, 0.0, 0.0])
        dst = dst.at[0].set(jnp.asarray([100.0, 100.0, 100.0]))
        w = jnp.ones(20).at[0].set(0.0)
        est = se3.rigid_align(src, dst, w)
        np.testing.assert_allclose(np.asarray(est.trans), [1.0, 0.0, 0.0], atol=1e-4)
