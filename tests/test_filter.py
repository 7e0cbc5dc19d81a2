"""ESKF + fusion tests: constant-velocity tracking, noise rejection,
re-initialization semantics, covariance behavior, future rollout, and the
mapping/front-end fusion composition."""

import jax
import jax.numpy as jnp
import numpy as np

from rolo_tpu.config import FilterConfig
from rolo_tpu.filter import eskf, fusion
from rolo_tpu.geometry import so3
from rolo_tpu.geometry.se3 import SE3

CFG = FilterConfig()


def _yaw_rot(yaw):
    c, s = np.cos(yaw), np.sin(yaw)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)


class TestESKF:
    def test_first_measurement_initializes(self):
        st = eskf.init_filter(CFG)
        st, ok = eskf.process_measurement(
            st, 1.0, jnp.asarray([1.0, 2.0, 3.0]), jnp.eye(3), CFG
        )
        assert bool(ok) and bool(st.initialized)
        np.testing.assert_allclose(np.asarray(st.pos), [1, 2, 3], atol=1e-6)
        assert float(st.last_time) == 1.0

    def test_rejects_non_positive_dt(self):
        st = eskf.init_filter(CFG)
        st, _ = eskf.process_measurement(st, 1.0, jnp.zeros(3), jnp.eye(3), CFG)
        st2, ok = eskf.process_measurement(st, 0.5, jnp.ones(3), jnp.eye(3), CFG)
        assert not bool(ok)
        np.testing.assert_allclose(np.asarray(st2.pos), np.asarray(st.pos))

    def test_reinitializes_after_gap(self):
        st = eskf.init_filter(CFG)
        st, _ = eskf.process_measurement(st, 1.0, jnp.zeros(3), jnp.eye(3), CFG)
        # feed some motion so vel != 0
        st, _ = eskf.process_measurement(st, 1.1, jnp.asarray([1.0, 0, 0]), jnp.eye(3), CFG)
        # gap > max_dt=1.0 -> hard re-init: velocity zeroed
        st, ok = eskf.process_measurement(st, 5.0, jnp.asarray([9.0, 0, 0]), jnp.eye(3), CFG)
        assert bool(ok)
        np.testing.assert_allclose(np.asarray(st.pos), [9, 0, 0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(st.vel), 0.0, atol=1e-9)

    def test_tracks_constant_velocity(self):
        """Feed a 1 m/s x-translation at 10 Hz; after convergence the filter
        velocity approaches [1, 0, 0] and predictions lead the last pose."""
        st = eskf.init_filter(CFG)
        for i in range(30):
            t = 0.1 * i
            st, _ = eskf.process_measurement(
                st, t, jnp.asarray([1.0 * t, 0.0, 0.0]), jnp.eye(3), CFG
            )
        vel = np.asarray(st.vel)
        assert abs(vel[0] - 1.0) < 0.2, vel
        st2, ok = eskf.state_predict(st, 0.1 * 29 + 0.1, CFG)
        assert bool(ok)
        assert float(st2.pos[0]) > float(st.pos[0]) + 0.05

    def test_tracks_constant_yaw_rate(self):
        st = eskf.init_filter(CFG)
        rate = 0.5  # rad/s
        for i in range(40):
            t = 0.1 * i
            st, _ = eskf.process_measurement(
                st, t, jnp.zeros(3), jnp.asarray(_yaw_rot(rate * t)), CFG
            )
        omega = np.asarray(st.omega)
        assert abs(omega[2] - rate) < 0.15, omega

    def test_update_pulls_toward_measurement(self):
        st = eskf.init_filter(CFG)
        st, _ = eskf.process_measurement(st, 0.0, jnp.zeros(3), jnp.eye(3), CFG)
        st, _ = eskf.process_measurement(st, 0.1, jnp.asarray([0.5, 0, 0]), jnp.eye(3), CFG)
        x = float(st.pos[0])
        assert 0.0 < x <= 0.5  # between prior and measurement

    def test_covariance_symmetric_finite(self):
        st = eskf.init_filter(CFG)
        for i in range(10):
            st, _ = eskf.process_measurement(
                st, 0.1 * i, jnp.asarray([0.1 * i, 0, 0]), jnp.eye(3), CFG
            )
        p = np.asarray(st.cov)
        assert np.all(np.isfinite(p))
        np.testing.assert_allclose(p, p.T, atol=1e-4)
        assert np.all(np.diag(p) > -1e-6)

    def test_propagate_covers_horizon(self):
        st = eskf.init_filter(CFG)
        for i in range(30):
            t = 0.1 * i
            st, _ = eskf.process_measurement(
                st, t, jnp.asarray([2.0 * t, 0.0, 0.0]), jnp.eye(3), CFG
            )
        roll = eskf.state_propagate(st, CFG)
        mask = np.asarray(roll.mask)
        assert mask.sum() > 0
        dist = np.linalg.norm(
            np.diff(np.asarray(roll.pos)[mask], axis=0, prepend=np.asarray(st.pos)[None]),
            axis=1,
        ).sum()
        # ~2 m/s * 0.2 s steps to an 8 m budget
        assert 7.0 < dist < 10.0, dist

    def test_propagate_uninitialized_empty(self):
        roll = eskf.state_propagate(eskf.init_filter(CFG), CFG)
        assert not bool(jnp.any(roll.mask))


class TestFusion:
    def test_fused_pose_composes_mapping_and_increment(self):
        fs = fusion.init_fusion(CFG)
        # front-end odometry walks in x
        for i in range(20):
            t = 0.1 * i
            fs, _ = fusion.on_front_odometry(
                fs, t, jnp.eye(3), jnp.asarray([1.0 * t, 0.0, 0.0]), CFG
            )
        # mapping says scan at t=1.5 (front pose [1.5,0,0]) is really at
        # [10, 5, 0] rotated 90 deg
        m_rot = jnp.asarray(_yaw_rot(np.pi / 2))
        fs = fusion.on_mapping_odometry(
            fs, m_rot, jnp.asarray([10.0, 5.0, 0.0]),
            jnp.eye(3), jnp.asarray([1.5, 0.0, 0.0]),
        )
        out = fusion.fused_pose(fs, 1.9 + 1e-3, CFG)
        assert bool(out.valid)
        # increment since anchor ~ [0.4, 0, 0]; rotated 90deg -> +y
        fused = np.asarray(out.trans)
        assert abs(fused[0] - 10.0) < 0.3, fused
        assert abs(fused[1] - 5.4) < 0.3, fused

    def test_future_prediction_local_frame(self):
        fs = fusion.init_fusion(CFG)
        for i in range(30):
            t = 0.1 * i
            fs, _ = fusion.on_front_odometry(
                fs, t, jnp.eye(3), jnp.asarray([2.0 * t, 0.0, 0.0]), CFG
            )
        fut = fusion.predict_future(fs, CFG)
        assert bool(fut.valid)
        # motion is +x in the local frame; z forced to 0
        assert float(fut.final_pos[0]) > 1.0
        assert abs(float(fut.final_pos[2])) < 1e-6
        assert float(fut.local_velocity[0]) > 1.0

    def test_invalid_before_mapping(self):
        fs = fusion.init_fusion(CFG)
        fs, _ = fusion.on_front_odometry(fs, 0.0, jnp.eye(3), jnp.zeros(3), CFG)
        out = fusion.fused_pose(fs, 0.1, CFG)
        assert not bool(out.valid)


class TestJitAndBatch:
    def test_vmap_over_filters(self):
        """Many sequences' filters batch with vmap (pod-scale axis)."""
        b = 4
        states = jax.vmap(lambda _: eskf.init_filter(CFG))(jnp.arange(b))
        pos = jnp.stack([jnp.asarray([float(i), 0.0, 0.0]) for i in range(b)])
        rots = jnp.stack([jnp.eye(3)] * b)
        ts = jnp.full((b,), 1.0)
        step = jax.vmap(
            lambda s, t, p, r: eskf.process_measurement(s, t, p, r, CFG)
        )
        states, ok = step(states, ts, pos, rots)
        assert bool(jnp.all(ok))
        states, ok = step(states, ts + 0.1, pos + 0.1, rots)
        assert bool(jnp.all(ok))
        np.testing.assert_allclose(np.asarray(states.pos[:, 0]), np.arange(b) + 0.1, atol=0.2)
