"""Failure-path robustness: degenerate inputs must never produce NaNs or
crashes anywhere in the pipeline (the reference's guard-clause behavior:
insufficient features backMapping.cpp:687,949-951, failureDetection
lidarOdometry.cpp:629-643, PoseSolver::FailureDetection
pose_solver.cpp:536-556)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from rolo_tpu.config import RoloConfig, StaticConfig
from rolo_tpu.frontend import odometry
from rolo_tpu.graph.factors import empty_graph
from rolo_tpu.graph.solver import solve_pose_graph
from rolo_tpu.mapping import keyframes
from rolo_tpu.config import RegistrationConfig
from rolo_tpu.geometry.se3 import SE3
from rolo_tpu.pointcloud.cloud import PaddedCloud
from rolo_tpu.registration.rotgicp import register_scan_pair


def _finite(tree):
    import jax

    ok = True
    for leaf in jax.tree_util.tree_leaves(tree):
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f":
            ok = ok and np.all(np.isfinite(arr))
    return ok


class TestDegenerateRegistration:
    def test_empty_source(self):
        n = 256
        tgt = jnp.asarray(np.random.default_rng(0).normal(size=(n, 3)), jnp.float32)
        res = register_scan_pair(
            jnp.zeros((n, 3)), jnp.zeros(n, bool), tgt, jnp.ones(n, bool),
            jnp.zeros(3), jnp.zeros(3), 0.1, 0.1, RegistrationConfig(), 512, 5,
        )
        assert _finite(res)

    def test_empty_target(self):
        n = 256
        src = jnp.asarray(np.random.default_rng(1).normal(size=(n, 3)), jnp.float32)
        res = register_scan_pair(
            src, jnp.ones(n, bool), jnp.zeros((n, 3)), jnp.zeros(n, bool),
            jnp.zeros(3), jnp.zeros(3), 0.1, 0.1, RegistrationConfig(), 512, 5,
        )
        assert _finite(res)

    def test_single_point_clouds(self):
        n = 256
        xyz = jnp.zeros((n, 3)).at[0].set(jnp.asarray([5.0, 1.0, 0.2]))
        mask = jnp.zeros(n, bool).at[0].set(True)
        res = register_scan_pair(
            xyz, mask, xyz, mask, jnp.zeros(3), jnp.zeros(3), 0.1, 0.1,
            RegistrationConfig(), 512, 5,
        )
        assert _finite(res)

    def test_colinear_degenerate_geometry(self):
        """All points on one line: covariances are rank-1, Hessians
        degenerate — results must stay finite."""
        n = 256
        t = np.linspace(0, 10, n)
        pts = np.stack([t, 2 * t, 0 * t], -1).astype(np.float32)
        xyz = jnp.asarray(pts)
        mask = jnp.ones(n, bool)
        res = register_scan_pair(
            xyz, mask, xyz, mask, jnp.zeros(3), jnp.zeros(3), 0.1, 0.1,
            RegistrationConfig(), 512, 5,
        )
        assert _finite(res)


class TestFrontendFailurePaths:
    def test_garbage_scan_sequence(self):
        """Alternate valid scans with empty/degenerate ones: the pose must
        stay finite throughout."""
        n = 512
        cfg = RegistrationConfig(max_outer_iterations=8)
        state = odometry.init_state(n)
        rng = np.random.default_rng(2)
        for i in range(5):
            if i % 2 == 0:
                xyz = jnp.asarray(rng.normal(0, 10, (n, 3)), jnp.float32)
                mask = jnp.ones(n, bool)
            else:
                xyz = jnp.zeros((n, 3))
                mask = jnp.zeros(n, bool)
            state, out = odometry.scan_step(state, xyz, mask, jnp.asarray(0.1), cfg, 512, 5)
            assert _finite((out.pose_rot, out.pose_trans)), i

    def test_failure_flag_on_jump(self):
        """A large instantaneous jump trips failureDetection
        (lidarOdometry.cpp:629-643 velocity bound)."""
        n = 512
        cfg = RegistrationConfig(max_outer_iterations=8)
        rng = np.random.default_rng(3)
        base = rng.normal(0, 10, (n, 3)).astype(np.float32)
        state = odometry.init_state(n)
        state, _ = odometry.scan_step(
            state, jnp.asarray(base), jnp.ones(n, bool), jnp.asarray(0.1), cfg, 512, 5
        )
        # next scan displaced 5 m -> 50 m/s >> sqrt(5)/0.1 bound
        state, out = odometry.scan_step(
            state, jnp.asarray(base - np.array([5.0, 0, 0], np.float32)),
            jnp.ones(n, bool), jnp.asarray(0.1), cfg, 512, 5,
        )
        # flag is informational (reference call site disabled :596-599)
        assert out.failure.dtype == bool


class TestCapacityOverflow:
    def test_keyframe_db_at_capacity(self):
        db = keyframes.init_db(4, 16, 16)
        cloud = PaddedCloud(jnp.zeros((16, 3)), jnp.ones(16, bool))
        for i in range(6):
            db = keyframes.add_keyframe(
                db, SE3(jnp.eye(3), jnp.asarray([float(i), 0, 0])), jnp.asarray(float(i)),
                cloud, cloud,
            )
        assert int(db.count) == 4  # silently saturates
        assert _finite(db.trans)

    @pytest.mark.slow
    def test_graph_solve_with_empty_graph(self):
        g = empty_graph(8, 4, 4)
        rot = jnp.broadcast_to(jnp.eye(3), (8, 3, 3))
        trans = jnp.zeros((8, 3))
        sol = solve_pose_graph(g, rot, trans, jnp.asarray(0, jnp.int32), gn_iterations=2, cg_iterations=5)
        assert _finite((sol.rot, sol.trans))


class TestFailureGateReset:
    @pytest.mark.slow
    def test_gate_holds_pose_and_zeroes_step_on_jump(self):
        """With enable_failure_gate, an injected jump REJECTS the step: the
        pose holds at the previous estimate and the next forward prediction
        is not seeded by the jump (the reset path the reference banners at
        lidarOdometry.cpp:567-569; detection bounds :629-643)."""
        n = 512
        cfg = RegistrationConfig(max_outer_iterations=8)
        rng = np.random.default_rng(3)
        base = rng.normal(0, 10, (n, 3)).astype(np.float32)

        def run(gate):
            state = odometry.init_state(n)
            state, _ = odometry.scan_step(
                state, jnp.asarray(base), jnp.ones(n, bool), jnp.asarray(0.1),
                cfg, 512, 5, enable_failure_gate=gate,
            )
            pose_before = np.asarray(state.pose_trans)
            # jump: scan displaced 5 m -> 50 m/s, far over the bound
            state, out = odometry.scan_step(
                state, jnp.asarray(base - np.array([5.0, 0, 0], np.float32)),
                jnp.ones(n, bool), jnp.asarray(0.1), cfg, 512, 5,
                enable_failure_gate=gate,
            )
            return state, out, pose_before

        st_on, out_on, before = run(True)
        assert bool(out_on.failure)
        np.testing.assert_allclose(np.asarray(st_on.pose_trans), before, atol=1e-6)
        np.testing.assert_allclose(np.asarray(st_on.step_trans), 0.0, atol=1e-6)

        st_off, out_off, before_off = run(False)
        assert bool(out_off.failure)
        # ungated: the (partially recovered) jump flows into the pose
        # (reference parity — the registration does not track the full 5 m
        # on an unstructured cloud, but the pose must move)
        assert np.linalg.norm(np.asarray(st_off.pose_trans) - before_off) > 0.1


class TestCrashRecovery:
    @pytest.mark.slow
    def test_checkpoint_kill_restore_matches_uninterrupted(self, tmp_path):
        """Elastic-recovery analog of respawn="true"
        (launch/module_loam.launch:6-9): checkpoint mid-sequence, discard
        the system, restore into a FRESH SlamSystem, finish the sequence —
        the final keyframe trajectory must match the uninterrupted run."""
        from rolo_tpu.runtime.slam import SlamSystem
        from rolo_tpu.sim import SimConfig, generate_sequence, ground_map_points
        from rolo_tpu.sim.dataset import make_scene
        from test_sim import SIM_SLAM_CFG

        cfg = SIM_SLAM_CFG  # small caps: keeps the 3 compile sets cheap
        sim = SimConfig(n_scans=24, n_cols=512, sensor="velodyne16", period=24.0, seed=0)
        scene = make_scene(sim)
        frames = list(generate_sequence(sim, scene))
        gm = ground_map_points(sim, scene)

        def feed(slam, fs):
            for f in fs:
                slam.process_scan(f.points, f.stamp, ring=f.ring, rel_time=f.rel_time)

        ref = SlamSystem(cfg)
        ref.set_ground_map(gm)
        feed(ref, frames)
        _, ref_kp, _ = ref.keyframe_trajectory()

        half = len(frames) // 2
        a = SlamSystem(cfg)
        a.set_ground_map(gm)
        feed(a, frames[:half])
        ckpt = str(tmp_path / "mid.npz")
        a.checkpoint(ckpt)
        del a  # the "crash"

        b = SlamSystem(cfg)
        b.set_ground_map(gm)
        b.restore(ckpt)
        # stamps keep the ORIGINAL epoch across the restore (checkpointed
        # host clocks); cadences and keyframe sync gates must still work
        feed(b, frames[half:])
        _, b_kp, _ = b.keyframe_trajectory()

        assert b_kp.shape[0] == ref_kp.shape[0], (b_kp.shape, ref_kp.shape)
        # same keyframe poses within a small band (the restored run redoes
        # the in-flight async tail, so bit-equality is not expected)
        err = np.linalg.norm(b_kp - ref_kp, axis=1)
        assert float(err.max()) < 0.05, err.max()
