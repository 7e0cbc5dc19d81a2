"""Failure-path robustness: degenerate inputs must never produce NaNs or
crashes anywhere in the pipeline (the reference's guard-clause behavior:
insufficient features backMapping.cpp:687,949-951, failureDetection
lidarOdometry.cpp:629-643, PoseSolver::FailureDetection
pose_solver.cpp:536-556)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

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

    def test_graph_solve_with_empty_graph(self):
        g = empty_graph(8, 4, 4)
        rot = jnp.broadcast_to(jnp.eye(3), (8, 3, 3))
        trans = jnp.zeros((8, 3))
        sol = solve_pose_graph(g, rot, trans, jnp.asarray(0, jnp.int32), gn_iterations=2, cg_iterations=5)
        assert _finite((sol.rot, sol.trans))
