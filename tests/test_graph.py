"""Pose-graph GN/PCG solver tests: odometry chain with drift + loop closure
must pull the trajectory back to ground truth."""

import numpy as np
import jax.numpy as jnp

from rolo_tpu.geometry import so3, se3
from rolo_tpu.graph import empty_graph, add_between, solve_pose_graph

RNG = np.random.default_rng(33)


def build_square_trajectory(k_cap=32, n=12, drift=0.05):
    """Ground truth: a closed square path of n poses. Odometry measurements
    are exact; the initial estimate accumulates drift."""
    true = [se3.SE3(jnp.eye(3), jnp.zeros(3))]
    step_fwd = se3.SE3(
        so3.rpy_to_matrix(jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(2 * np.pi / n)),
        jnp.asarray([2.0, 0.0, 0.0]),
    )
    for _ in range(n - 1):
        true.append(true[-1].compose(step_fwd))

    graph = empty_graph(k_cap, 8, 8)
    rot0 = np.stack([np.asarray(t.rot) for t in true])
    trans0 = np.stack([np.asarray(t.trans) for t in true])

    # odometry relative measurements (exact)
    odom_rot = [np.eye(3, dtype=np.float32)]
    odom_trans = [np.zeros(3, np.float32)]
    for i in range(1, n):
        rel = true[i - 1].inverse().compose(true[i])
        odom_rot.append(np.asarray(rel.rot))
        odom_trans.append(np.asarray(rel.trans))

    # drifted initial estimate: integrate odometry with noise
    est = [true[0]]
    for i in range(1, n):
        noise_w = RNG.normal(0, drift * 0.2, 3).astype(np.float32)
        noise_t = RNG.normal(0, drift, 3).astype(np.float32)
        rel = se3.SE3(jnp.asarray(odom_rot[i]), jnp.asarray(odom_trans[i]))
        pert = se3.SE3(so3.exp(jnp.asarray(noise_w)), jnp.asarray(noise_t))
        est.append(est[-1].compose(rel).compose(pert))

    k = k_cap
    pad_rot = np.broadcast_to(np.eye(3, dtype=np.float32), (k - n, 3, 3))
    rot_est = np.concatenate([np.stack([np.asarray(e.rot) for e in est]), pad_rot])
    trans_est = np.concatenate(
        [np.stack([np.asarray(e.trans) for e in est]), np.zeros((k - n, 3), np.float32)]
    )
    orr = np.concatenate([np.stack(odom_rot), pad_rot])
    ort = np.concatenate([np.stack(odom_trans), np.zeros((k - n, 3), np.float32)])
    graph = graph._replace(
        odom_rel_rot=jnp.asarray(orr),
        odom_rel_trans=jnp.asarray(ort),
        first_rot=jnp.asarray(rot0[0]),
        first_trans=jnp.asarray(trans0[0]),
    )
    return graph, true, jnp.asarray(rot_est), jnp.asarray(trans_est), n


class TestPoseGraph:
    def test_odometry_only_exact(self):
        graph, true, rot_est, trans_est, n = build_square_trajectory(drift=0.03)
        sol = solve_pose_graph(graph, rot_est, trans_est, jnp.asarray(n), gn_iterations=10)
        # with exact odometry and no loops, the solution must re-integrate
        # the chain exactly from the anchored first pose
        for i in [1, n // 2, n - 1]:
            np.testing.assert_allclose(
                np.asarray(sol.trans[i]), np.asarray(true[i].trans), atol=2e-2
            )

    def test_loop_closure_corrects_drift(self):
        graph, true, rot_est, trans_est, n = build_square_trajectory(drift=0.08)
        # noisy odometry: rebuild relative measurements with noise so the
        # chain alone cannot recover truth
        noisy_rel_rot = np.asarray(graph.odom_rel_rot).copy()
        noisy_rel_trans = np.asarray(graph.odom_rel_trans).copy()
        for i in range(1, n):
            noisy_rel_trans[i] += RNG.normal(0, 0.05, 3).astype(np.float32)
        graph = graph._replace(
            odom_rel_rot=jnp.asarray(noisy_rel_rot),
            odom_rel_trans=jnp.asarray(noisy_rel_trans),
        )
        # loop factor: last pose -> first pose, exact measurement, tight noise
        rel = true[n - 1].inverse().compose(true[0])
        graph = graph._replace(
            loops=add_between(
                graph.loops,
                n - 1,
                0,
                rel.rot,
                rel.trans,
                jnp.asarray([1e-6, 1e-6, 1e-6, 1e-6, 1e-6, 1e-6]),
            )
        )
        sol = solve_pose_graph(graph, rot_est, trans_est, jnp.asarray(n), gn_iterations=10)

        # end-pose error must be small thanks to the loop
        err_end = np.linalg.norm(np.asarray(sol.trans[n - 1]) - np.asarray(true[n - 1].trans))
        drift_end = np.linalg.norm(np.asarray(trans_est[n - 1]) - np.asarray(true[n - 1].trans))
        assert err_end < 0.25 * drift_end + 0.05, (err_end, drift_end)

    def test_inactive_poses_fixed(self):
        graph, true, rot_est, trans_est, n = build_square_trajectory()
        sol = solve_pose_graph(graph, rot_est, trans_est, jnp.asarray(n), gn_iterations=3)
        np.testing.assert_allclose(np.asarray(sol.trans[n:]), np.asarray(trans_est[n:]), atol=1e-7)

    def test_robust_loop_rejects_outlier(self):
        graph, true, rot_est, trans_est, n = build_square_trajectory(drift=0.02)
        # a WRONG loop factor with Cauchy robustness: should be downweighted
        bogus = se3.SE3(jnp.eye(3), jnp.asarray([5.0, 5.0, 0.0]))
        graph = graph._replace(
            loops=add_between(
                graph.loops, n - 1, 0, bogus.rot, bogus.trans,
                jnp.asarray([1e-4] * 6), robust_c=jnp.asarray(1.0),
            )
        )
        sol = solve_pose_graph(graph, rot_est, trans_est, jnp.asarray(n), gn_iterations=10)
        # trajectory should stay near the odometry solution, not the bogus loop
        err = np.linalg.norm(np.asarray(sol.trans[n - 1]) - np.asarray(true[n - 1].trans))
        assert err < 0.6, err
