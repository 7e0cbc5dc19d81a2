"""Backend orchestrator integration tests: keyframe lifecycle, scan-to-
submap tracking against a synthetic world, loop-closure factor insertion,
and pose-graph correction."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from rolo_tpu.config import LoopConfig, MappingConfig, RoloConfig, StaticConfig
from rolo_tpu.geometry import so3
from rolo_tpu.mapping import backend
from rolo_tpu.pointcloud.cloud import PaddedCloud

SMALL = RoloConfig(
    mapping=MappingConfig(scan2map_max_iterations=8, degeneracy_eigen_threshold=10.0),
    loop=LoopConfig(
        loop_close_type="rs",
        history_search_radius=5.0,
        history_search_time_diff=3.0,
        history_search_num=2,
        history_fitness_score=0.3,
        sc_num_exclude_recent=3,
    ),
    static=StaticConfig(
        max_corner_points=512,
        max_surf_points=1024,
        max_feature_points=1536,
        max_submap_points=4096,
        max_keyframes=64,
        max_loop_factors=16,
        max_prior_factors=16,
        knn_query_chunk=256,
    ),
)


def _world(seed=0):
    """Structured world: vertical corner lines + walls + ground."""
    rng = np.random.default_rng(seed)
    corners = []
    for cx, cy in [(5, 5), (10, -4), (16, 6), (22, -5), (28, 4), (3, -6), (14, 1), (25, 8)]:
        z = rng.uniform(-1, 2, (60, 1))
        pts = np.column_stack([np.full((60, 1), float(cx)), np.full((60, 1), float(cy)), z])
        corners.append(pts + rng.normal(0, 0.01, pts.shape))
    corner_w = np.concatenate(corners).astype(np.float32)

    surfs = []
    # ground
    gxy = rng.uniform([-5, -10], [35, 10], (900, 2))
    surfs.append(np.column_stack([gxy, np.full(900, -1.5) + rng.normal(0, 0.01, 900)]))
    # two walls
    wx = rng.uniform(-5, 35, 400)
    wz = rng.uniform(-1, 2.5, 400)
    surfs.append(np.column_stack([wx, np.full(400, 8.0) + rng.normal(0, 0.01, 400), wz]))
    surfs.append(np.column_stack([wx, np.full(400, -8.0) + rng.normal(0, 0.01, 400), wz]))
    surf_w = np.concatenate(surfs).astype(np.float32)
    return corner_w, surf_w


def _scan_at(world_pts, rot, trans, capacity, max_range=25.0):
    """World points within range, expressed in the sensor frame."""
    local = (world_pts - trans) @ rot  # R^T (p - t)
    keep = np.linalg.norm(local, axis=1) < max_range
    return PaddedCloud.from_points(local[keep], capacity)


def _yaw_rot(yaw):
    c, s = np.cos(yaw), np.sin(yaw)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)


def _run_sequence(poses, cfg=SMALL, drift_per_step=np.zeros(3, np.float32)):
    corner_w, surf_w = _world()
    st = backend.init_backend(cfg)
    outs = []
    front = np.zeros(3, np.float32)
    for i, (yaw, trans) in enumerate(poses):
        rot = _yaw_rot(yaw)
        corner = _scan_at(corner_w, rot, trans, cfg.static.max_corner_points)
        surf = _scan_at(surf_w, rot, trans, cfg.static.max_surf_points)
        front = trans + drift_per_step * i  # front-end odometry with drift
        st, out = backend.backend_step(
            st, corner, surf, surf,
            jnp.asarray(rot), jnp.asarray(front),
            jnp.asarray(True), jnp.asarray(float(i)), cfg,
        )
        outs.append(out)
    return st, outs


class TestBackendStep:
    def test_first_scan_creates_keyframe(self):
        corner_w, surf_w = _world()
        st = backend.init_backend(SMALL)
        rot = np.eye(3, dtype=np.float32)
        trans = np.zeros(3, np.float32)
        corner = _scan_at(corner_w, rot, trans, SMALL.static.max_corner_points)
        surf = _scan_at(surf_w, rot, trans, SMALL.static.max_surf_points)
        st, out = backend.backend_step(
            st, corner, surf, surf, jnp.eye(3), jnp.zeros(3),
            jnp.asarray(True), jnp.asarray(0.0), SMALL,
        )
        assert bool(out.keyframe_added)
        assert int(st.db.count) == 1
        assert int(st.scdb.count) == 1

    def test_tracks_straight_trajectory(self):
        """Backend pose should follow ground truth when the front end is
        exact (scan2map refines an already-correct guess)."""
        poses = [(0.0, np.array([1.0 * i, 0.0, 0.0], np.float32)) for i in range(8)]
        st, outs = _run_sequence(poses)
        assert int(st.db.count) >= 6
        final = np.asarray(outs[-1].trans)
        np.testing.assert_allclose(final, [7.0, 0.0, 0.0], atol=0.3)

    def test_corrects_drifting_frontend(self):
        """Front end drifts +2 cm/scan in y; scan2map against the submap
        should keep the mapped pose near truth."""
        poses = [(0.0, np.array([1.0 * i, 0.0, 0.0], np.float32)) for i in range(8)]
        st, outs = _run_sequence(poses, drift_per_step=np.array([0.0, 0.02, 0.0], np.float32))
        final = np.asarray(outs[-1].trans)
        # drift would put y at 7*0.14=...: cumulative guess error ~0.14 m;
        # mapping should cut it well below the raw drift
        assert abs(final[1]) < 0.08, final
        np.testing.assert_allclose(final[0], 7.0, atol=0.4)

    def test_keyframe_gating(self):
        """Scans that barely move should not all become keyframes."""
        poses = [(0.0, np.array([0.05 * i, 0.0, 0.0], np.float32)) for i in range(6)]
        st, _ = _run_sequence(poses)
        assert int(st.db.count) <= 2


class TestLoopClosure:
    def test_rs_loop_detected_and_solved(self):
        """An out-and-back trajectory: the return to the start triggers a
        radius-search loop, the factor lands in the graph, and the next
        keyframe triggers a pose-graph solve."""
        xs = list(np.linspace(0, 6, 7)) + list(np.linspace(6, 0.2, 7))
        poses = [(0.0, np.array([x, 0.0, 0.0], np.float32)) for x in xs]

        corner_w, surf_w = _world()
        cfg = SMALL
        st = backend.init_backend(cfg)
        closed_any = False
        for i, (yaw, trans) in enumerate(poses):
            rot = _yaw_rot(yaw)
            corner = _scan_at(corner_w, rot, trans, cfg.static.max_corner_points)
            surf = _scan_at(surf_w, rot, trans, cfg.static.max_surf_points)
            st, out = backend.backend_step(
                st, corner, surf, surf, jnp.asarray(rot), jnp.asarray(trans),
                jnp.asarray(True), jnp.asarray(float(i)), cfg,
            )
            st, closed = backend.loop_closure_step(st, cfg)
            closed_any = closed_any or bool(closed)
        assert closed_any
        assert int(st.graph.loops.count) >= 1
        # factor endpoints are distinct keyframes
        li = int(st.graph.loops.i[0])
        lj = int(st.graph.loops.j[0])
        assert li != lj
        # after the loop, a solve happened or is pending
        assert (not bool(st.pending_solve)) or bool(st.pending_solve)
        assert np.all(np.isfinite(np.asarray(st.db.trans)))
