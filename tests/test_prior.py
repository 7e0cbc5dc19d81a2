"""Ground-prior stack tests: ground queries against numpy oracles, the
wheel-contact solver on flat and tilted planes, and prior association
gating/factor construction."""

import jax.numpy as jnp
import numpy as np

from rolo_tpu.config import PriorConfig
from rolo_tpu.geometry import so3
from rolo_tpu.geometry.se3 import SE3
from rolo_tpu.pointcloud.cloud import PaddedCloud
from rolo_tpu.prior import association, ground, vehicle

CFG = PriorConfig(tolerance_roll=0.5, tolerance_pitch=0.5)


def _plane_ground(normal=(0, 0, 1), d=0.0, extent=10.0, n=4096, seed=0, noise=0.0):
    """Ground samples of the plane n.p = d (z = (d - ax - by)/c)."""
    rng = np.random.default_rng(seed)
    a, b, c = normal
    xy = rng.uniform(-extent, extent, (n, 2))
    z = (d - a * xy[:, 0] - b * xy[:, 1]) / c
    if noise:
        z = z + rng.normal(0, noise, n)
    pts = np.column_stack([xy, z]).astype(np.float32)
    return ground.GroundMap(jnp.asarray(pts), jnp.ones(n, bool))


class TestGroundModel:
    def test_nearest_point_xy(self):
        gm = _plane_ground(d=2.0)
        q = jnp.asarray([1.0, 1.0])
        pt = np.asarray(ground.nearest_point_xy(gm, q))
        assert np.linalg.norm(pt[:2] - [1, 1]) < 0.5
        assert abs(pt[2] - 2.0) < 1e-4

    def test_average_height(self):
        gm = _plane_ground(d=3.0, noise=0.05)
        h, ok = ground.average_height_at(gm, jnp.asarray([0.0, 0.0]), 1.0, 5)
        assert bool(ok)
        assert abs(float(h) - 3.0) < 0.05

    def test_fit_local_surface_tilted(self):
        # z = 0.2 x  (normal ~ (-0.2, 0, 1)/|.|)
        gm = _plane_ground(normal=(-0.2, 0.0, 1.0), d=0.0, n=8192)
        pt, ok = ground.fit_local_surface(gm, jnp.asarray([2.0, 0.0]), radius=1.0)
        assert bool(ok)
        assert abs(float(pt[2]) - 0.4) < 0.05

    def test_fit_rejects_outliers(self):
        gm = _plane_ground(d=1.0, n=4096)
        # poison 2% of points with huge z
        xyz = np.asarray(gm.xyz).copy()
        xyz[:80, 2] = 50.0
        gm = ground.GroundMap(jnp.asarray(xyz), gm.mask)
        pt, ok = ground.fit_local_surface(gm, jnp.asarray([0.0, 0.0]), radius=2.0)
        assert bool(ok)
        assert abs(float(pt[2]) - 1.0) < 0.3

    def test_extract_patch(self):
        gm = _plane_ground(d=0.0)
        patch = ground.extract_patch(gm, jnp.asarray([0.0, 0.0]), 4.0, 1024)
        dense = patch.to_numpy()
        assert dense.shape[0] > 10
        assert np.all(np.abs(dense[:, :2]) <= 2.0 + 1e-5)

    def test_empty_map(self):
        gm = ground.GroundMap(jnp.zeros((64, 3)), jnp.zeros(64, bool))
        pt = ground.nearest_point_xyz = ground.nearest_point_xy(gm, jnp.asarray([1.0, 1.0]))
        np.testing.assert_allclose(np.asarray(pt), 0.0)
        _, ok = ground.fit_local_surface(gm, jnp.asarray([0.0, 0.0]))
        assert not bool(ok)


class TestPoseSolver:
    def test_flat_ground(self):
        """On z=0 ground the solved CoM height ~ com_z, roll/pitch ~ 0."""
        gm = _plane_ground(d=0.0, n=8192, noise=0.01)
        vm = vehicle.from_config(CFG)
        res = vehicle.solve_pose(gm, vm, 0.0, 0.0, 0.3, CFG)
        assert bool(res.success), (float(res.z), float(res.roll), float(res.pitch), bool(res.converged))
        assert abs(float(res.z) - CFG.vehicle_com_z) < 0.2
        assert abs(float(res.roll)) < 0.05
        assert abs(float(res.pitch)) < 0.05

    def test_tilted_ground_pitch(self):
        """Ground z = -0.2x (downhill in +x): vehicle facing +x pitches."""
        gm = _plane_ground(normal=(0.2, 0.0, 1.0), d=0.0, n=8192)
        vm = vehicle.from_config(CFG)
        res = vehicle.solve_pose(gm, vm, 0.0, 0.0, 0.0, CFG)
        assert bool(res.converged)
        slope = np.arctan(0.2)
        assert abs(abs(float(res.pitch)) - slope) < 0.08, float(res.pitch)
        assert abs(float(res.roll)) < 0.05

    def test_tilted_ground_roll(self):
        gm = _plane_ground(normal=(0.0, 0.2, 1.0), d=0.0, n=8192)
        vm = vehicle.from_config(CFG)
        res = vehicle.solve_pose(gm, vm, 0.0, 0.0, 0.0, CFG)
        assert bool(res.converged)
        slope = np.arctan(0.2)
        assert abs(abs(float(res.roll)) - slope) < 0.08, float(res.roll)

    def test_yaw_preserved(self):
        gm = _plane_ground(normal=(0.2, 0.0, 1.0), d=0.0, n=8192)
        vm = vehicle.from_config(CFG)
        res = vehicle.solve_pose(gm, vm, 1.0, -2.0, 0.7, CFG)
        yaw = np.arctan2(float(res.rot[1, 0]), float(res.rot[0, 0]))
        assert abs(yaw - 0.7) < 1e-3

    def test_failure_on_empty_ground(self):
        gm = ground.GroundMap(jnp.zeros((64, 3)), jnp.zeros(64, bool))
        vm = vehicle.from_config(CFG)
        res = vehicle.solve_pose(gm, vm, 0.0, 0.0, 0.0, CFG)
        assert not bool(res.success)


class TestPriorPipeline:
    def test_compute_prior(self):
        gm = _plane_ground(d=0.5, n=8192, noise=0.01)
        vm = vehicle.from_config(CFG)
        obs = association.compute_prior(gm, vm, jnp.asarray(1.0), jnp.asarray(2.0), jnp.asarray(0.4), CFG, 1024)
        assert bool(obs.success)
        assert abs(float(obs.trans[2]) - (0.5 + CFG.vehicle_com_z)) < 0.2
        assert int(obs.patch_mask.sum()) > 10

    def test_queue_and_association_accept(self):
        cfg = PriorConfig(
            near_prior_radius=2.0, fitness_score=0.05,
            tolerance_roll=0.5, tolerance_pitch=0.5,
        )
        gm = _plane_ground(d=0.0, n=8192, noise=0.005)
        vm = vehicle.from_config(cfg)

        linked = SE3(jnp.eye(3), jnp.asarray([0.0, 0.0, 1.0]))
        obs = association.compute_prior(gm, vm, jnp.asarray(3.0), jnp.asarray(0.0), jnp.asarray(0.0), cfg, 1024)
        assert bool(obs.success)

        q = association.init_queue(8, 1024)
        q = association.push_prior(q, obs, jnp.asarray(0), linked.rot, linked.trans)
        assert int(q.count) == 1

        # current keyframe has reached the prior location
        current = SE3(jnp.eye(3), jnp.asarray([3.0, 0.0, 1.0]))
        ground_now = PaddedCloud(gm.xyz, gm.mask)
        factor = association.associate_prior(
            q.rel_rot[0], q.rel_trans[0], q.linked_key[0],
            PaddedCloud(q.patch_xyz[0], q.patch_mask[0]), q.valid[0],
            linked.rot, linked.trans,
            jnp.asarray(5), current.rot, current.trans,
            ground_now, cfg,
        )
        assert bool(factor.accepted)
        assert int(factor.i) == 0 and int(factor.j) == 5
        # noise anisotropy: rz/tx/ty tight (backMapping.cpp:2132-2136)
        nv = np.asarray(factor.noise_var)
        assert nv[2] == 1e-6 and nv[3] == 1e-6 and nv[4] == 1e-6
        assert nv[0] > 1e-6 and nv[5] > 1e-6

    def test_association_rejects_far_prior(self):
        cfg = PriorConfig(near_prior_radius=1.0)
        gm = _plane_ground(d=0.0, n=4096)
        vm = vehicle.from_config(cfg)
        linked = SE3(jnp.eye(3), jnp.zeros(3))
        obs = association.compute_prior(gm, vm, jnp.asarray(3.0), jnp.asarray(0.0), jnp.asarray(0.0), cfg, 1024)
        q = association.init_queue(8, 1024)
        q = association.push_prior(q, obs, jnp.asarray(0), linked.rot, linked.trans)
        current = SE3(jnp.eye(3), jnp.asarray([8.0, 0.0, 0.0]))  # far away
        factor = association.associate_prior(
            q.rel_rot[0], q.rel_trans[0], q.linked_key[0],
            PaddedCloud(q.patch_xyz[0], q.patch_mask[0]), q.valid[0],
            linked.rot, linked.trans,
            jnp.asarray(5), current.rot, current.trans,
            PaddedCloud(gm.xyz, gm.mask), cfg,
        )
        assert not bool(factor.accepted)
