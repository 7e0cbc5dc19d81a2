"""Mesh/batch parallelism tests on the 8-virtual-device CPU mesh
(conftest.py): sharded registration batches, batched odometry sequences,
batched prior solves, and sharding placement checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rolo_tpu.config import PriorConfig, RegistrationConfig
from rolo_tpu.parallel import (
    make_mesh,
    odometry_batch,
    prior_solve_batch,
    registration_batch,
    shard_batch,
    shard_registration_inputs,
)
from rolo_tpu.parallel.mesh import (
    distributed_init,
    make_pod_mesh,
    pod_batch_sharding,
    shard_batch_pod,
)
from rolo_tpu.prior import ground as gnd
from rolo_tpu.prior import vehicle as veh


def _structured(n, seed):
    rng = np.random.default_rng(seed)
    walls = []
    for nv, d in [((1, 0, 0), 8.0), ((0, 1, 0), 10.0), ((0, 0, 1), -1.5), ((0.7, 0.7, 0), 12.0)]:
        m = n // 4
        nv = np.array(nv, np.float64)
        nv /= np.linalg.norm(nv)
        t1 = np.cross(nv, [0, 0, 1.0] if abs(nv[2]) < 0.9 else [1.0, 0, 0])
        t1 /= np.linalg.norm(t1)
        t2 = np.cross(nv, t1)
        u = rng.uniform(-5, 5, (m, 2))
        walls.append(d * nv + u[:, :1] * t1 + u[:, 1:] * t2)
    pts = np.concatenate(walls)[:n].astype(np.float32)
    return pts + rng.normal(0, 0.005, pts.shape).astype(np.float32)


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest should provide 8 virtual devices"
    return make_mesh(8)


class TestMesh:
    def test_make_mesh_1d(self, mesh):
        assert mesh.shape["batch"] == 8

    def test_make_mesh_2d(self):
        m = make_mesh(8, axis_names=("host", "batch"), axis_sizes=(2, 4))
        assert m.shape["host"] == 2 and m.shape["batch"] == 4

    def test_shard_batch_placement(self, mesh):
        x = jnp.zeros((16, 4))
        y = jnp.zeros((3,))  # not divisible -> replicated
        sx, sy = shard_batch((x, y), mesh)
        assert len(sx.sharding.device_set) == 8
        assert sy.sharding.is_fully_replicated


class TestRegistrationBatch:
    @pytest.mark.slow
    def test_sharded_batch_matches_single(self, mesh):
        n, b = 512, 8
        cfg = RegistrationConfig(max_outer_iterations=16)
        src = np.stack([_structured(n, s) for s in range(b)])
        ang = 0.05
        c, s = np.cos(ang), np.sin(ang)
        rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        t = np.array([0.2, -0.1, 0.0], np.float32)
        tgt = src @ rot.T + t
        masks = np.ones((b, n), bool)

        inputs = shard_registration_inputs(
            mesh, jnp.asarray(src), jnp.asarray(masks), jnp.asarray(tgt), jnp.asarray(masks)
        )
        res = registration_batch(*inputs, cfg=cfg, voxel_capacity=2048, k=10)
        jax.block_until_ready(res)
        assert res.rot.shape == (b, 3, 3)
        for i in range(b):
            np.testing.assert_allclose(np.asarray(res.rot[i]), rot, atol=0.02)
            np.testing.assert_allclose(np.asarray(res.trans[i]), t, atol=0.08)

    @pytest.mark.slow
    def test_batch_result_deterministic_vs_unsharded(self, mesh):
        n, b = 256, 8
        cfg = RegistrationConfig(max_outer_iterations=8)
        src = np.stack([_structured(n, 100 + s) for s in range(b)])
        tgt = src + np.array([0.1, 0.0, 0.0], np.float32)
        masks = np.ones((b, n), bool)
        plain = registration_batch(
            jnp.asarray(src), jnp.asarray(masks), jnp.asarray(tgt), jnp.asarray(masks),
            jnp.zeros((b, 3)), jnp.zeros((b, 3)), jnp.full((b,), 0.1), jnp.full((b,), 0.1),
            cfg=cfg, voxel_capacity=1024, k=10,
        )
        inputs = shard_registration_inputs(
            mesh, jnp.asarray(src), jnp.asarray(masks), jnp.asarray(tgt), jnp.asarray(masks)
        )
        sharded = registration_batch(*inputs, cfg=cfg, voxel_capacity=1024, k=10)
        np.testing.assert_allclose(np.asarray(plain.trans), np.asarray(sharded.trans), atol=1e-4)


class TestOdometryBatch:
    @pytest.mark.slow
    def test_batched_sequences(self, mesh):
        b, t_steps, n = 8, 3, 256
        cfg = RegistrationConfig(max_outer_iterations=8)
        rng = np.random.default_rng(0)
        feats = np.zeros((b, t_steps, n, 3), np.float32)
        for i in range(b):
            base = _structured(n, 200 + i)
            for t in range(t_steps):
                feats[i, t] = base - np.array([0.2 * t, 0, 0], np.float32)
        masks = np.ones((b, t_steps, n), bool)
        intervals = np.full((b, t_steps), 0.1, np.float32)

        inputs = shard_batch(
            (jnp.asarray(feats), jnp.asarray(masks), jnp.asarray(intervals)), mesh
        )
        outs = odometry_batch(*inputs, cfg=cfg, voxel_capacity=1024, k=10)
        jax.block_until_ready(outs)
        assert outs.pose_trans.shape == (b, t_steps, 3)
        # sensor moves +x ~0.2/step
        final_x = np.asarray(outs.pose_trans[:, -1, 0])
        np.testing.assert_allclose(final_x, 0.4, atol=0.15)


class TestPriorBatch:
    def test_batched_prior_solves(self, mesh):
        cfg = PriorConfig(tolerance_roll=0.5, tolerance_pitch=0.5)
        rng = np.random.default_rng(1)
        xy = rng.uniform(-10, 10, (4096, 2))
        z = 0.1 * xy[:, 0]
        gm = gnd.GroundMap(
            jnp.asarray(np.column_stack([xy, z]).astype(np.float32)), jnp.ones(4096, bool)
        )
        vm = veh.from_config(cfg)
        b = 8
        xs = jnp.asarray(np.linspace(-3, 3, b), jnp.float32)
        ys = jnp.zeros(b, jnp.float32)
        yaws = jnp.zeros(b, jnp.float32)
        xs, ys, yaws = shard_batch((xs, ys, yaws), mesh)
        res = prior_solve_batch(gm, vm, xs, ys, yaws, cfg)
        assert bool(jnp.all(res.converged))
        # slope 0.1 in x -> pitch ~ -atan(0.1) sign aside, magnitude check
        np.testing.assert_allclose(
            np.abs(np.asarray(res.pitch)), np.arctan(0.1), atol=0.08
        )


class TestPodMesh:
    """2D ("host", "batch") pod mesh — the DCN/multi-host sharding layout
    emulated on virtual devices (host axis = device groups)."""

    def test_make_pod_mesh_shape(self):
        m = make_pod_mesh(n_hosts=2, devices_per_host=4)
        assert m.shape["host"] == 2 and m.shape["batch"] == 4

    def test_distributed_init_single_process_noop(self):
        # single-process: must be a no-op returning False, devices unchanged
        n_before = jax.device_count()
        assert distributed_init() is False
        assert jax.device_count() == n_before

    def test_shard_batch_pod_placement(self):
        m = make_pod_mesh(n_hosts=2, devices_per_host=4)
        x = jnp.zeros((16, 4))
        y = jnp.zeros((3,))
        sx, sy = shard_batch_pod((x, y), m)
        assert len(sx.sharding.device_set) == 8
        assert sx.sharding.is_equivalent_to(pod_batch_sharding(m), 2)
        assert sy.sharding.is_fully_replicated

    @pytest.mark.slow
    def test_pod_registration_matches_1d(self, mesh):
        from rolo_tpu.parallel.batch import ShardedRegistrationInputs

        n, b = 256, 8
        cfg = RegistrationConfig(max_outer_iterations=8)
        src = np.stack([_structured(n, 300 + s) for s in range(b)])
        tgt = src + np.array([0.15, -0.05, 0.0], np.float32)
        masks = np.ones((b, n), bool)
        dt = jnp.full((b,), 0.1, jnp.float32)
        tree = ShardedRegistrationInputs(
            jnp.asarray(src), jnp.asarray(masks), jnp.asarray(tgt), jnp.asarray(masks),
            jnp.zeros((b, 3), jnp.float32), jnp.zeros((b, 3), jnp.float32), dt, dt,
        )
        res_1d = registration_batch(
            *shard_batch(tree, mesh), cfg=cfg, voxel_capacity=1024, k=10
        )
        pod = make_pod_mesh(n_hosts=2, devices_per_host=4)
        res_2d = registration_batch(
            *shard_batch_pod(tree, pod), cfg=cfg, voxel_capacity=1024, k=10
        )
        np.testing.assert_allclose(
            np.asarray(res_1d.trans), np.asarray(res_2d.trans), atol=1e-4
        )


class TestSpmdRegistration:
    """Point-axis sharded registration (parallel/spmd.py): psum Hessian
    reduction must reproduce the single-device solve."""

    @pytest.mark.slow
    def test_spmd_matches_single_device(self, mesh):
        from rolo_tpu.parallel.spmd import register_scan_pair_spmd
        from rolo_tpu.registration.rotgicp import register_scan_pair

        n = 1024
        cfg = RegistrationConfig()
        src = _structured(n, 7)
        ang = 0.04
        c, s = np.cos(ang), np.sin(ang)
        r = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        tgt = (src @ r.T + np.array([0.25, -0.1, 0.02], np.float32)).astype(np.float32)
        mask = np.ones(n, bool)
        zeros = jnp.zeros(3, jnp.float32)
        dt = jnp.asarray(0.1, jnp.float32)

        point_mesh = make_mesh(8, axis_names=("point",))
        res_spmd = register_scan_pair_spmd(
            point_mesh,
            jnp.asarray(src), jnp.asarray(mask),
            jnp.asarray(tgt), jnp.asarray(mask),
            zeros, zeros, dt, dt, cfg, 2048, 10,
        )
        res_one = register_scan_pair(
            jnp.asarray(src), jnp.asarray(mask),
            jnp.asarray(tgt), jnp.asarray(mask),
            zeros, zeros, dt, dt, cfg, 2048, 10,
        )
        # identical problem, reductions reassociated -> near-identical solve
        np.testing.assert_allclose(
            np.asarray(res_spmd.rot), np.asarray(res_one.rot), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(res_spmd.trans), np.asarray(res_one.trans), atol=2e-3
        )
        # and the solve actually recovers the applied motion (coarse scene:
        # n=1024, k=10 — accuracy-grade checks live in test_registration)
        np.testing.assert_allclose(np.asarray(res_spmd.rot), r, atol=1.5e-2)
        np.testing.assert_allclose(
            np.asarray(res_spmd.trans), [0.25, -0.1, 0.02], atol=5e-2
        )

    def test_spmd_rejects_indivisible(self, mesh):
        from rolo_tpu.parallel.spmd import register_scan_pair_spmd

        point_mesh = make_mesh(8, axis_names=("point",))
        bad = jnp.zeros((100, 3), jnp.float32)
        m = jnp.ones((100,), bool)
        with pytest.raises(ValueError):
            register_scan_pair_spmd(
                point_mesh, bad, m, bad, m,
                jnp.zeros(3), jnp.zeros(3), 0.1, 0.1,
            )


class TestBatchedMapping:
    """BASELINE config 5 / SURVEY 2.7 last row (pod-scale batched
    MAPPING, not just registration — VERDICT r4 weak #5): B independent
    sequences' full backend_step (submap extraction, scan-to-submap GN,
    keyframe gating, odometry factors) vmapped and SHARDED over the
    device mesh, followed by a vmapped pose-graph solve. Pose-checked
    against each sequence's known trajectory."""

    def _cfg(self):
        from rolo_tpu.config import (
            FeatureConfig, LoopConfig, MappingConfig, RoloConfig, StaticConfig,
        )

        return RoloConfig(
            features=FeatureConfig(),
            mapping=MappingConfig(scan2map_max_iterations=4),
            loop=LoopConfig(enable=False),
            static=StaticConfig(
                max_raw_points=4096,
                max_corner_points=128,
                max_surf_points=512,
                max_feature_points=640,
                max_voxels=1024,
                max_keyframes=16,
                max_submap_points=2048,
                max_loop_factors=4,
                max_prior_factors=4,
                knn_query_chunk=128,
            ),
        )

    def _scan(self, trans, seed, n_corner=128, n_surf=512):
        """World sampled from a sensor at `trans` (identity rotation):
        surf = walls/ground planes, corner = vertical pillar edges."""
        rng = np.random.default_rng(seed)
        surf_w = _structured(n_surf, seed)
        # pillars: vertical lines at fixed xy
        pts = []
        for px, py in [(4.0, 2.0), (6.0, -3.0), (9.0, 1.0), (3.0, -1.5)]:
            m = n_corner // 4
            z = rng.uniform(-1.0, 2.0, (m, 1))
            pts.append(np.concatenate([np.full((m, 1), px), np.full((m, 1), py), z], axis=1))
        corner_w = np.concatenate(pts)[:n_corner].astype(np.float32)
        corner_w += rng.normal(0, 0.005, corner_w.shape).astype(np.float32)
        return corner_w - trans, surf_w - trans

    def test_full_slam_step_sharded(self, mesh):
        import jax.tree_util as jtu
        from jax.sharding import NamedSharding, PartitionSpec as P

        from rolo_tpu.graph.solver import solve_pose_graph
        from rolo_tpu.mapping import backend as mb
        from rolo_tpu.pointcloud.cloud import PaddedCloud

        cfg = self._cfg()
        st = cfg.static
        B, K = 8, 4
        sharding = NamedSharding(mesh, P("batch"))

        states = jtu.tree_map(
            lambda *xs: jnp.stack(xs), *[mb.init_backend(cfg) for _ in range(B)]
        )
        states = jtu.tree_map(lambda x: jax.device_put(x, sharding), states)

        step_fn = jax.jit(
            jax.vmap(
                lambda s, c, cm, f, fm, rot, tr, t: mb.backend_step(
                    s, PaddedCloud(c, cm), PaddedCloud(f, fm), PaddedCloud(f, fm),
                    rot, tr, jnp.asarray(True), t, cfg,
                ),
                in_axes=(0, 0, 0, 0, 0, 0, 0, 0),
            ),
            static_argnames=(),
        )

        # per-sequence speed: sequence b advances 0.8 + 0.05*b m per step
        gt = np.zeros((B, K, 3), np.float32)
        for b in range(B):
            for s in range(K):
                gt[b, s, 0] = (0.8 + 0.05 * b) * s

        for s in range(K):
            corners = np.zeros((B, st.max_corner_points, 3), np.float32)
            cmask = np.zeros((B, st.max_corner_points), bool)
            surfs = np.zeros((B, st.max_surf_points, 3), np.float32)
            smask = np.zeros((B, st.max_surf_points), bool)
            for b in range(B):
                cw, sw = self._scan(gt[b, s], seed=100 + b)
                corners[b, : len(cw)] = cw
                cmask[b, : len(cw)] = True
                surfs[b, : len(sw)] = sw
                smask[b, : len(sw)] = True
            rot = jnp.broadcast_to(jnp.eye(3), (B, 3, 3))
            # noisy front-end guess: scan2map must pull it back
            noise = np.random.default_rng(s).normal(0, 0.02, (B, 3)).astype(np.float32)
            tr = jnp.asarray(gt[:, s] + (noise if s else 0.0))
            t = jnp.full((B,), 0.5 * s, jnp.float32)
            states, out = step_fn(
                states, jax.device_put(jnp.asarray(corners), sharding),
                jax.device_put(jnp.asarray(cmask), sharding),
                jax.device_put(jnp.asarray(surfs), sharding),
                jax.device_put(jnp.asarray(smask), sharding),
                rot, tr, t,
            )

        counts = np.asarray(states.db.count)
        assert (counts == K).all(), counts
        kf = np.asarray(states.db.trans)[:, :K]
        err = np.linalg.norm(kf - gt, axis=2)
        assert err.max() < 0.25, err.max()

        # vmapped pose-graph solve over the batch (the relinearization
        # half of BASELINE config 5); no loop factors -> solution must
        # stay at the odometry chain
        sol = jax.jit(
            jax.vmap(lambda g, r, t, c: solve_pose_graph(g, r, t, c, method="dense"))
        )(states.graph, states.db.rot, states.db.trans, states.db.count)
        srot = np.asarray(sol.rot)[:, :K]
        strans = np.asarray(sol.trans)[:, :K]
        assert np.isfinite(strans).all()
        assert np.linalg.norm(strans - kf, axis=2).max() < 0.05
        assert np.abs(srot - np.asarray(states.db.rot)[:, :K]).max() < 0.05

        # the batch really is sharded across devices, not replicated
        assert len(states.db.trans.sharding.device_set) == 8
