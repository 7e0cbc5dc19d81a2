"""Loop-closure tests: scan-context descriptors against a numpy oracle,
detection on synthetic revisits, and ICP verification recovering a known
relative transform."""

import jax.numpy as jnp
import numpy as np
import pytest

from rolo_tpu.config import LoopConfig
from rolo_tpu.geometry.se3 import SE3
from rolo_tpu.loop import closure, scancontext
from rolo_tpu.mapping import keyframes
from rolo_tpu.pointcloud.cloud import PaddedCloud


def _numpy_descriptor(pts, num_ring=20, num_sector=60, max_radius=80.0, height=2.0):
    """Dense oracle of makeScancontext (Scancontext.cpp:151-195)."""
    desc = np.full((num_ring, num_sector), -1000.0)
    for x, y, z in pts:
        z = z + height
        r = np.sqrt(x * x + y * y)
        if r > max_radius:
            continue
        theta = np.degrees(np.arctan2(y, x))
        if theta < 0:
            theta += 360.0
        ring = max(min(num_ring, int(np.ceil(r / max_radius * num_ring))), 1)
        sector = max(min(num_sector, int(np.ceil(theta / 360.0 * num_sector))), 1)
        if desc[ring - 1, sector - 1] < z:
            desc[ring - 1, sector - 1] = z
    desc[desc == -1000.0] = 0.0
    return desc


def _scene(seed, n=2048):
    """Distinctive scene: a handful of building-like blobs at random spots
    (uniform boxes are indistinguishable under scan context)."""
    rng = np.random.default_rng(seed)
    blobs = []
    for _ in range(8):
        center = rng.uniform([-60, -60, 0], [60, 60, 0])
        size = rng.uniform([2, 2, 2], [8, 8, 12])
        m = n // 8
        blobs.append(center + rng.uniform(-0.5, 0.5, (m, 3)) * size)
    return np.concatenate(blobs)[:n].astype(np.float32)


class TestDescriptor:
    def test_matches_numpy_oracle(self):
        pts = _scene(0, 512)
        desc = scancontext.make_descriptor(jnp.asarray(pts), jnp.ones(512, bool))
        oracle = _numpy_descriptor(pts)
        np.testing.assert_allclose(np.asarray(desc), oracle, atol=1e-5)

    def test_masked_points_ignored(self):
        pts = _scene(1, 256)
        mask = np.ones(256, bool)
        mask[100:] = False
        d1 = scancontext.make_descriptor(jnp.asarray(pts), jnp.asarray(mask))
        d2 = scancontext.make_descriptor(jnp.asarray(pts[:100]), jnp.ones(100, bool))
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-6)

    def test_rotation_shifts_sectors(self):
        """A yaw rotation of the cloud circularly shifts the descriptor."""
        pts = _scene(2, 2048)
        shift = 6  # sectors
        ang = shift * 2 * np.pi / 60
        c, s = np.cos(ang), np.sin(ang)
        rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        d0 = np.asarray(scancontext.make_descriptor(jnp.asarray(pts), jnp.ones(2048, bool)))
        d1 = np.asarray(
            scancontext.make_descriptor(jnp.asarray(pts @ rot.T), jnp.ones(2048, bool))
        )
        # rotating by +ang moves points to higher sectors
        agree = np.mean(np.isclose(np.roll(d0, shift, axis=1), d1, atol=1e-4))
        assert agree > 0.95


class TestDetection:
    def _db_with_revisit(self, n_frames=40, revisit_of=2, yaw_sectors=0):
        cfg = LoopConfig(sc_num_exclude_recent=10, sc_dist_threshold=0.4)
        db = scancontext.init_db(64)
        scenes = [_scene(i) for i in range(n_frames - 1)]
        # last frame revisits scene `revisit_of`, optionally yaw-rotated
        ang = yaw_sectors * 2 * np.pi / 60
        c, s = np.cos(ang), np.sin(ang)
        rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        scenes.append(scenes[revisit_of] @ rot.T)
        for pts in scenes:
            desc = scancontext.make_descriptor(jnp.asarray(pts), jnp.ones(pts.shape[0], bool))
            db = scancontext.add_descriptor(db, desc)
        return db, cfg

    def test_detects_revisit(self):
        db, cfg = self._db_with_revisit()
        det = scancontext.detect_loop(db, cfg)
        assert bool(det.found)
        assert int(det.index) == 2
        assert float(det.distance) < 0.1

    def test_detects_rotated_revisit_with_yaw(self):
        db, cfg = self._db_with_revisit(yaw_sectors=5)
        det = scancontext.detect_loop(db, cfg)
        assert bool(det.found)
        assert int(det.index) == 2
        # yaw estimate within one sector of the true offset
        sector = 2 * np.pi / 60
        err = abs(((float(det.yaw_rad) - 5 * sector) + np.pi) % (2 * np.pi) - np.pi)
        assert err <= sector + 1e-6

    def test_no_loop_when_all_recent(self):
        cfg = LoopConfig(sc_num_exclude_recent=30)
        db = scancontext.init_db(64)
        for i in range(5):
            desc = scancontext.make_descriptor(jnp.asarray(_scene(i)), jnp.ones(2048, bool))
            db = scancontext.add_descriptor(db, desc)
        det = scancontext.detect_loop(db, cfg)
        assert not bool(det.found)

    def test_novel_scene_scores_far_worse_than_revisit(self):
        """Sparse synthetic scenes sit lower on the SC distance scale than
        real lidar, so check the discriminative margin rather than the
        absolute 0.4 production threshold: a true revisit must score well
        below every novel-scene match."""
        db_re, cfg = self._db_with_revisit()
        det_re = scancontext.detect_loop(db_re, cfg)

        db2 = scancontext.init_db(64)
        for i in range(40):
            desc = scancontext.make_descriptor(jnp.asarray(_scene(100 + i)), jnp.ones(2048, bool))
            db2 = scancontext.add_descriptor(db2, desc)
        det_novel = scancontext.detect_loop(db2, cfg)
        assert float(det_novel.distance) > 5.0 * max(float(det_re.distance), 0.01)
        # and with a threshold tightened to the synthetic scale it rejects
        tight = LoopConfig(sc_num_exclude_recent=10, sc_dist_threshold=0.1)
        assert not bool(scancontext.detect_loop(db2, tight).found)


def _structured_cloud(n, seed=0):
    """Points on walls/ground so ICP has structure."""
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


class TestICP:
    def test_recovers_known_transform(self):
        pts = _structured_cloud(1024)
        ang = 0.1
        c, s = np.cos(ang), np.sin(ang)
        rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        t = np.array([0.4, -0.2, 0.1], np.float32)
        src = PaddedCloud(jnp.asarray(pts), jnp.ones(1024, bool))
        tgt = PaddedCloud(jnp.asarray(pts @ rot.T + t), jnp.ones(1024, bool))
        res = closure.icp_point2point(
            src, tgt, jnp.eye(3), jnp.zeros(3), max_corr_dist=5.0, max_iterations=50
        )
        assert float(res.fitness) < 0.01
        np.testing.assert_allclose(np.asarray(res.rot), rot, atol=0.02)
        np.testing.assert_allclose(np.asarray(res.trans), t, atol=0.05)

    def test_padding_ignored(self):
        pts = _structured_cloud(512)
        src_xyz = np.zeros((1024, 3), np.float32)
        src_xyz[:512] = pts
        src_xyz[512:] = 1e6  # poisoned padding
        mask = np.zeros(1024, bool)
        mask[:512] = True
        src = PaddedCloud(jnp.asarray(src_xyz), jnp.asarray(mask))
        tgt = PaddedCloud(jnp.asarray(pts), jnp.ones(512, bool))
        res = closure.icp_point2point(
            src, tgt, jnp.eye(3), jnp.zeros(3), max_corr_dist=5.0, max_iterations=30
        )
        assert float(res.fitness) < 1e-3
        np.testing.assert_allclose(np.asarray(res.rot), np.eye(3), atol=1e-3)


class TestVerifyAndSubmap:
    def _db(self, n_kf=8, cloud_n=512):
        db = keyframes.init_db(16, cloud_n, cloud_n)
        pts = _structured_cloud(cloud_n)
        for i in range(n_kf):
            pose = SE3(jnp.eye(3), jnp.asarray([2.0 * i, 0.0, 0.0], jnp.float32))
            db = keyframes.add_keyframe(
                db, pose, jnp.asarray(float(i)),
                PaddedCloud(jnp.asarray(pts), jnp.ones(cloud_n, bool)),
                PaddedCloud(jnp.asarray(pts), jnp.ones(cloud_n, bool)),
            )
        return db, pts

    def test_assemble_submap_world_frame(self):
        db, pts = self._db()
        sub = closure.assemble_loop_submap(db, jnp.asarray(3), 1, 4096, 0.4)
        dense = sub.to_numpy()
        assert dense.shape[0] > 100
        # centroids of keyframes 2..4 span x offsets 4..8 around base 6
        assert abs(np.mean(dense[:, 0]) - (np.mean(pts[:, 0]) + 6.0)) < 1.5

    def test_verify_loop_accepts_true_revisit(self):
        db, pts = self._db()
        # keyframe 7 revisits keyframe 0's location but its stored pose has
        # drifted: true pose = pose0, stored pose = pose0 + [0.5, 0, 0]
        cur = closure.assemble_loop_submap(db, jnp.asarray(7), 0, 4096, 0.4)
        prev = closure.assemble_loop_submap(db, jnp.asarray(0), 2, 8192, 0.4)
        factor = closure.verify_loop(
            db, jnp.asarray(7), jnp.asarray(0), cur, prev,
            jnp.asarray(0.0), max_corr_dist=30.0, fitness_threshold=0.3, robust=True,
        )
        assert bool(factor.accepted)
        # both keyframes carry the same cloud; ICP maps kf7's world cloud
        # (x+14) onto kf0's (x+0) -> rel trans should be pose7^-1-ish
        rel = np.asarray(factor.rel_trans)
        assert np.all(np.isfinite(rel))
        assert float(factor.robust_c) == 1.0

    def test_detect_loop_distance(self):
        db, _ = self._db()
        # move last keyframe next to keyframe 0 and make times far apart
        db = db._replace(
            trans=db.trans.at[7].set(jnp.asarray([0.3, 0.0, 0.0])),
            time=db.time.at[7].set(100.0),
        )
        idx, found = closure.detect_loop_distance(
            db, jnp.zeros(16, bool), search_radius=5.0, time_diff=30.0
        )
        assert bool(found)
        assert int(idx) in (0, 1, 2)

    def test_detect_loop_distance_respects_time(self):
        db, _ = self._db()
        db = db._replace(trans=db.trans.at[7].set(jnp.asarray([0.3, 0.0, 0.0])))
        idx, found = closure.detect_loop_distance(
            db, jnp.zeros(16, bool), search_radius=5.0, time_diff=30.0
        )
        assert not bool(found)  # all times within 8 s


class TestScInputParity:
    """VERDICT round-2 item 9: the reference builds scan-context from the
    FULL deskewed cloud (backMapping.cpp:1183-1216); the runtime feeds the
    projected cloud (first-return dedup + range gates + downsampleRate).
    Quantify the descriptor delta between the two inputs at the default
    config — it must stay far below the SC acceptance threshold so the
    choice cannot flip loop decisions."""

    def test_projected_vs_full_cloud_descriptor(self):
        import jax.numpy as jnp

        from rolo_tpu.config import LoopConfig, RoloConfig
        from rolo_tpu.loop import scancontext as sc
        from rolo_tpu.pointcloud.projection import RawScan, project_scan
        from rolo_tpu.sim import SimConfig, generate_sequence

        cfg = RoloConfig()
        lc = cfg.loop
        sim = SimConfig(n_scans=2, n_cols=1024, sensor="velodyne32",
                        period=24.0, roughness=1.0, seed=5)
        frame = list(generate_sequence(sim))[-1]

        cap = cfg.static.max_raw_points
        m = min(len(frame.points), cap)
        xyz = np.zeros((cap, 3), np.float32); ring = np.zeros((cap,), np.int32)
        rel = np.zeros((cap,), np.float32); mask = np.zeros((cap,), bool)
        xyz[:m], ring[:m], rel[:m], mask[:m] = (
            frame.points[:m], frame.ring[:m], frame.rel_time[:m], True)

        img = project_scan(
            RawScan(jnp.asarray(xyz), jnp.asarray(ring), jnp.asarray(rel), jnp.asarray(mask)),
            cfg.sensor.n_scan, cfg.sensor.horizon_scan,
            cfg.sensor.lidar_min_range, cfg.sensor.lidar_max_range,
            cfg.sensor.downsample_rate,
        )

        def desc(points, pmask):
            return sc.make_descriptor(points, pmask, lc.sc_num_ring, lc.sc_num_sector,
                                      lc.sc_max_radius, lc.sc_lidar_height)

        d_full = desc(jnp.asarray(xyz), jnp.asarray(mask))
        d_proj = desc(img.xyz.reshape(-1, 3), img.mask.reshape(-1))

        # cosine column distance — the SC matching metric
        # (Scancontext.cpp:93-148); acceptance threshold is 0.4
        a = np.asarray(d_full); b = np.asarray(d_proj)
        na = np.linalg.norm(a, axis=0); nb = np.linalg.norm(b, axis=0)
        ok = (na > 0) & (nb > 0)
        cos = np.sum(a[:, ok] * b[:, ok], axis=0) / (na[ok] * nb[ok])
        dist = 1.0 - np.mean(cos)
        assert dist < 0.05, dist  # << 0.4 threshold: cannot flip decisions
