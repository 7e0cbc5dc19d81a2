"""Native host library tests: PCD decode parity with the numpy reader,
rosbag parsing against the reference's checked-in fixture, the prefetch
queue, and the eskf_odom_test regression (SURVEY.md section 4: the
reference's only fixture-driven test replays resource/test_odom.bag
through PoseESEKF)."""

import os

import numpy as np
import pytest

from rolo_tpu.cpp import (
    BagReader,
    ScanPrefetchQueue,
    is_available,
    read_pcd_native,
)
from rolo_tpu.runtime import io as rio

pytestmark = pytest.mark.skipif(not is_available(), reason="librolo_host not built")

REF_BAG = "/root/reference/resource/test_odom.bag"


class TestPcdNative:
    def test_matches_numpy_reader(self, tmp_path):
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(500, 3)).astype(np.float32)
        inten = rng.uniform(0, 255, 500).astype(np.float32)
        path = str(tmp_path / "x.pcd")
        rio.write_pcd(path, pts, intensity=inten)
        out = read_pcd_native(path)
        np.testing.assert_allclose(out["xyz"], pts, atol=1e-6)
        np.testing.assert_allclose(out["intensity"], inten, atol=1e-5)
        # missing fields zero-filled
        assert np.all(out["ring"] == 0)

    def test_ascii_pcd(self, tmp_path):
        pts = np.random.default_rng(1).normal(size=(60, 3)).astype(np.float32)
        path = str(tmp_path / "a.pcd")
        rio.write_pcd(path, pts, binary=False)
        out = read_pcd_native(path)
        np.testing.assert_allclose(out["xyz"], pts, atol=1e-4)


@pytest.mark.skipif(not os.path.exists(REF_BAG), reason="reference bag not mounted")
class TestBagReader:
    def test_index(self):
        bag = BagReader(REF_BAG)
        assert bag.connections == [("/odometry/lidar_incremental", "nav_msgs/Odometry")]
        assert len(bag) > 2000

    def test_messages_time_sorted(self):
        bag = BagReader(REF_BAG)
        times = [bag.message_info(i)[1] for i in range(0, len(bag), 250)]
        assert all(b >= a for a, b in zip(times, times[1:]))

    def test_odometry_payload(self):
        bag = BagReader(REF_BAG)
        odo = bag.read_odometry(0)
        assert np.isfinite(odo["position"]).all()
        assert abs(np.linalg.norm(odo["quat_xyzw"]) - 1.0) < 1e-3
        # trajectory should move over the bag
        last = bag.read_odometry(len(bag) - 1)
        assert np.linalg.norm(last["position"] - odo["position"]) > 10.0


class TestPrefetchQueue:
    def test_streams_all_files_in_order(self, tmp_path):
        paths = []
        for i in range(6):
            pts = np.full((10, 3), float(i), np.float32)
            p = str(tmp_path / f"{i}.pcd")
            rio.write_pcd(p, pts)
            paths.append(p)
        q = ScanPrefetchQueue(paths, fmt=ScanPrefetchQueue.FORMAT_PCD, capacity=64, depth=2)
        seen = []
        while (scan := q.pop()) is not None:
            assert scan["xyz"].shape == (10, 3)
            seen.append(scan["index"])
            np.testing.assert_allclose(scan["xyz"], float(scan["index"]))
        q.close()
        assert seen == list(range(6))

    def test_kitti_format(self, tmp_path):
        pts = np.random.default_rng(2).normal(size=(30, 4)).astype(np.float32)
        p = str(tmp_path / "0.bin")
        pts.tofile(p)
        q = ScanPrefetchQueue([p], fmt=ScanPrefetchQueue.FORMAT_KITTI, capacity=64)
        scan = q.pop()
        np.testing.assert_allclose(scan["xyz"], pts[:, :3], atol=1e-6)
        np.testing.assert_allclose(scan["intensity"], pts[:, 3], atol=1e-6)
        assert q.pop() is None
        q.close()


@pytest.mark.skipif(not os.path.exists(REF_BAG), reason="reference bag not mounted")
class TestEskfOdomRegression:
    """The reference's eskf_odom_test (test/eskf_odom_test.cpp:17-223)
    replays /odometry/lidar_incremental through PoseESEKF and compares raw
    vs filtered paths visually. Here the same replay asserts numerically:
    the filter tracks the raw trajectory closely while staying smooth."""

    def test_filter_tracks_bag_odometry(self, tmp_path):
        import jax.numpy as jnp

        from rolo_tpu.config import FilterConfig
        from rolo_tpu.filter import eskf
        from rolo_tpu.geometry import so3

        cfg = FilterConfig()
        bag = BagReader(REF_BAG)
        st = eskf.init_filter(cfg)
        raw, filt, stamps, quats_raw, quats_filt = [], [], [], [], []
        # f32 device time cannot carry UNIX-epoch stamps (resolution ~128 s
        # at 1.7e9); rebase to the session start like SlamSystem does
        epoch = bag.read_odometry(0)["stamp"]
        # subsample for speed; preserve ordering
        for i in range(0, 1200, 3):
            odo = bag.read_odometry(i)
            q = odo["quat_xyzw"]
            quat_wxyz = jnp.asarray([q[3], q[0], q[1], q[2]], jnp.float32)
            rot = so3.quat_to_matrix(quat_wxyz)
            pos = jnp.asarray(odo["position"], jnp.float32)
            st, ok = eskf.process_measurement(st, odo["stamp"] - epoch, pos, rot, cfg)
            if bool(ok):
                raw.append(np.asarray(pos))
                filt.append(np.asarray(st.pos))
                stamps.append(odo["stamp"] - epoch)
                quats_raw.append(np.asarray(quat_wxyz))
                quats_filt.append(np.asarray(so3.matrix_to_quat(st.rot)))
        raw = np.asarray(raw)
        filt = np.asarray(filt)
        assert len(raw) > 300
        err = np.linalg.norm(raw - filt, axis=1)
        # converged tracking within the measurement noise scale
        assert np.median(err[50:]) < 0.5, np.median(err[50:])
        assert np.all(np.isfinite(filt))

        # smoothness: the constant-jerk prior must damp the raw stream's
        # scan-to-scan jitter (the visual raw-vs-filtered comparison of
        # eskf_odom_test.launch made numeric). Roughness = mean second
        # difference norm, converged segment only.
        rough_raw = float(np.mean(np.linalg.norm(np.diff(raw[50:], 2, axis=0), axis=1)))
        rough_filt = float(np.mean(np.linalg.norm(np.diff(filt[50:], 2, axis=0), axis=1)))
        assert rough_filt < rough_raw, (rough_filt, rough_raw)

        # both paths as TUM artifacts (the reference publishes raw vs
        # filtered paths for external comparison)
        rio.write_tum(str(tmp_path / "bag_raw_tum.txt"), stamps, raw, np.asarray(quats_raw))
        rio.write_tum(str(tmp_path / "bag_filtered_tum.txt"), stamps, filt, np.asarray(quats_filt))
        t, p, _ = rio.read_tum(str(tmp_path / "bag_filtered_tum.txt"))
        assert len(t) == len(stamps)
        np.testing.assert_allclose(p, filt, atol=1e-4)


class TestBagWriter:
    """bagwriter.py <-> native BagReader roundtrip: the writer produces a
    real rosbag v2 the native parser indexes and decodes bit-true."""

    def test_roundtrip(self, tmp_path):
        from rolo_tpu.runtime.bagwriter import write_bag

        rng = np.random.default_rng(0)
        scans = []
        for i in range(3):
            n = 200 + 30 * i
            xyz = rng.normal(size=(n, 3)).astype(np.float32) * 10
            inten = rng.uniform(0, 100, n).astype(np.float32)
            ring = rng.integers(0, 16, n).astype(np.int32)
            rel = rng.uniform(0, 0.1, n).astype(np.float32)
            scans.append((100.0 + 0.1 * i, xyz, inten, ring, rel))
        path = str(tmp_path / "w.bag")
        assert write_bag(path, scans) == 3

        bag = BagReader(path)
        assert bag.connections == [("/points_raw", "sensor_msgs/PointCloud2")]
        assert len(bag) == 3
        for i, (stamp, xyz, inten, ring, rel) in enumerate(scans):
            fields = bag.read_pointcloud2(i)
            np.testing.assert_allclose(fields["xyz"], xyz, atol=1e-6)
            np.testing.assert_allclose(fields["intensity"], inten, atol=1e-5)
            np.testing.assert_array_equal(fields["ring"], ring)
            np.testing.assert_allclose(fields["time"], rel, atol=1e-7)
            _, t, _ = bag.message_info(i)
            assert abs(t - stamp) < 1e-6


FIXTURE_BAG = os.path.join(os.path.dirname(__file__), "fixtures", "sim_bag")


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(os.path.join(FIXTURE_BAG, "seq.bag")),
                    reason="bag fixture missing")
class TestBagEndToEnd:
    """VERDICT r4 item 8: recorded (non-simulated-in-process) data through
    the FULL stack — native BagReader decode -> SlamSystem -> TUM/g2o
    export -> ATE vs the fixture's ground truth — via the public CLI."""

    def test_cli_run_on_bag(self, tmp_path, capsys):
        import json

        from rolo_tpu.__main__ import main as cli_main

        out_dir = str(tmp_path / "out")
        rc = cli_main([
            "run", "--input", os.path.join(FIXTURE_BAG, "seq.bag"),
            "--config", os.path.join(FIXTURE_BAG, "config.yaml"),
            "--gt", os.path.join(FIXTURE_BAG, "gt_tum.txt"),
            "--output", out_dir, "--progress", "0",
        ])
        assert rc == 0
        captured = capsys.readouterr().out
        res = json.loads(captured[captured.index("{"):])
        assert res["n_scans"] == 12
        # VLP-16 @ 384 cols, ~1.7 m/s: smoke-grade accuracy bound (the
        # fixture exists to prove the decode+pipeline path end-to-end)
        assert res["ate_frontend_rmse_m"] < 0.5
        assert os.path.exists(os.path.join(out_dir, "front_end_tum.txt"))
        assert os.path.exists(os.path.join(out_dir, "optimized_tum.txt"))
        assert os.path.exists(os.path.join(out_dir, "pose_graph.g2o"))
