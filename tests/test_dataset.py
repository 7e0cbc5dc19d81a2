"""Dataset-harness ingest tests (runtime/dataset.py): KITTI .bin dirs, PCD
dirs with Velodyne `time` and Ouster `t` (nanosecond) per-point fields
(the per-sensor normalization of cachePointCloud,
/root/reference/src/imageProjection.cpp:179-263)."""

import struct

import numpy as np

from rolo_tpu.runtime import dataset as ds
from rolo_tpu.runtime import io as rio


def _write_ouster_pcd(path, n=64):
    """Binary PCD shaped like an Ouster driver dump: x y z (F4),
    ring (U2), t (U4, nanoseconds since scan start)."""
    rng = np.random.default_rng(0)
    xyz = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    ring = (np.arange(n) % 64).astype(np.uint16)
    t_ns = np.linspace(0, 99_999_999, n).astype(np.uint32)  # 0..0.1 s
    header = (
        "# .PCD v0.7\nVERSION 0.7\n"
        "FIELDS x y z ring t\n"
        "SIZE 4 4 4 2 4\n"
        "TYPE F F F U U\n"
        "COUNT 1 1 1 1 1\n"
        f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS {n}\n"
        "DATA binary\n"
    )
    rec = np.dtype([
        ("x", "<f4"), ("y", "<f4"), ("z", "<f4"), ("ring", "<u2"), ("t", "<u4"),
    ])
    arr = np.zeros(n, rec)
    arr["x"], arr["y"], arr["z"] = xyz.T
    arr["ring"] = ring
    arr["t"] = t_ns
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(arr.tobytes())
    return xyz, ring, t_ns


class TestOusterIngest:
    def test_t_field_nanoseconds_decoded(self, tmp_path):
        xyz, ring, t_ns = _write_ouster_pcd(str(tmp_path / "000001.pcd"))
        frames = list(ds.frames_from_dir(str(tmp_path)))
        assert len(frames) == 1
        f = frames[0]
        np.testing.assert_allclose(f.points, xyz, atol=1e-5)
        np.testing.assert_array_equal(f.ring, ring)
        # uint nanoseconds -> float seconds
        assert f.rel_time.dtype == np.float32
        np.testing.assert_allclose(f.rel_time, t_ns * 1e-9, atol=1e-6)
        assert f.rel_time.max() < 0.1 + 1e-6

    def test_float_time_field_passthrough(self, tmp_path):
        """Velodyne-style float32 `time` field must NOT be rescaled."""
        n = 16
        rng = np.random.default_rng(1)
        xyz = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
        tsec = np.linspace(0, 0.099, n).astype(np.float32)
        header = (
            "VERSION 0.7\nFIELDS x y z time\nSIZE 4 4 4 4\nTYPE F F F F\n"
            f"COUNT 1 1 1 1\nWIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n"
            f"POINTS {n}\nDATA binary\n"
        )
        data = np.column_stack([xyz, tsec]).astype(np.float32)
        with open(tmp_path / "000001.pcd", "wb") as f:
            f.write(header.encode("ascii"))
            f.write(data.tobytes())
        (frame,) = list(ds.frames_from_dir(str(tmp_path)))
        np.testing.assert_allclose(frame.rel_time, tsec, atol=1e-6)


class TestDirIngest:
    def test_kitti_bin_dir(self, tmp_path):
        rng = np.random.default_rng(0)
        for i in range(3):
            pts = rng.uniform(-20, 20, (100, 4)).astype(np.float32)
            pts.tofile(str(tmp_path / f"{i:06d}.bin"))
        frames = list(ds.frames_from_dir(str(tmp_path), rate_hz=10.0))
        assert len(frames) == 3
        # non-timestamp filenames -> synthesized stamps at rate_hz
        np.testing.assert_allclose([f.stamp for f in frames], [0.0, 0.1, 0.2])
        assert frames[0].points.shape == (100, 3)

    def test_timestamp_filenames(self, tmp_path):
        rio.write_pcd(str(tmp_path / "1234.5000.pcd"), np.zeros((4, 3), np.float32))
        (frame,) = list(ds.frames_from_dir(str(tmp_path)))
        assert frame.stamp == 1234.5

    def test_gt_from_tum(self, tmp_path):
        p = str(tmp_path / "gt.txt")
        rio.write_tum(p, [0.0, 0.1], np.array([[0, 0, 0], [1, 0, 0]], float),
                      np.tile([1.0, 0, 0, 0], (2, 1)))
        gt = ds.gt_from_tum(p)
        assert len(gt) == 2
        np.testing.assert_allclose(gt[1][1], [1, 0, 0])
