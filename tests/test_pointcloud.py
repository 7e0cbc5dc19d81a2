"""Point-cloud pipeline tests against dense numpy oracles implementing the
reference semantics (imageProjection.cpp / featureExtraction.cpp)."""

import numpy as np
import jax
import jax.numpy as jnp

from rolo_tpu.pointcloud import (
    PaddedCloud,
    RawScan,
    project_scan,
    extract_features,
    voxel_downsample,
)
from rolo_tpu.pointcloud.features import calculate_smoothness, _sector_bounds

RNG = np.random.default_rng(42)

N_SCAN, HORIZON = 8, 256


def make_synthetic_scan(n_scan=N_SCAN, horizon=HORIZON, dropout=0.1):
    """Simulate a lidar scan of a cylindrical room with boxes."""
    rows, cols = np.meshgrid(np.arange(n_scan), np.arange(horizon), indexing="ij")
    az = (horizon / 2 - cols) / horizon * 2 * np.pi + np.pi / 2
    elev = (rows - n_scan / 2) * np.deg2rad(2.0)
    base_r = 20.0 + 5.0 * np.sin(3 * az) + RNG.normal(0, 0.01, az.shape)
    r = base_r / np.maximum(np.cos(elev), 0.2)
    x = r * np.cos(elev) * np.cos(az)
    y = r * np.cos(elev) * np.sin(az)
    z = r * np.sin(elev)
    keep = RNG.random(az.shape) > dropout
    pts = np.stack([x, y, z], -1)[keep].astype(np.float32)
    ring = rows[keep].astype(np.int32)
    t = (cols[keep] / horizon * 0.1).astype(np.float32)
    n = pts.shape[0]
    cap = n_scan * horizon
    scan = RawScan(
        xyz=jnp.asarray(np.pad(pts, ((0, cap - n), (0, 0)))),
        ring=jnp.asarray(np.pad(ring, (0, cap - n))),
        rel_time=jnp.asarray(np.pad(t, (0, cap - n))),
        mask=jnp.asarray(np.arange(cap) < n),
    )
    return scan, pts


class TestProjection:
    def test_projection_basic(self):
        scan, pts = make_synthetic_scan()
        ring = project_scan(scan, N_SCAN, HORIZON, 1.0, 100.0)
        count = np.asarray(ring.count)
        assert count.sum() > 0.8 * pts.shape[0]
        # ranges match |xyz| for valid entries
        mask = np.asarray(ring.mask)
        xyz = np.asarray(ring.xyz)
        rng = np.asarray(ring.rng)
        np.testing.assert_allclose(
            np.linalg.norm(xyz[mask], axis=1), rng[mask], rtol=1e-5
        )
        # column order within each ring is strictly increasing
        col = np.asarray(ring.col)
        for r in range(N_SCAN):
            c = col[r][mask[r]]
            assert np.all(np.diff(c) > 0)

    def test_first_return_wins(self):
        # two points in the same pixel: the first in the array order wins
        xyz = np.zeros((4, 3), np.float32)
        xyz[0] = [10.0, 0, 0]
        xyz[1] = [5.0, 0, 0]  # same pixel, later index -> dropped
        xyz[2] = [0, 10.0, 0]
        xyz[3] = [-10.0, 0, 0]
        scan = RawScan(
            xyz=jnp.asarray(xyz),
            ring=jnp.zeros(4, jnp.int32),
            rel_time=jnp.zeros(4, jnp.float32),
            mask=jnp.ones(4, bool),
        )
        ring = project_scan(scan, 1, 64, 1.0, 100.0)
        out = np.asarray(ring.xyz[0][np.asarray(ring.mask[0])])
        assert out.shape[0] == 3
        assert any(np.allclose(p, [10.0, 0, 0]) for p in out)
        assert not any(np.allclose(p, [5.0, 0, 0]) for p in out)

    def test_range_filter(self):
        scan, _ = make_synthetic_scan()
        ring = project_scan(scan, N_SCAN, HORIZON, 1.0, 15.0)
        rng = np.asarray(ring.rng)[np.asarray(ring.mask)]
        assert np.all(rng <= 15.0)


class TestSmoothness:
    def test_oracle(self):
        rng = RNG.uniform(5, 30, (2, 64)).astype(np.float32)
        count = np.array([64, 40], np.int32)
        ours = np.asarray(calculate_smoothness(jnp.asarray(rng), jnp.asarray(count)))
        for r in range(2):
            for i in range(5, count[r] - 5):
                # diffRange = sum of the 10 neighbors - 10 * range[i]
                d = rng[r, i - 5 : i + 6].sum() - 11 * rng[r, i]
                assert abs(ours[r, i] - d * d) < 1e-2 * max(1.0, d * d)

    def test_sector_bounds(self):
        count = jnp.asarray(np.array([100, 64], np.int32))
        sp, ep = _sector_bounds(count)
        sp, ep = np.asarray(sp), np.asarray(ep)
        # contiguous coverage, matching the reference integer arithmetic
        start, end = 4, 100 - 6
        for j in range(6):
            assert sp[0, j] == (start * (6 - j) + end * j) // 6
            assert ep[0, j] == (start * (5 - j) + end * (j + 1)) // 6 - 1


class TestFeatures:
    def test_extract_on_synthetic(self):
        scan, _ = make_synthetic_scan(dropout=0.0)
        ring = project_scan(scan, N_SCAN, HORIZON, 1.0, 100.0)
        feats = jax.jit(
            lambda r: extract_features(r, 0.8, 0.1, 0.4, 1024, 4096)
        )(ring)
        n_corners = int(np.asarray(feats.corners.mask).sum())
        n_surfs = int(np.asarray(feats.surfaces.mask).sum())
        assert n_corners > 0, "synthetic scene with box edges must yield corners"
        assert n_surfs > 100
        # per-ring caps: <= 20 corners/sector * 6 sectors * rings
        assert n_corners <= 20 * 6 * N_SCAN

    def test_corner_count_cap(self):
        # pathological scan: everything sharp -> cap at 20/sector
        scan, _ = make_synthetic_scan(dropout=0.0)
        ring = project_scan(scan, N_SCAN, HORIZON, 1.0, 100.0)
        feats = extract_features(ring, 1e-9, 0.1, 0.4, 8192, 4096)
        n_corners = int(np.asarray(feats.corners.mask).sum())
        assert n_corners <= 20 * 6 * N_SCAN


class TestVoxelDownsample:
    def test_centroids(self):
        pts = RNG.uniform(-5, 5, (500, 3)).astype(np.float32)
        cloud = PaddedCloud.from_points(pts, 512)
        out = voxel_downsample(cloud, 1.0, 512)
        got = out.to_numpy()
        # oracle
        cells = {}
        for p in pts:
            key = tuple(np.floor(p / 1.0).astype(int))
            cells.setdefault(key, []).append(p)
        want = np.array([np.mean(v, axis=0) for v in cells.values()])
        assert got.shape[0] == len(cells)
        got_sorted = got[np.lexsort(got.T)]
        want_sorted = want[np.lexsort(want.T)]
        np.testing.assert_allclose(got_sorted, want_sorted, atol=1e-5)

    def test_mask_respected(self):
        pts = RNG.uniform(-5, 5, (100, 3)).astype(np.float32)
        cloud = PaddedCloud.from_points(pts, 256)  # 156 padded slots at origin
        out = voxel_downsample(cloud, 1.0, 256)
        got = out.to_numpy()
        # padded zeros must not contribute a spurious voxel at the origin
        cells = set()
        for p in pts:
            cells.add(tuple(np.floor(p).astype(int)))
        assert got.shape[0] == len(cells)
