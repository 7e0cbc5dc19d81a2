"""Keyed matmul (one-hot join / segment reduce): pack exactness,
join-vs-binary-search parity, and edge cases (out-of-range bins, empty
tables, padding)."""

import jax.numpy as jnp
import numpy as np

from rolo_tpu.ops.voxel_join import (
    INVALID_PACK,
    keyed_matmul,
    pack_polar,
    pack_uniform,
    unpack_polar,
    unpack_uniform,
)
from rolo_tpu.ops import sym3
from rolo_tpu.voxel.voxelmap import (
    build_voxel_map,
    lookup,
    lookup_join,
    polar_coord,
    uniform_coord,
)


def eye6(n):
    return jnp.broadcast_to(jnp.asarray([1.0, 0, 0, 1.0, 0, 1.0])[:, None], (6, n))


class TestPacking:
    def test_polar_pack_injective(self):
        rng = np.random.default_rng(0)
        coords = np.stack(
            [rng.integers(0, 40, 2000), rng.integers(0, 20, 2000), rng.integers(0, 600, 2000)],
            axis=-1,
        ).astype(np.int32)
        packs = np.asarray(pack_polar(jnp.asarray(coords)))
        uniq_c = len(np.unique(coords, axis=0))
        uniq_p = len(np.unique(packs))
        assert uniq_c == uniq_p  # no collisions for in-range bins
        # exact inverse
        np.testing.assert_array_equal(np.asarray(unpack_polar(jnp.asarray(packs))), coords)

    def test_uniform_pack_injective_and_signed(self):
        rng = np.random.default_rng(1)
        coords = rng.integers(-500, 500, (2000, 3)).astype(np.int32)
        packs = np.asarray(pack_uniform(jnp.asarray(coords)))
        assert len(np.unique(coords, axis=0)) == len(np.unique(packs))
        assert not np.any(packs == int(INVALID_PACK))
        np.testing.assert_array_equal(np.asarray(unpack_uniform(jnp.asarray(packs))), coords)

    def test_out_of_range_maps_invalid(self):
        bad = jnp.asarray([[200, 0, 0], [0, 70, 0], [0, 0, 1 << 20], [-1, 0, 0]], jnp.int32)
        assert bool(jnp.all(pack_polar(bad) == INVALID_PACK))
        badu = jnp.asarray([[600, 0, 0], [0, -600, 0]], jnp.int32)
        assert bool(jnp.all(pack_uniform(badu) == INVALID_PACK))


class TestKeyedMatmul:
    def test_exact_select(self):
        # join direction: values [S, K] over table keys, query keys_m
        table_pack = jnp.asarray([10, 20, 30, INVALID_PACK], jnp.int32)
        stats = jnp.asarray(
            [[1.0, 2, 3, 0], [1, 4, 9, 0], [1, 8, 27, 0]], jnp.float32
        )  # [3, 4]
        out = keyed_matmul(stats, table_pack, jnp.asarray([30, 10, 99], jnp.int32))
        np.testing.assert_allclose(np.asarray(out), [[3, 1, 0], [9, 1, 0], [27, 1, 0]])

    def test_segment_reduce(self):
        # build direction: many k-rows share a key
        keys_k = jnp.asarray([5, 7, 5, 7, 5, 9], jnp.int32)
        vals = jnp.asarray([[1.0, 10, 2, 20, 4, 100]], jnp.float32)
        out = keyed_matmul(vals, keys_k, jnp.asarray([5, 7, 9, 11], jnp.int32))
        np.testing.assert_allclose(np.asarray(out), [[7, 30, 100, 0]])

    def test_random_vs_numpy(self):
        rng = np.random.default_rng(5)
        k, m, s = 700, 333, 9
        keys_k = rng.integers(0, 200, k).astype(np.int32)
        keys_m = rng.integers(0, 200, m).astype(np.int32)
        vals = rng.normal(size=(s, k)).astype(np.float32)
        got = np.asarray(keyed_matmul(jnp.asarray(vals), jnp.asarray(keys_k), jnp.asarray(keys_m)))
        eq = (keys_k[:, None] == keys_m[None, :]).astype(np.float32)
        want = vals @ eq
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_empty_table(self):
        keys = jnp.full((128,), INVALID_PACK, jnp.int32)
        stats = jnp.zeros((8, 128), jnp.float32)
        out = keyed_matmul(stats, keys, jnp.asarray([5, INVALID_PACK], jnp.int32))
        np.testing.assert_allclose(np.asarray(out), 0.0)


class TestVoxelMap:
    def test_join_matches_binary_search_polar(self):
        rng = np.random.default_rng(2)
        pts = jnp.asarray(rng.uniform(-30, 30, (2048, 3)).astype(np.float32))
        mask = jnp.asarray(rng.random(2048) > 0.1)
        pres = jnp.asarray([0.175, 0.175, 2.0])
        vm = build_voxel_map(pts, eye6(2048), mask, 4096, polar_res=pres)
        # query with a mix of self points and novel points
        q = jnp.concatenate([pts[:512], pts[:512] + 25.0])
        coord = polar_coord(q, pres)
        f1, n1, m1, c1 = lookup(vm, coord, polar=True)
        f2, n2, m2, c2 = lookup_join(vm, pack_polar(coord))
        np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
        np.testing.assert_allclose(np.asarray(n1), np.asarray(n2), atol=1e-5)
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m2).T, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(c1), np.asarray(sym3.to_mat(c2)), atol=1e-5
        )

    def test_join_matches_binary_search_uniform(self):
        rng = np.random.default_rng(3)
        pts = jnp.asarray(rng.uniform(-20, 20, (1024, 3)).astype(np.float32))
        mask = jnp.ones(1024, bool)
        vm = build_voxel_map(pts, eye6(1024), mask, 2048, polar_res=None, resolution=1.0)
        coord = uniform_coord(pts, 1.0)
        f1, n1, _, _ = lookup(vm, coord, polar=False)
        f2, n2, _, _ = lookup_join(vm, pack_uniform(coord))
        assert float(f2.mean()) == 1.0  # self-hit
        np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
        np.testing.assert_allclose(np.asarray(n1), np.asarray(n2), atol=1e-5)

    def test_build_matches_numpy_oracle(self):
        """Voxel means/counts against a dict-based numpy reference."""
        rng = np.random.default_rng(4)
        pts = rng.uniform(-8, 8, (512, 3)).astype(np.float32)
        mask = rng.random(512) > 0.2
        vm = build_voxel_map(
            jnp.asarray(pts), eye6(512), jnp.asarray(mask), 1024,
            polar_res=None, resolution=1.0,
        )
        cells = {}
        for p, m in zip(pts, mask):
            if not m:
                continue
            c = tuple(np.floor(p / 1.0 - 0.5).astype(int))
            cells.setdefault(c, []).append(p)
        got_n = int(jnp.sum(vm.valid))
        assert got_n == len(cells)
        coords = np.asarray(vm.coord(polar=False))
        # valid slots are run starts of the sorted pack array, not
        # necessarily compacted to the front (build_voxel_map fast path)
        for v in np.flatnonzero(np.asarray(vm.valid)):
            c = tuple(coords[v])
            assert c in cells
            np.testing.assert_allclose(
                np.asarray(vm.mean[:, v]), np.mean(cells[c], axis=0), atol=1e-4
            )
            assert float(vm.num_points[v]) == len(cells[c])

    def test_negative_coordinate_bins(self):
        """Regression: negative uniform bins must round-trip the build."""
        pts = jnp.asarray([[-5.2, -3.1, -0.4], [-5.3, -3.2, -0.5], [4.0, 2.0, 1.0]], jnp.float32)
        mask = jnp.ones(3, bool)
        vm = build_voxel_map(pts, eye6(3), mask, 128, polar_res=None, resolution=1.0)
        coord = uniform_coord(pts, 1.0)
        f, n, _, _ = lookup_join(vm, pack_uniform(coord))
        assert bool(jnp.all(f))

    def test_capacity_overflow_drops_extra_voxels(self):
        rng = np.random.default_rng(6)
        pts = jnp.asarray(rng.uniform(-50, 50, (256, 3)).astype(np.float32))
        mask = jnp.ones(256, bool)
        vm = build_voxel_map(pts, eye6(256), mask, 16, polar_res=None, resolution=1.0)
        assert int(jnp.sum(vm.valid)) <= 16
        # all kept slots are self-consistent
        f, n, _, _ = lookup_join(vm, vm.pack[:16])
        assert bool(jnp.all(f[np.asarray(vm.valid[:16])]))
