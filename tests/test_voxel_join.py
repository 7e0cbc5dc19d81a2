"""One-hot voxel join: pack exactness, join-vs-searchsorted parity, and
edge cases (out-of-range bins, empty tables, padding)."""

import jax.numpy as jnp
import numpy as np

from rolo_tpu.ops.voxel_join import (
    INVALID_PACK,
    pack_polar,
    pack_uniform,
    voxel_join,
)
from rolo_tpu.voxel.voxelmap import (
    build_voxel_map,
    lookup,
    lookup_join,
    polar_coord,
    uniform_coord,
)


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

    def test_uniform_pack_injective_and_signed(self):
        rng = np.random.default_rng(1)
        coords = rng.integers(-500, 500, (2000, 3)).astype(np.int32)
        packs = np.asarray(pack_uniform(jnp.asarray(coords)))
        assert len(np.unique(coords, axis=0)) == len(np.unique(packs))
        assert not np.any(packs == int(INVALID_PACK))

    def test_out_of_range_maps_invalid(self):
        bad = jnp.asarray([[200, 0, 0], [0, 70, 0], [0, 0, 1 << 20], [-1, 0, 0]], jnp.int32)
        assert bool(jnp.all(pack_polar(bad) == INVALID_PACK))
        badu = jnp.asarray([[600, 0, 0], [0, -600, 0]], jnp.int32)
        assert bool(jnp.all(pack_uniform(badu) == INVALID_PACK))


class TestJoin:
    def test_exact_select(self):
        table_pack = jnp.asarray([10, 20, 30, INVALID_PACK], jnp.int32)
        stats = jnp.asarray(
            [[1.0, 1, 1], [2, 4, 8], [3, 9, 27], [0, 0, 0]], jnp.float32
        )
        out = voxel_join(jnp.asarray([30, 10, 99], jnp.int32), table_pack, stats)
        np.testing.assert_allclose(np.asarray(out), [[3, 9, 27], [1, 1, 1], [0, 0, 0]])

    def test_matches_searchsorted_lookup_polar(self):
        rng = np.random.default_rng(2)
        pts = jnp.asarray(rng.uniform(-30, 30, (2048, 3)).astype(np.float32))
        mask = jnp.asarray(rng.random(2048) > 0.1)
        covs = jnp.broadcast_to(jnp.eye(3), (2048, 3, 3))
        pres = jnp.asarray([0.175, 0.175, 2.0])
        vm = build_voxel_map(pts, covs, mask, 4096, polar_res=pres)
        # query with a mix of self points and novel points
        q = jnp.concatenate([pts[:512], pts[:512] + 25.0])
        coord = polar_coord(q, pres)
        f1, n1, m1, c1 = lookup(vm, coord)
        f2, n2, m2, c2 = lookup_join(vm, coord, polar=True)
        np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
        np.testing.assert_allclose(np.asarray(n1), np.asarray(n2), atol=1e-5)
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-5)
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-5)

    def test_matches_searchsorted_lookup_uniform(self):
        rng = np.random.default_rng(3)
        pts = jnp.asarray(rng.uniform(-20, 20, (1024, 3)).astype(np.float32))
        mask = jnp.ones(1024, bool)
        covs = jnp.broadcast_to(jnp.eye(3), (1024, 3, 3))
        vm = build_voxel_map(pts, covs, mask, 2048, polar_res=None, resolution=1.0)
        coord = uniform_coord(pts, 1.0)
        f1, n1, _, _ = lookup(vm, coord)
        f2, n2, _, _ = lookup_join(vm, coord, polar=False)
        assert float(f2.mean()) == 1.0  # self-hit
        np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
        np.testing.assert_allclose(np.asarray(n1), np.asarray(n2), atol=1e-5)

    def test_empty_table(self):
        vmq = jnp.full((128,), INVALID_PACK, jnp.int32)
        stats = jnp.zeros((128, 8), jnp.float32)
        out = voxel_join(jnp.asarray([5, INVALID_PACK], jnp.int32), vmq, stats)
        np.testing.assert_allclose(np.asarray(out), 0.0)

    def test_nonaligned_query_count(self):
        """Query counts that are not multiples of the kernel block."""
        table_pack = jnp.arange(128, dtype=jnp.int32)
        stats = jnp.arange(128, dtype=jnp.float32)[:, None] * jnp.ones((1, 8))
        q = jnp.asarray([3, 7, 127], jnp.int32)
        out = voxel_join(q, table_pack, stats.astype(jnp.float32))
        np.testing.assert_allclose(np.asarray(out[:, 0]), [3, 7, 127])
