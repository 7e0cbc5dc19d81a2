"""TPU-backend oracle tests for every TPU-only numeric path.

Round 4 shipped the Pallas knn_moments kernel gated on
`jax.default_backend() == "tpu"` with zero coverage, and it carried two
precision bugs that cost 5x front-end translation accuracy (VERDICT r4
weak #1-3). This file pins each TPU-only path against an f64 / exact
oracle ON the TPU backend so that can't happen silently again:

  - ops/knn_moments.py  (compiled Mosaic kernel, not interpret mode)
  - voxel/knn.py        XLA moment selector (production default)
  - ops/linalg.py       adjugate inv3x3 / unrolled Cholesky solve_psd
  - voxel/voxelmap.py   full-capacity duplicate-slot fast path
  - ops/voxel_join.py   keyed matmul (Pallas) segment reduce
  - ops/eig3.py         closed-form symmetric 3x3 eigendecomposition
"""

import numpy as np
import jax
import jax.numpy as jnp

from rolo_tpu.ops import sym3
from rolo_tpu.ops.eig3 import eigh3
from rolo_tpu.ops.knn_moments import knn_moments
from rolo_tpu.ops.linalg import solve_psd
from rolo_tpu.ops.voxel_join import keyed_matmul, pack_uniform
from rolo_tpu.voxel.knn import estimate_cov6
from rolo_tpu.voxel.voxelmap import build_voxel_map, lookup


def _lidar_cloud(rng, n, spread=0.5, lo=20.0, hi=50.0):
    return (rng.normal(size=(n, 3)) * spread + rng.uniform(lo, hi, size=(n, 1))).astype(
        np.float32
    )


# ---------------------------------------------------------------- knn_moments


def _moment_table(xyz, mask):
    n = xyz.shape[0]
    xc = np.concatenate(
        [np.ones((n, 1), np.float32), xyz, xyz[:, :1] * xyz,
         xyz[:, 1:2] * xyz[:, 1:], xyz[:, 2:] * xyz[:, 2:]], axis=1
    ) * mask[:, None]
    return np.pad(xc.T, ((0, 6), (0, 0))).astype(np.float32)


def test_knn_moments_compiled_matches_f64_oracle(rng):
    n, k = 1024, 20
    xyz = _lidar_cloud(rng, n)
    mask = rng.random(n) < 0.9
    xyz_z = np.where(mask[:, None], xyz, 0.0).astype(np.float32)
    got = np.asarray(
        knn_moments(jnp.asarray(xyz_z), jnp.asarray(mask), jnp.asarray(xyz_z),
                    jnp.asarray(mask), jnp.asarray(_moment_table(xyz_z, mask)), k)
    )
    d2 = ((xyz_z[:, None, :].astype(np.float64) - xyz_z[None, :, :].astype(np.float64)) ** 2).sum(-1)
    d2[:, ~mask] = np.inf
    xc64 = _moment_table(xyz_z, mask).astype(np.float64)
    same = 0
    for i in np.where(mask)[0]:
        rk = np.sort(d2[i])[k - 1]
        w = d2[i] <= rk
        want_i = xc64[:, w].sum(axis=1)
        if got[0, i] == w.sum():
            same += 1
            np.testing.assert_allclose(got[:, i], want_i, rtol=1e-5, atol=1e-3)
    # the bisection slack admits an extra boundary tie on at most a few
    # queries; membership must be exactly the true k-NN set on >=95%
    assert same / mask.sum() > 0.95


def test_knn_moments_compiled_membership_radius_is_tight(rng):
    """The compiled kernel's count must be k (+ties), never inflated —
    the round-4 kernel passed this on counts but failed on membership;
    the mean check below catches member swaps."""
    n, k = 2048, 20
    xyz = _lidar_cloud(rng, n)
    mask = np.ones(n, bool)
    got = np.asarray(
        knn_moments(jnp.asarray(xyz), jnp.asarray(mask), jnp.asarray(xyz),
                    jnp.asarray(mask), jnp.asarray(_moment_table(xyz, mask)), k)
    )
    cnt = got[0]
    assert cnt.min() >= k and cnt.max() <= k + 2
    # exact 20-NN means via f64
    d2 = ((xyz[:, None, :].astype(np.float64) - xyz[None, :, :].astype(np.float64)) ** 2).sum(-1)
    idx = np.argsort(d2, axis=1)[:, :k]
    mu_ex = xyz[idx].mean(axis=1)
    mu_k = (got[1:4] / cnt).T
    err = np.linalg.norm(mu_k - mu_ex, axis=1)
    # medians must agree to ~numerics; a membership scramble (round 4:
    # median 3e-2) fails by 4 orders of magnitude
    assert np.median(err) < 1e-4


# ---------------------------------------------------- moment selector on TPU


def test_moment_selector_matches_exact_selector_on_tpu(rng):
    """The PRODUCTION covariance path (XLA moment selector) vs the exact
    top-k gather selector, both on TPU, pre-regularization."""
    n, k = 4096, 20
    xyz = _lidar_cloud(rng, n)
    mask = rng.random(n) < 0.85
    c_mom = np.asarray(estimate_cov6(jnp.asarray(xyz), jnp.asarray(mask), k=k,
                                     method="none", selector="moment"))
    c_ex = np.asarray(estimate_cov6(jnp.asarray(xyz), jnp.asarray(mask), k=k,
                                    method="none", selector="exact"))
    diff = np.abs(c_mom - c_ex).max(axis=0)[mask]
    scale = np.abs(c_ex).max(axis=0)[mask] + 1e-9
    rel = diff / scale
    # membership is near-exact, but the E[xx] - mu mu^T formula carries
    # an irreducible f32 cancellation at lidar coordinate scale (~6%
    # median; see voxel/knn.py docstring). Pin the measured bound so a
    # future regression (e.g. a precision downgrade) fails loudly;
    # registration-level impact is gated separately in bench.py.
    assert np.median(rel) < 0.10
    assert np.percentile(rel, 90) < 0.40


def test_moment_selector_post_plane_regularization(rng):
    """After PLANE regularization (the production method) the tail
    shrinks further: regularized planes depend only on the neighborhood
    orientation, not boundary-point churn."""
    n, k = 4096, 20
    xyz = _lidar_cloud(rng, n)
    mask = np.ones(n, bool)
    c_mom = np.asarray(estimate_cov6(jnp.asarray(xyz), jnp.asarray(mask), k=k,
                                     method="plane", selector="moment"))
    c_ex = np.asarray(estimate_cov6(jnp.asarray(xyz), jnp.asarray(mask), k=k,
                                    method="plane", selector="exact"))
    diff = np.abs(c_mom - c_ex).max(axis=0)
    # post-PLANE the entries are O(1) plane orientations; the moment
    # path's covariance noise perturbs orientations by ~0.07 median
    assert np.median(diff) < 0.15
    assert (diff > 0.8).mean() < 0.05


# ------------------------------------------------------------------ solve_psd


def test_solve_psd_3x3_adjugate_vs_f64(rng):
    b = 4096
    a = rng.normal(size=(b, 3, 3))
    h = (a @ a.transpose(0, 2, 1) + 1e-2 * np.eye(3)).astype(np.float32)
    rhs = rng.normal(size=(b, 3)).astype(np.float32)
    x = np.asarray(jax.jit(solve_psd)(jnp.asarray(h), jnp.asarray(rhs)))
    x64 = np.linalg.solve(h.astype(np.float64), rhs.astype(np.float64)[..., None])[..., 0]
    rel = np.linalg.norm(x - x64, axis=1) / (np.linalg.norm(x64, axis=1) + 1e-12)
    assert np.median(rel) < 1e-5
    assert rel.max() < 1e-2  # worst conditioned batch entries


def test_solve_psd_6x6_unrolled_cholesky_vs_f64(rng):
    b = 2048
    a = rng.normal(size=(b, 6, 6))
    h = (a @ a.transpose(0, 2, 1) + 1e-2 * np.eye(6)).astype(np.float32)
    rhs = rng.normal(size=(b, 6)).astype(np.float32)
    x = np.asarray(jax.jit(solve_psd)(jnp.asarray(h), jnp.asarray(rhs)))
    x64 = np.linalg.solve(h.astype(np.float64), rhs.astype(np.float64)[..., None])[..., 0]
    rel = np.linalg.norm(x - x64, axis=1) / (np.linalg.norm(x64, axis=1) + 1e-12)
    assert np.median(rel) < 1e-4
    assert rel.max() < 1e-2


# ------------------------------------------------------------- voxel map build


def test_voxelmap_fullcap_fast_path_vs_truncating_path(rng):
    """capacity >= N takes the duplicate-slot fast path
    (voxel/voxelmap.py:181-199); capacity < N takes the compacting path.
    Same input, the per-voxel stats seen through lookup() must agree."""
    n = 1024
    xyz = (rng.normal(size=(n, 3)) * 3.0).astype(np.float32)
    mask = rng.random(n) < 0.9
    cov6 = jnp.asarray(
        np.tile(np.array([1, 0, 0, 1, 0, 1], np.float32)[:, None], (1, n)))
    xj, mj = jnp.asarray(xyz), jnp.asarray(mask)

    vm_fast = build_voxel_map(xj, cov6, mj, capacity=2048, resolution=2.0)
    vm_slow = build_voxel_map(xj, cov6, mj, capacity=512, resolution=2.0)
    # unique voxels in play must fit the small table for comparability
    n_vox = int(np.asarray(vm_fast.valid).sum())
    assert n_vox < 512, "test scene too dense for the truncating table"

    from rolo_tpu.voxel.voxelmap import uniform_coord

    coord = uniform_coord(jnp.asarray(xyz[:256]), 2.0)
    hit_f, num_f, mean_f, cov_f = [np.asarray(v) for v in lookup(vm_fast, coord, polar=False)]
    hit_s, num_s, mean_s, cov_s = [np.asarray(v) for v in lookup(vm_slow, coord, polar=False)]
    np.testing.assert_array_equal(hit_f, hit_s)
    np.testing.assert_allclose(num_f, num_s, rtol=1e-6)
    np.testing.assert_allclose(mean_f, mean_s, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(cov_f, cov_s, rtol=1e-5, atol=1e-5)


def test_voxelmap_fullcap_stats_vs_numpy_oracle(rng):
    n = 768
    xyz = (rng.normal(size=(n, 3)) * 3.0).astype(np.float32)
    mask = rng.random(n) < 0.85
    cov6 = jnp.asarray(rng.normal(size=(6, n)).astype(np.float32))
    vm = build_voxel_map(jnp.asarray(xyz), cov6, jnp.asarray(mask),
                         capacity=1024, resolution=1.0)
    from rolo_tpu.voxel.voxelmap import uniform_coord

    pack_np = np.asarray(pack_uniform(uniform_coord(jnp.asarray(xyz), 1.0)))
    pack_np = np.where(mask, pack_np, np.iinfo(np.int32).max)
    table = np.asarray(vm.pack)
    valid = np.asarray(vm.valid)
    num = np.asarray(vm.num_points)
    mean = np.asarray(vm.mean)
    c6 = np.asarray(np.asarray(vm.cov6))
    for s in np.where(valid)[0]:
        members = pack_np == table[s]
        assert members.sum() == num[s]
        np.testing.assert_allclose(mean[:, s], xyz[members].mean(axis=0),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            c6[:, s], np.asarray(cov6)[:, members].mean(axis=1), rtol=1e-4, atol=1e-4)


# --------------------------------------------------------------- keyed matmul


def test_keyed_matmul_pallas_vs_f64(rng):
    s, n, v = 10, 4096, 512
    vals = (rng.normal(size=(s, n)) * 30.0).astype(np.float32)
    keys = rng.integers(0, 400, size=n).astype(np.int32)
    table = np.arange(v, dtype=np.int32)
    got = np.asarray(keyed_matmul(jnp.asarray(vals), jnp.asarray(keys), jnp.asarray(table)))
    want = np.zeros((s, v))
    for j in range(v):
        want[:, j] = vals[:, keys == table[j]].astype(np.float64).sum(axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)


# ----------------------------------------------------------------------- eig3


def test_eigh3_on_tpu_vs_numpy(rng):
    b = 4096
    a = rng.normal(size=(b, 3, 3))
    m = (a @ a.transpose(0, 2, 1)).astype(np.float32)
    w, vec = jax.jit(eigh3)(jnp.asarray(m))
    w, vec = np.asarray(w), np.asarray(vec)
    w64 = np.linalg.eigvalsh(m.astype(np.float64))
    np.testing.assert_allclose(w, w64, rtol=1e-3, atol=1e-3)
    # eigenvector property: M v = lambda v
    mv = np.einsum("bij,bjk->bik", m, vec)
    lv = w[:, None, :] * vec
    assert np.abs(mv - lv).max() < 5e-2
