"""CPU (interpret-mode) parity tests for the Pallas knn_moments kernel.

The kernel is TPU-only in production (opt-in via ROLO_KNN_KERNEL=1, see
voxel/knn.py), but its bisection/penalty/in-kernel-split logic must be
exercised by CPU CI too: round 4 shipped it unverified and it carried two
precision bugs (see ops/knn_moments.py module docstring). Interpret mode
runs the exact kernel program on CPU. The TPU-backend runs of the same
oracles live in tests_tpu/.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rolo_tpu.ops.knn_moments import knn_moments


def _moment_table(xyz, mask):
    """[16, N] SoA moment planes (1, x, y, z, xx, xy, xz, yy, yz, zz)."""
    n = xyz.shape[0]
    xc = np.concatenate(
        [
            np.ones((n, 1), np.float32),
            xyz,
            xyz[:, :1] * xyz,
            xyz[:, 1:2] * xyz[:, 1:],
            xyz[:, 2:] * xyz[:, 2:],
        ],
        axis=1,
    ) * mask[:, None]
    return np.pad(xc.T, ((0, 6), (0, 0))).astype(np.float32)


def _oracle(xyz, mask, cand, cand_mask, k):
    """f64 membership-sum oracle with the kernel's d2 <= r_k semantics
    (all ties at the k-th radius included)."""
    q = xyz.astype(np.float64)
    c = cand.astype(np.float64)
    d2 = ((q[:, None, :] - c[None, :, :]) ** 2).sum(-1)
    d2[:, ~cand_mask] = np.inf
    xc = _moment_table(cand, cand_mask).astype(np.float64)
    out = np.zeros((16, len(q)))
    for i in range(len(q)):
        valid = np.isfinite(d2[i])
        kk = min(k, valid.sum())
        if kk == 0:
            continue
        rk = np.sort(d2[i][valid])[kk - 1]
        w = (d2[i] <= rk) & valid
        out[:, i] = xc[:, w].sum(axis=1)
    out[:, ~mask] = 0.0
    return out


def _run(xyz, mask, cand, cand_mask, k):
    # the documented contract (see knn_moments docstring): the caller
    # zeroes masked coordinates BEFORE building the moment table, exactly
    # as estimate_cov6 does
    cand_z = np.where(cand_mask[:, None], cand, 0.0).astype(np.float32)
    return np.asarray(
        knn_moments(
            jnp.asarray(np.where(mask[:, None], xyz, 0.0).astype(np.float32)),
            jnp.asarray(mask),
            jnp.asarray(cand_z),
            jnp.asarray(cand_mask),
            jnp.asarray(_moment_table(cand_z, cand_mask)),
            k,
            interpret=True,
        )
    )


def _lidar_cloud(rng, n, spread=0.5, lo=20.0, hi=50.0):
    return (rng.normal(size=(n, 3)) * spread + rng.uniform(lo, hi, size=(n, 1))).astype(
        np.float32
    )


def test_matches_oracle_lidar_scale():
    """At lidar ranges (the cancellation regime that broke round 4)."""
    rng = np.random.default_rng(0)
    n, k = 512, 8
    xyz = _lidar_cloud(rng, n)
    mask = np.ones(n, bool)
    got = _run(xyz, mask, xyz, mask, k)
    want = _oracle(xyz, mask, xyz, mask, k)
    cnt = got[0]
    assert cnt.min() >= k and cnt.max() <= k + 2  # ties only
    same = got[0] == want[0]
    assert same.mean() > 0.95
    mu_got = (got[1:4] / np.maximum(cnt, 1))[:, same]
    mu_want = (want[1:4] / np.maximum(want[0], 1))[:, same]
    assert np.abs(mu_got - mu_want).max() < 2e-3


def test_nan_padding_and_masked_candidates():
    """NaN-padded masked slots must not poison any query's membership."""
    rng = np.random.default_rng(1)
    n, k = 384, 6
    xyz = _lidar_cloud(rng, n)
    mask = np.ones(n, bool)
    mask[300:] = False
    xyz_dirty = xyz.copy()
    xyz_dirty[~mask] = np.nan  # caller zeroes these; simulate that contract
    got = _run(xyz_dirty, mask, xyz_dirty, mask, k)
    want = _oracle(xyz, mask, xyz, mask, k)
    assert np.isfinite(got).all()
    valid = mask
    cnt = got[0][valid]
    assert cnt.min() >= k
    # membership is a radius superset of the true k-NN: where counts
    # agree the sets are identical; boundary ties/slack may add a point
    # on a few queries (compared by count below)
    same = valid & (got[0] == want[0])
    assert same[valid].mean() > 0.95
    mu_got = (got[1:4] / np.maximum(got[0], 1))[:, same]
    mu_want = (want[1:4] / np.maximum(want[0], 1))[:, same]
    assert np.abs(mu_got - mu_want).max() < 2e-3
    # masked query columns are zeroed
    assert np.abs(got[:, ~mask]).max() == 0.0


def test_fewer_than_k_valid_candidates():
    """Starved queries: fewer valid candidates than k. The penalty row
    must keep invalid candidates out of membership."""
    rng = np.random.default_rng(2)
    n, k = 256, 20
    xyz = _lidar_cloud(rng, n)
    mask = np.zeros(n, bool)
    mask[:8] = True  # only 8 valid, k=20
    got = _run(xyz, mask, xyz, mask, k)
    cnt = got[0][mask]
    assert (cnt == 8).all()  # exactly the valid set, never the penalty rows
    want = _oracle(xyz, mask, xyz, mask, k)
    assert np.allclose(got[:, mask], want[:, mask], rtol=1e-5, atol=1e-3)


def test_split3_not_elided_moments_are_f32_accurate():
    """Second moments at coordinate scale ~50 m need better-than-bf16
    mantissas; if the in-kernel 3-way split regressed to one bf16 pass
    (the round-4 failure mode), errors jump ~3 orders of magnitude."""
    rng = np.random.default_rng(3)
    n, k = 256, 8
    xyz = _lidar_cloud(rng, n)
    mask = np.ones(n, bool)
    got = _run(xyz, mask, xyz, mask, k)
    want = _oracle(xyz, mask, xyz, mask, k)
    same = got[0] == want[0]  # compare where membership agrees exactly
    assert same.mean() > 0.95
    second = np.abs(got[4:10][:, same] - want[4:10][:, same])
    scale = np.abs(want[4:10][:, same]) + 1.0
    assert (second / scale).max() < 1e-5  # bf16 single-pass would be ~4e-3


def test_query_set_differs_from_candidate_set():
    """SPMD shape: local queries against an all-gathered candidate set."""
    rng = np.random.default_rng(4)
    nq, nc, k = 128, 640, 10
    cand = _lidar_cloud(rng, nc)
    cand_mask = rng.random(nc) < 0.9
    xyz = cand[:nq]  # queries are a subset of candidates
    mask = cand_mask[:nq].copy()
    got = _run(xyz, mask, cand, cand_mask, k)
    want = _oracle(xyz, mask, cand, cand_mask, k)
    same = mask & (got[0] == want[0])
    assert same[mask].mean() > 0.95
    mu_got = (got[1:4] / np.maximum(got[0], 1))[:, same]
    mu_want = (want[1:4] / np.maximum(want[0], 1))[:, same]
    assert np.abs(mu_got - mu_want).max() < 2e-3
