"""Closed-form 3x3 symmetric eigendecomposition vs the numpy oracle."""

import jax.numpy as jnp
import numpy as np

from rolo_tpu.ops.eig3 import eigh3, eigvalsh3, spectral_rebuild


def _random_sym(n, seed, scale=1.0):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(n, 3, 3)).astype(np.float32) * scale
    return (a + a.transpose(0, 2, 1)) / 2


class TestEig3:
    def test_eigenvalues_match_numpy(self):
        a = _random_sym(500, 0)
        lam = np.asarray(eigvalsh3(jnp.asarray(a)))
        ref = np.linalg.eigvalsh(a)
        np.testing.assert_allclose(lam, ref, atol=2e-5)

    def test_eigenvectors_diagonalize(self):
        a = _random_sym(500, 1)
        lam, q = eigh3(jnp.asarray(a))
        lam, q = np.asarray(lam), np.asarray(q)
        # A q_k = lam_k q_k
        for k in range(3):
            av = np.einsum("nij,nj->ni", a, q[:, :, k])
            lv = lam[:, k, None] * q[:, :, k]
            np.testing.assert_allclose(av, lv, atol=5e-4)

    def test_orthonormal(self):
        a = _random_sym(300, 2)
        _, q = eigh3(jnp.asarray(a))
        q = np.asarray(q)
        qtq = np.einsum("nij,nik->njk", q, q)
        np.testing.assert_allclose(qtq, np.broadcast_to(np.eye(3), qtq.shape), atol=1e-4)

    def test_psd_covariances(self):
        """PSD rank-deficient inputs (planar neighborhoods) — the actual
        workload of covariance regularization."""
        rng = np.random.default_rng(3)
        pts = rng.normal(size=(200, 20, 3)).astype(np.float32)
        pts[..., 2] *= 1e-3  # nearly planar
        centered = pts - pts.mean(axis=1, keepdims=True)
        cov = np.einsum("nki,nkj->nij", centered, centered) / 20
        lam, q = eigh3(jnp.asarray(cov))
        lam = np.asarray(lam)
        ref = np.linalg.eigvalsh(cov)
        np.testing.assert_allclose(lam, ref, atol=1e-5)
        # reconstruction
        rec = np.einsum("nij,nj,nkj->nik", np.asarray(q), lam, np.asarray(q))
        np.testing.assert_allclose(rec, cov, atol=1e-4)

    def test_isotropic_matrix(self):
        a = jnp.broadcast_to(2.5 * jnp.eye(3), (4, 3, 3))
        lam, q = eigh3(a)
        np.testing.assert_allclose(np.asarray(lam), 2.5, atol=1e-6)
        qtq = np.einsum("nij,nik->njk", np.asarray(q), np.asarray(q))
        np.testing.assert_allclose(qtq, np.broadcast_to(np.eye(3), qtq.shape), atol=1e-5)

    def test_degenerate_pair(self):
        """Two equal eigenvalues: vectors must still be orthonormal and
        diagonalize A."""
        d = np.diag([1.0, 1.0, 5.0]).astype(np.float32)
        rng = np.random.default_rng(4)
        qs, _ = np.linalg.qr(rng.normal(size=(50, 3, 3)))
        a = np.einsum("nij,jk,nlk->nil", qs, d, qs).astype(np.float32)
        lam, q = eigh3(jnp.asarray(a))
        # f32 trig-method precision for a degenerate pair is ~1e-3
        np.testing.assert_allclose(np.sort(np.asarray(lam)), np.broadcast_to(np.array([1, 1, 5.0]), (50, 3)), atol=2e-3)
        rec = np.einsum("nij,nj,nkj->nik", np.asarray(q), np.asarray(lam), np.asarray(q))
        np.testing.assert_allclose(rec, a, atol=2e-3)

    def test_spectral_rebuild_plane(self):
        a = _random_sym(100, 5)
        a = np.einsum("nij,nkj->nik", a, a)  # PSD
        out = spectral_rebuild(
            jnp.asarray(a), lambda lam: jnp.broadcast_to(jnp.asarray([1e-3, 1.0, 1.0]), lam.shape)
        )
        lam = np.linalg.eigvalsh(np.asarray(out))
        np.testing.assert_allclose(lam[:, 0], 1e-3, atol=1e-4)
        np.testing.assert_allclose(lam[:, 1:], 1.0, atol=1e-3)

    def test_large_scale_values(self):
        a = _random_sym(100, 6, scale=1e4)
        lam = np.asarray(eigvalsh3(jnp.asarray(a)))
        ref = np.linalg.eigvalsh(a)
        np.testing.assert_allclose(lam, ref, rtol=1e-4, atol=1e-1)
