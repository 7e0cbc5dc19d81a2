"""SoA symmetric-3x3 toolkit vs dense numpy oracles."""

import numpy as np
import jax.numpy as jnp

from rolo_tpu.ops import sym3

RNG = np.random.default_rng(11)


def random_sym(n):
    a = RNG.normal(size=(n, 3, 3)).astype(np.float32)
    return (a @ a.transpose(0, 2, 1) + 0.1 * np.eye(3, dtype=np.float32)).astype(np.float32)


def test_roundtrip():
    m = random_sym(64)
    s = sym3.from_mat(jnp.asarray(m))
    assert s.shape == (6, 64)
    np.testing.assert_allclose(np.asarray(sym3.to_mat(s)), m, rtol=1e-6)


def test_matvec_quad():
    m = random_sym(33)
    v = RNG.normal(size=(33, 3)).astype(np.float32)
    s = sym3.from_mat(jnp.asarray(m))
    vt = jnp.asarray(v.T)
    got = np.asarray(sym3.matvec(s, vt)).T
    np.testing.assert_allclose(got, np.einsum("nij,nj->ni", m, v), rtol=1e-5, atol=1e-5)
    got_q = np.asarray(sym3.quad(s, vt))
    np.testing.assert_allclose(got_q, np.einsum("ni,nij,nj->n", v, m, v), rtol=1e-4, atol=1e-4)


def test_congruence():
    m = random_sym(17)
    w = RNG.normal(size=3).astype(np.float32)
    from rolo_tpu.geometry import so3

    r = np.asarray(so3.exp(jnp.asarray(w)))
    s = sym3.from_mat(jnp.asarray(m))
    got = np.asarray(sym3.to_mat(sym3.congruence(jnp.asarray(r), s)))
    want = np.einsum("ij,njk,lk->nil", r, m, r)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_inv():
    m = random_sym(29)
    s = sym3.from_mat(jnp.asarray(m))
    got = np.asarray(sym3.to_mat(sym3.inv(s)))
    np.testing.assert_allclose(got, np.linalg.inv(m), rtol=2e-3, atol=2e-3)


def test_eigvals():
    m = random_sym(41)
    s = sym3.from_mat(jnp.asarray(m))
    lo, mid, hi = (np.asarray(x) for x in sym3.eigvals(s))
    want = np.linalg.eigvalsh(m)
    np.testing.assert_allclose(lo, want[:, 0], rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(mid, want[:, 1], rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(hi, want[:, 2], rtol=1e-3, atol=1e-3)


def test_smallest_eigvec():
    m = random_sym(23)
    s = sym3.from_mat(jnp.asarray(m))
    v = np.asarray(sym3.smallest_eigvec(s)).T  # [N, 3]
    w, q = np.linalg.eigh(m)
    want = q[:, :, 0]
    dots = np.abs(np.sum(v * want, axis=1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-3)


def test_plane_regularize_matches_spectral():
    m = random_sym(19)
    s = sym3.from_mat(jnp.asarray(m))
    got = np.asarray(sym3.to_mat(sym3.plane_regularize(s)))
    w, q = np.linalg.eigh(m)
    vals = np.array([1e-3, 1.0, 1.0], np.float32)
    want = np.einsum("nij,j,nkj->nik", q, vals, q)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_plane_regularize_isotropic_fallback():
    m = np.broadcast_to(np.eye(3, dtype=np.float32) * 2.0, (5, 3, 3)).copy()
    s = sym3.from_mat(jnp.asarray(m))
    got = np.asarray(sym3.to_mat(sym3.plane_regularize(s)))
    # any unit q0 is valid; result must be symmetric PSD with eigs (1e-3,1,1)
    w = np.linalg.eigvalsh(got)
    np.testing.assert_allclose(w[:, 0], 1e-3, atol=1e-4)
    np.testing.assert_allclose(w[:, 1:], 1.0, atol=1e-4)
