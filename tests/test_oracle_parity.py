"""Cross-validation of the production rot-GICP math against the f64 numpy
oracle transcribed from the reference C++ (tests/oracle_rotgicp.py).

These tests share inputs between the SoA/keyed-matmul production path and
the dict/loop oracle, so any silent behavioral divergence in covariance
estimation, voxel binning, correspondence binding, Mahalanobis precompute,
or the three linearizations shows up as a numeric mismatch (VERDICT r1
missing item 4 / next-round item 6)."""

import jax.numpy as jnp
import numpy as np
import pytest

import oracle_rotgicp as oracle
from rolo_tpu.config import RegistrationConfig
from rolo_tpu.registration import gicp, lm
from rolo_tpu.registration.rotgicp import register_scan_pair
from rolo_tpu.voxel.knn import estimate_cov6
from rolo_tpu.voxel.voxelmap import build_voxel_map

POLAR = np.array([0.175, 0.175, 2.0], np.float32)
K = 10


def _cloud(n=384, seed=0):
    """Structured scene: three walls + ground at LiDAR-ish ranges."""
    rng = np.random.default_rng(seed)
    pts = []
    for normal, d in [((1, 0, 0), 9.0), ((0, 1, 0), 11.0), ((0.5, -0.8, 0), 10.0), ((0, 0, 1), -1.5)]:
        m = n // 4
        nv = np.asarray(normal, np.float64)
        nv = nv / np.linalg.norm(nv)
        ref = np.array([0, 0, 1.0]) if abs(nv[2]) < 0.9 else np.array([1.0, 0, 0])
        t1 = np.cross(nv, ref)
        t1 /= np.linalg.norm(t1)
        t2 = np.cross(nv, t1)
        u = rng.uniform(-4, 4, (m, 2))
        pts.append(d * nv + u[:, :1] * t1 + u[:, 1:] * t2)
    pts = np.concatenate(pts)[:n]
    pts += rng.normal(0, 0.01, pts.shape)
    return pts.astype(np.float32)


def _sym6_to_mats(c6):
    """[6, N] sym3 planes (xx, xy, xz, yy, yz, zz) -> [N, 3, 3] f64."""
    c6 = np.asarray(c6, np.float64)
    n = c6.shape[1]
    out = np.zeros((n, 3, 3))
    idx = ((0, 1, 2), (1, 3, 4), (2, 4, 5))
    for i in range(3):
        for j in range(3):
            out[:, i, j] = c6[idx[i][j]]
    return out


def _rotz(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)


@pytest.fixture(scope="module")
def problem():
    """Shared registration problem: target = R_true @ source (sensor-frame
    rotation like consecutive scans), plus our covariances both as device
    arrays and as f64 matrices for the oracle."""
    src = _cloud(seed=0)
    r_true = _rotz(0.04)
    tgt = (src @ r_true.T).astype(np.float32)
    mask = np.ones(len(src), bool)

    src_cov6 = estimate_cov6(jnp.asarray(src), jnp.asarray(mask), k=K, selector="exact")
    tgt_cov6 = estimate_cov6(jnp.asarray(tgt), jnp.asarray(mask), k=K, selector="exact")

    vmap = build_voxel_map(
        jnp.asarray(tgt), tgt_cov6, jnp.asarray(mask), 4096, polar_res=jnp.asarray(POLAR)
    )
    ctx = gicp.make_context(
        jnp.asarray(src), jnp.asarray(mask), src_cov6, vmap,
        polar_res=jnp.asarray(POLAR), neighbor_search="direct1",
    )

    src_covs_np = _sym6_to_mats(src_cov6)
    tgt_covs_np = _sym6_to_mats(tgt_cov6)
    voxels = oracle.build_voxel_map(tgt, tgt_covs_np, polar_res=POLAR.astype(np.float64))
    return dict(src=src, tgt=tgt, mask=mask, r_true=r_true, ctx=ctx,
                voxels=voxels, src_covs_np=src_covs_np)


class TestCovarianceParity:
    def test_plane_covariances_match(self):
        pts = _cloud(n=192, seed=3)
        mask = np.ones(len(pts), bool)
        ours6 = estimate_cov6(jnp.asarray(pts), jnp.asarray(mask), k=K, selector="exact")
        ours = _sym6_to_mats(ours6)
        ref = oracle.plane_covariances(pts, k=K)
        np.testing.assert_allclose(ours, ref, atol=2e-3)


class TestLinearizationParity:
    def _states(self, problem):
        dtype = np.float32
        return [
            (np.eye(3, dtype=dtype), np.zeros(3, dtype)),
            (_rotz(0.025), np.array([0.05, -0.03, 0.01], dtype)),
        ]

    def test_so3_linearize(self, problem):
        for rot, trans in self._states(problem):
            corr = gicp.update_correspondences(problem["ctx"], jnp.asarray(rot), jnp.asarray(trans))
            err, h, b = gicp.so3_linearize(problem["ctx"], corr, jnp.asarray(rot), jnp.asarray(trans))
            ref_corrs = oracle.update_correspondences(
                problem["voxels"], problem["src"], problem["src_covs_np"], rot, trans,
                "direct1", POLAR.astype(np.float64),
            )
            # same correspondence multiset
            assert int(jnp.sum(corr.weight > 0)) == len(ref_corrs)
            err_o, h_o, b_o = oracle.so3_linearize(ref_corrs, problem["src"], rot, trans)
            scale_h = np.abs(h_o).max()
            scale_b = max(np.abs(b_o).max(), 1e-3)
            np.testing.assert_allclose(float(err), err_o, rtol=5e-4)
            np.testing.assert_allclose(np.asarray(h), h_o, atol=2e-3 * scale_h)
            np.testing.assert_allclose(np.asarray(b), b_o, atol=3e-3 * scale_b)

    def test_se3_linearize(self, problem):
        for rot, trans in self._states(problem):
            corr = gicp.update_correspondences(problem["ctx"], jnp.asarray(rot), jnp.asarray(trans))
            err, h, b = gicp.se3_linearize(problem["ctx"], corr, jnp.asarray(rot), jnp.asarray(trans))
            ref_corrs = oracle.update_correspondences(
                problem["voxels"], problem["src"], problem["src_covs_np"], rot, trans,
                "direct1", POLAR.astype(np.float64),
            )
            err_o, h_o, b_o = oracle.linearize_se3(ref_corrs, problem["src"], rot, trans)
            scale_h = np.abs(h_o).max()
            scale_b = max(np.abs(b_o).max(), 1e-3)
            np.testing.assert_allclose(float(err), err_o, rtol=5e-4)
            np.testing.assert_allclose(np.asarray(h), h_o, atol=2e-3 * scale_h)
            np.testing.assert_allclose(np.asarray(b), b_o, atol=3e-3 * scale_b)

    def test_ct_point_term(self, problem):
        """ct_lambda = 0 reduces t3_linearize to the pure point term, where
        production and reference Jacobians agree exactly."""
        rot = np.eye(3, dtype=np.float32)
        trans = np.zeros(3, np.float32)
        t = np.array([0.03, -0.02, 0.01], np.float32)
        corr = gicp.update_correspondences(problem["ctx"], jnp.asarray(rot), jnp.asarray(trans))
        err, h, b = gicp.ct_linearize(
            problem["ctx"], corr, jnp.asarray(t), jnp.zeros(3), jnp.zeros(3),
            jnp.asarray(0.1), jnp.asarray(0.1), 0.0,
        )
        ref_corrs = oracle.update_correspondences(
            problem["voxels"], problem["src"], problem["src_covs_np"], rot, trans,
            "direct1", POLAR.astype(np.float64),
        )
        err_o, h_o, b_o = oracle.t3_linearize(
            ref_corrs, problem["src"], t, np.zeros(3), np.zeros(3), 0.1, 0.1, 0.0
        )
        scale_h = np.abs(h_o).max()
        np.testing.assert_allclose(float(err), err_o, rtol=5e-4)
        np.testing.assert_allclose(np.asarray(h), h_o, atol=2e-3 * scale_h)
        np.testing.assert_allclose(np.asarray(b), b_o, atol=3e-3 * max(np.abs(b_o).max(), 1e-3))


class TestSolverParity:
    def test_rotation_solve_matches_oracle(self, problem):
        """End-to-end SO(3) LM: production f32 vs oracle f64 recover the
        same rotation (both should land on ~R_true^T ... the registration
        maps source -> target)."""
        res = lm.lm_register_rotation(
            problem["ctx"], jnp.eye(3), jnp.zeros(3),
            max_outer=64, max_inner=10, rot_eps=2e-3, trans_eps=5e-4,
            init_lambda_factor=1e-9,
        )
        rot_oracle = oracle.rot_lm_solve(
            problem["voxels"], problem["src"], problem["src_covs_np"],
            offsets="direct1", polar_res=POLAR.astype(np.float64),
        )
        ours = np.asarray(res.rot, np.float64)
        # mutual angle between the two solutions
        cos = (np.trace(ours.T @ rot_oracle) - 1) / 2
        ang_deg = np.degrees(np.arccos(np.clip(cos, -1, 1)))
        assert ang_deg < 0.25, (ang_deg, ours, rot_oracle)
        # and both near the true rotation
        cos_t = (np.trace(ours.T @ problem["r_true"]) - 1) / 2
        assert np.degrees(np.arccos(np.clip(cos_t, -1, 1))) < 1.0


class TestCTSignQuantified:
    """The shipped velocity-continuity sign vs the difference form
    (rot_vgicp_impl.hpp:548; see gicp.ct_linearize docstring). The oracle
    runs the reference's exact translation LM under both signs on a
    forward-motion case; the production solver must agree with the fixed
    mode and beat the shipped mode on recovery."""

    def _translation_problem(self):
        src = _cloud(seed=5)
        t_true = np.array([1.2, 0.15, 0.0], np.float32)
        tgt = src + t_true
        mask = np.ones(len(src), bool)
        src_cov6 = estimate_cov6(jnp.asarray(src), jnp.asarray(mask), k=K, selector="exact")
        tgt_cov6 = estimate_cov6(jnp.asarray(tgt), jnp.asarray(mask), k=K, selector="exact")
        # uniform voxels: translation-friendly binning (direct7 widens the
        # basin so the 1.2 m step stays in correspondence range)
        vmap = build_voxel_map(jnp.asarray(tgt), tgt_cov6, jnp.asarray(mask), 4096, resolution=2.0)
        ctx = gicp.make_context(
            jnp.asarray(src), jnp.asarray(mask), src_cov6, vmap,
            resolution=2.0, neighbor_search="direct7",
        )
        voxels = oracle.build_voxel_map(tgt, _sym6_to_mats(tgt_cov6), resolution=2.0)
        corrs = oracle.update_correspondences(
            voxels, src, _sym6_to_mats(src_cov6), np.eye(3), np.zeros(3), "direct7",
            resolution=2.0,
        )
        return src, t_true, ctx, corrs

    def test_shipped_vs_fixed_recovery(self):
        src, t_true, ctx, corrs = self._translation_problem()
        # previous step had the same velocity; dt equal -> CT prior = keep going
        last = t_true.astype(np.float64)
        g = np.zeros(3)
        t_fixed = oracle.ct_lm_solve(corrs, src, g, last, 0.1, 0.1, 0.3, mode="fixed")
        t_shipped = oracle.ct_lm_solve(corrs, src, g, last, 0.1, 0.1, 0.3, mode="shipped")
        err_fixed = np.linalg.norm(t_fixed - t_true)
        err_shipped = np.linalg.norm(t_shipped - t_true)
        # quantified divergence: the shipped sign pulls against the motion
        assert err_fixed < 0.15, (t_fixed, t_true)
        assert err_shipped > 2.0 * err_fixed, (t_shipped, t_fixed, t_true)

        # production solver (rebind_rounds=1 == reference binding) agrees
        # with the oracle's FIXED mode
        res = lm.lm_translation_rebind(
            ctx, jnp.eye(3), jnp.zeros(3), jnp.asarray(g, jnp.float32),
            jnp.asarray(last, jnp.float32), jnp.asarray(0.1), jnp.asarray(0.1),
            0.3, rebind_rounds=1, max_outer=64, max_inner=10,
            trans_eps=5e-4, init_lambda_factor=1e-9,
        )
        np.testing.assert_allclose(np.asarray(res.trans), t_fixed, atol=0.08)
