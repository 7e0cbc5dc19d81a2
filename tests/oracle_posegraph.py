"""f64 numpy/scipy oracle for the pose-graph solver.

Dense-math Gauss-Newton over the same factor model as
rolo_tpu/graph/solver.py (GTSAM BetweenFactor convention: residual
e = Log(Z^-1 T_i^-1 T_j), right-perturbation Jacobians by central
differences, diagonal information 1/var with Cauchy IRLS for robust
factors, first-pose anchor prior), solved exactly with a sparse direct
factorization per iteration. Everything float64 — the ground truth the f32
PCG solve is checked against at full capacity (VERDICT round-1 item 7).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from oracle_rotgicp import se3_exp, so3_exp, skewd


def se3_log(rot: np.ndarray, trans: np.ndarray) -> np.ndarray:
    """Inverse of se3_exp, (w, t) tangent order, f64."""
    cos = np.clip((np.trace(rot) - 1.0) / 2.0, -1.0, 1.0)
    theta = np.arccos(cos)
    if theta < 1e-9:
        w = np.array([rot[2, 1] - rot[1, 2], rot[0, 2] - rot[2, 0], rot[1, 0] - rot[0, 1]]) / 2.0
    else:
        w = theta / (2.0 * np.sin(theta)) * np.array(
            [rot[2, 1] - rot[1, 2], rot[0, 2] - rot[2, 0], rot[1, 0] - rot[0, 1]]
        )
    th_sq = float(w @ w)
    wh = skewd(w)
    if th_sq < 1e-10:
        v_inv = np.eye(3) - 0.5 * wh + (1.0 / 12.0) * (wh @ wh)
    else:
        th = np.sqrt(th_sq)
        half = 0.5 * th
        cot = (1.0 - half * np.cos(half) / np.sin(half)) / th_sq
        v_inv = np.eye(3) - 0.5 * wh + cot * (wh @ wh)
    return np.concatenate([w, v_inv @ trans])


def _compose(ra, ta, rb, tb):
    return ra @ rb, ra @ tb + ta


def _inv(r, t):
    return r.T, -r.T @ t


def between_residual(ri, ti, rj, tj, zr, zt) -> np.ndarray:
    ir, it = _inv(ri, ti)
    dr, dt = _compose(ir, it, rj, tj)
    zir, zit = _inv(zr, zt)
    er, et = _compose(zir, zit, dr, dt)
    return se3_log(er, et)


def _jacobians_fd(ri, ti, rj, tj, zr, zt, eps=1e-6):
    """Central-difference right-perturbation Jacobians [6,6] wrt xi_i, xi_j."""
    ji = np.zeros((6, 6))
    jj = np.zeros((6, 6))
    for k in range(6):
        xi = np.zeros(6)
        xi[k] = eps
        tp = se3_exp(np.concatenate([xi[:3], xi[3:]]))
        tm = se3_exp(np.concatenate([-xi[:3], -xi[3:]]))
        rp, tp_ = _compose(ri, ti, tp[:3, :3], tp[:3, 3])
        rm, tm_ = _compose(ri, ti, tm[:3, :3], tm[:3, 3])
        ji[:, k] = (between_residual(rp, tp_, rj, tj, zr, zt)
                    - between_residual(rm, tm_, rj, tj, zr, zt)) / (2 * eps)
        rp, tp_ = _compose(rj, tj, tp[:3, :3], tp[:3, 3])
        rm, tm_ = _compose(rj, tj, tm[:3, :3], tm[:3, 3])
        jj[:, k] = (between_residual(ri, ti, rp, tp_, zr, zt)
                    - between_residual(ri, ti, rm, tm_, zr, zt)) / (2 * eps)
    return ji, jj


def solve_pose_graph_oracle(
    rot: np.ndarray,  # [K, 3, 3] initial poses (active prefix)
    trans: np.ndarray,  # [K, 3]
    odom_rel_rot: np.ndarray,  # [K, 3, 3], factor k constrains k-1 -> k
    odom_rel_trans: np.ndarray,
    first_rot: np.ndarray,
    first_trans: np.ndarray,
    loops: list,  # (i, j, rel_rot, rel_trans, noise_var[6], robust_c)
    odom_var,
    first_var,
    iterations: int = 20,
    tol: float = 1e-12,
):
    """Full-graph GN with exact sparse solves; returns (rot, trans, chi2)."""
    k = rot.shape[0]
    rot = rot.astype(np.float64).copy()
    trans = trans.astype(np.float64).copy()
    odom_var = np.asarray(odom_var, np.float64)
    first_var = np.asarray(first_var, np.float64)

    factors = []
    for f in range(1, k):
        factors.append((f - 1, f, odom_rel_rot[f], odom_rel_trans[f], odom_var, 0.0))
    factors += [tuple(l) for l in loops]

    grid_r, grid_c = np.meshgrid(np.arange(6), np.arange(6), indexing="ij")
    grid_r = grid_r.ravel()
    grid_c = grid_c.ravel()

    last_chi2 = np.inf
    for _ in range(iterations):
        blocks, block_rows, block_cols = [], [], []
        g = np.zeros(6 * k)
        chi2 = 0.0

        def add_block(r0, c0, block):
            blocks.append(block.ravel())
            block_rows.append(r0 + grid_r)
            block_cols.append(c0 + grid_c)

        # first-pose anchor (unary on pose 0)
        res = between_residual(np.eye(3), np.zeros(3), rot[0], trans[0], first_rot, first_trans)
        _, jj = _jacobians_fd(np.eye(3), np.zeros(3), rot[0], trans[0], first_rot, first_trans)
        w = 1.0 / first_var
        add_block(0, 0, jj.T @ (w[:, None] * jj))
        g[:6] += jj.T @ (w * res)
        chi2 += float(res @ (w * res))

        for (i, j, zr, zt, var, rc) in factors:
            res = between_residual(rot[i], trans[i], rot[j], trans[j], zr, zt)
            ji, jj = _jacobians_fd(rot[i], trans[i], rot[j], trans[j], zr, zt)
            w = 1.0 / np.asarray(var, np.float64)
            if rc and rc > 0:
                r2 = float(res @ (w * res))
                w = w * (rc * rc / max(rc * rc + r2, 1e-12))
            chi2 += float(res @ (w * res))
            add_block(6 * i, 6 * i, ji.T @ (w[:, None] * ji))
            add_block(6 * i, 6 * j, ji.T @ (w[:, None] * jj))
            add_block(6 * j, 6 * i, jj.T @ (w[:, None] * ji))
            add_block(6 * j, 6 * j, jj.T @ (w[:, None] * jj))
            g[6 * i: 6 * i + 6] += ji.T @ (w * res)
            g[6 * j: 6 * j + 6] += jj.T @ (w * res)

        h = sp.csc_matrix(
            (np.concatenate(blocks), (np.concatenate(block_rows), np.concatenate(block_cols))),
            shape=(6 * k, 6 * k),
        )
        h = h + sp.eye(6 * k) * 1e-9
        delta = spla.spsolve(h, -g)

        for p in range(k):
            t_upd = se3_exp(delta[6 * p: 6 * p + 6])
            rot[p], trans[p] = _compose(rot[p], trans[p], t_upd[:3, :3], t_upd[:3, 3])

        if abs(last_chi2 - chi2) <= tol * max(chi2, 1.0):
            break
        last_chi2 = chi2

    return rot, trans, chi2
