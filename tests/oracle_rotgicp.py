"""f64 numpy oracle of the reference rot-GICP math.

A dependency-free transcription of the *mathematics* of
/root/reference/include/rot_gicp/ (not the code): covariance estimation,
polar/uniform voxel map accumulation, correspondence binding + Mahalanobis
precompute, the three linearizations, and the LM drivers — all in float64,
with dict-based voxel maps and explicit loops, structured nothing like the
SoA/keyed-matmul production implementation it checks.

Source math, file:line per function:
  - plane_covariances   <- calculate_covariances, rot_vgicp_impl.hpp:419-496
  - polar_coord/voxel_coord + map build <- vmp_voxel.hpp:167-229 (AdditiveVmfVoxel
    append/finalize :93-108)
  - update_correspondences <- rot_vgicp_impl.hpp:172-222
  - so3_linearize / compute_error <- rot_vgicp_impl.hpp:292-417
  - linearize (SE3)     <- rot_vgicp_impl.hpp:225-290
  - t3_linearize / compute_t_error <- rot_vgicp_impl.hpp:498-658; mode
    "shipped" reproduces the line-548 velocity-continuity sign, mode
    "fixed" the difference form (see rolo_tpu/registration/gicp.py
    ct_linearize docstring for why both exist)
  - so3_exp/se3_exp     <- so3/so3.hpp:58-104
  - rot_lm_solve / ct_lm_solve <- lsq_registration_impl.hpp:152-179,
    272-324 (rot_step_lm), 54-148 (computeTranslation/step_t_optimize)
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import numpy as np

F = np.float64


# ---------------------------------------------------------------------------
# so3.hpp
# ---------------------------------------------------------------------------

def skewd(v):
    return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]], F)


def so3_exp(omega):
    """Quaternion expmap -> rotation matrix (so3.hpp:58-77)."""
    theta_sq = float(np.dot(omega, omega))
    if theta_sq < 1e-24:
        theta = 0.0
        imag = 0.5 - (1.0 / 48.0) * theta_sq
        real = 1.0 - (1.0 / 8.0) * theta_sq
    else:
        theta = math.sqrt(theta_sq)
        imag = math.sin(0.5 * theta) / theta
        real = math.cos(0.5 * theta)
    w, x, y, z = real, *(imag * omega)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ], F)


def se3_exp(xi):
    """Rotation-first expmap with V-matrix (so3.hpp:80-104). xi = (w, t)."""
    omega, rho = xi[:3], xi[3:]
    theta = float(np.linalg.norm(omega))
    rot = so3_exp(omega)
    sk = skewd(omega)
    if theta < 1e-10:
        v = np.eye(3) + 0.5 * sk
    else:
        v = (np.eye(3) + (1 - math.cos(theta)) / theta**2 * sk
             + (theta - math.sin(theta)) / theta**3 * (sk @ sk))
    t = np.eye(4, dtype=F)
    t[:3, :3] = rot
    t[:3, 3] = v @ rho
    return t


# ---------------------------------------------------------------------------
# covariances (calculate_covariances)
# ---------------------------------------------------------------------------

def plane_covariances(xyz: np.ndarray, k: int = 20) -> np.ndarray:
    """kNN (brute force, includes self) + PLANE regularization: cov
    eigenvalues replaced by (1, 1, 1e-3). Returns [N, 3, 3] f64."""
    xyz = np.asarray(xyz, F)
    n = len(xyz)
    d2 = np.sum((xyz[:, None] - xyz[None]) ** 2, axis=-1)
    idx = np.argsort(d2, axis=1)[:, :k]
    covs = np.zeros((n, 3, 3), F)
    for i in range(n):
        nb = xyz[idx[i]]
        nb = nb - nb.mean(axis=0)
        cov = nb.T @ nb / k
        u, _, vt = np.linalg.svd(cov)
        covs[i] = u @ np.diag([1.0, 1.0, 1e-3]) @ vt
    return covs


# ---------------------------------------------------------------------------
# voxel map (vmp_voxel.hpp)
# ---------------------------------------------------------------------------

def polar_coord(p, polar_res) -> Tuple[int, int, int]:
    r = float(np.linalg.norm(p[:3]))
    theta = math.atan2(p[1], p[0]) + math.pi
    phi = math.acos(max(-1.0, min(1.0, p[2] / max(r, 1e-300))))
    return (int(math.floor(theta / polar_res[0])),
            int(math.floor(phi / polar_res[1])),
            int(math.floor(r / polar_res[2])))


def voxel_coord(p, resolution) -> Tuple[int, int, int]:
    return tuple(int(math.floor(p[i] / resolution - 0.5)) for i in range(3))


class Voxel:
    __slots__ = ("num", "mean", "cov")

    def __init__(self):
        self.num = 0
        self.mean = np.zeros(3, F)
        self.cov = np.zeros((3, 3), F)


def build_voxel_map(xyz, covs, polar_res=None, resolution=1.0) -> Dict[tuple, Voxel]:
    voxels: Dict[tuple, Voxel] = {}
    for p, c in zip(np.asarray(xyz, F), covs):
        key = polar_coord(p, polar_res) if polar_res is not None else voxel_coord(p, resolution)
        v = voxels.setdefault(key, Voxel())
        v.num += 1
        v.mean += p
        v.cov += c
    for v in voxels.values():
        v.mean = v.mean / v.num
        v.cov = v.cov / v.num
    return voxels


OFFSETS = {
    "direct1": [(0, 0, 0)],
    "direct7": [(0, 0, 0), (1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1)],
    "direct27": [(i - 1, j - 1, k - 1) for i in range(3) for j in range(3) for k in range(3)],
}


class Correspondence:
    __slots__ = ("i", "voxel", "maha")

    def __init__(self, i, voxel, maha):
        self.i = i
        self.voxel = voxel
        self.maha = maha


def update_correspondences(voxels, src_xyz, src_covs, rot, trans,
                           offsets="direct1", polar_res=None, resolution=1.0) -> List[Correspondence]:
    """Bind each transformed source point to existing neighbor voxels and
    precompute M = (cov_B + R cov_A R^T)^{-1} (rot_vgicp_impl.hpp:172-222)."""
    corrs = []
    rot = np.asarray(rot, F)
    trans = np.asarray(trans, F)
    for i, (p, ca) in enumerate(zip(np.asarray(src_xyz, F), src_covs)):
        tp = rot @ p + trans
        key = polar_coord(tp, polar_res) if polar_res is not None else voxel_coord(tp, resolution)
        for off in OFFSETS[offsets]:
            k2 = (key[0] + off[0], key[1] + off[1], key[2] + off[2])
            v = voxels.get(k2)
            if v is not None:
                rcr = v.cov + rot @ ca @ rot.T
                corrs.append(Correspondence(i, v, np.linalg.inv(rcr)))
    return corrs


# ---------------------------------------------------------------------------
# linearizations
# ---------------------------------------------------------------------------

def so3_linearize(corrs, src_xyz, rot, trans):
    """(err, H [3,3], b [3]) — rot_vgicp_impl.hpp:292-388."""
    h = np.zeros((3, 3), F)
    b = np.zeros(3, F)
    err = 0.0
    for c in corrs:
        p = rot @ np.asarray(src_xyz[c.i], F) + trans
        e = c.voxel.mean - p
        w = math.sqrt(c.voxel.num)
        err += w * e @ c.maha @ e
        j = skewd(p)
        h += w * j.T @ c.maha @ j
        b += w * j.T @ c.maha @ e
    return err, h, b


def compute_error(corrs, src_xyz, rot, trans):
    err = 0.0
    for c in corrs:
        p = rot @ np.asarray(src_xyz[c.i], F) + trans
        e = c.voxel.mean - p
        err += math.sqrt(c.voxel.num) * e @ c.maha @ e
    return err


def linearize_se3(corrs, src_xyz, rot, trans):
    """(err, H [6,6], b [6]) — rot_vgicp_impl.hpp:225-290. J = [skew(p)|-I],
    tangent order (w, t)."""
    h = np.zeros((6, 6), F)
    b = np.zeros(6, F)
    err = 0.0
    for c in corrs:
        p = rot @ np.asarray(src_xyz[c.i], F) + trans
        e = c.voxel.mean - p
        w = math.sqrt(c.voxel.num)
        err += w * e @ c.maha @ e
        j = np.zeros((3, 6), F)
        j[:, :3] = skewd(p)
        j[:, 3:] = -np.eye(3)
        h += w * j.T @ c.maha @ j
        b += w * j.T @ c.maha @ e
    return err, h, b


def t3_linearize(corrs, src_xyz, t, init_guess, last_t0, interval_tn,
                 interval_tn_1, ct_lambda, mode="shipped"):
    """(err, H [6,6], b [6]) — rot_vgicp_impl.hpp:498-607.

    mode="shipped": ct residual = (begin_A - transed_A)/dt_n - last/dt_{n-1}
    = -(g + t)/dt_n - last/dt_{n-1} exactly as shipped at :548 (the point
    cancels: begin_A - transed_A = (p - g) - (p + t) = -(g + t)).
    mode="fixed": the difference form (g + t)/dt_n - last/dt_{n-1}."""
    t = np.asarray(t, F)
    g = np.asarray(init_guess, F)
    last = np.asarray(last_t0, F)
    n = max(len(corrs), 1)
    lam = ct_lambda / n
    ct = -(g + t) / interval_tn - last / interval_tn_1
    if mode == "fixed":
        ct = (g + t) / interval_tn - last / interval_tn_1
    h = np.zeros((6, 6), F)
    b = np.zeros(6, F)
    err = 0.0
    for c in corrs:
        p = np.asarray(src_xyz[c.i], F) + t  # translation-only transform
        e = c.voxel.mean - p
        w = math.sqrt(c.voxel.num)
        err += w * (e @ c.maha @ e + lam * ct @ c.maha @ ct)
        j1 = np.zeros((3, 6), F)
        j1[:, :3] = skewd(p)
        j1[:, 3:] = -np.eye(3)
        j2 = j1 / interval_tn
        h += w * (j1.T @ c.maha @ j1 + lam * j2.T @ c.maha @ j2)
        b += w * (j1.T @ c.maha @ e + lam * j2.T @ c.maha @ ct)
    return err, h, b


def compute_t_error(corrs, src_xyz, t, init_guess, last_t0, interval_tn,
                    interval_tn_1, ct_lambda, mode="shipped"):
    err, _, _ = t3_linearize(corrs, src_xyz, np.asarray(t, F), init_guess, last_t0,
                             interval_tn, interval_tn_1, ct_lambda, mode)
    return err


# ---------------------------------------------------------------------------
# LM drivers (lsq_registration_impl.hpp)
# ---------------------------------------------------------------------------

def rot_lm_solve(voxels, src_xyz, src_covs, *, offsets="direct1", polar_res=None,
                 resolution=1.0, max_outer=64, max_inner=10,
                 lm_init_lambda_factor=1e-9, rotation_epsilon=2e-3,
                 transformation_epsilon=5e-4):
    """SO(3)-only LM (computeTransformation + rot_step_lm,
    lsq_registration_impl.hpp:152-179, 272-324): per outer iteration,
    rebind correspondences, linearize, inner LM accept/reject with
    lambda schedule, retract by left-multiplied so3_exp."""
    rot = np.eye(3, dtype=F)
    trans = np.zeros(3, F)
    lm_lambda = -1.0

    def converged(delta_rot):
        r = np.abs(delta_rot - np.eye(3)).max() / rotation_epsilon
        return r < 1.0

    for _ in range(max_outer):
        corrs = update_correspondences(voxels, src_xyz, src_covs, rot, trans,
                                       offsets, polar_res, resolution)
        y0, h, b = so3_linearize(corrs, src_xyz, rot, trans)
        if lm_lambda < 0:
            lm_lambda = lm_init_lambda_factor * np.abs(np.diag(h)).max()
        nu = 2.0
        stepped = False
        done = False
        for _ in range(max_inner):
            d = np.linalg.solve(h + lm_lambda * np.eye(3), -b)
            delta = so3_exp(d)
            rot_i = delta @ rot
            yi = compute_error(corrs, src_xyz, rot_i, trans)
            rho = (y0 - yi) / (d @ (lm_lambda * d - b))
            if rho < 0:
                if converged(delta):
                    done = True
                    stepped = True
                    break
                lm_lambda = nu * lm_lambda
                nu = 2 * nu
                continue
            rot = rot_i
            lm_lambda = lm_lambda * max(1.0 / 3.0, 1 - (2 * rho - 1) ** 3)
            stepped = True
            done = converged(delta)
            break
        if not stepped or done:
            break
    return rot


def ct_lm_solve(corrs, src_xyz, init_guess, last_t0, interval_tn, interval_tn_1,
                ct_lambda, *, mode="shipped", max_outer=64, max_inner=10,
                lm_init_lambda_factor=1e-9, transformation_epsilon=5e-4):
    """Translation LM (computeTranslation + step_t_optimize,
    lsq_registration_impl.hpp:54-148): correspondences fixed, retract
    t += se3_exp(d).translation, converge on elementwise |delta|."""
    t = np.zeros(3, F)
    lm_lambda = -1.0
    for _ in range(max_outer):
        y0, h, b = t3_linearize(corrs, src_xyz, t, init_guess, last_t0,
                                interval_tn, interval_tn_1, ct_lambda, mode)
        if lm_lambda < 0:
            lm_lambda = lm_init_lambda_factor * np.abs(np.diag(h)).max()
        nu = 2.0
        done = False
        stepped = False
        for _ in range(max_inner):
            d = np.linalg.solve(h + lm_lambda * np.eye(6), -b)
            delta = se3_exp(d)[:3, 3]
            xi = t + delta
            yi = compute_t_error(corrs, src_xyz, xi, init_guess, last_t0,
                                 interval_tn, interval_tn_1, ct_lambda, mode)
            rho = (y0 - yi) / (d @ (lm_lambda * d - b))
            if rho < 0:
                if np.abs(delta).max() / transformation_epsilon < 1.0:
                    done = True
                    stepped = True
                    break
                lm_lambda = nu * lm_lambda
                nu = 2 * nu
                continue
            t = xi
            lm_lambda = lm_lambda * max(1.0 / 3.0, 1 - (2 * rho - 1) ** 3)
            stepped = True
            done = np.abs(delta).max() / transformation_epsilon < 1.0
            break
        if not stepped or done:
            break
    return t
