"""Diagnose the CT-translation per-pair error on the bench workload
(VERDICT round-2 item 2: median 0.275 m on 0.90 m true motion; target
<= 0.10 m).

Variants, each measured as median/mean |t_est - t_gt| over the bench's 16
raycast scan pairs at zero initial guess:

  A  default              — shipped path: residual on UNROTATED source
                            (reference semantics, rot_vgicp_impl.hpp:528),
                            step = guess + ct.
  B  rotated-residual     — residual e = mean_B - (R p + t) via a
                            pre-rotated context; step = R guess + ct
                            (consistent rigid model).
  C  B + ct_lambda=0      — isolates the velocity-continuity pull toward
                            last_t0 (zero in this workload).
  D  B + rebind_rounds=8  — isolates binding sparsity at large offsets.
  E  A + true last_t0     — the pipeline regime (constant-velocity prior
                            centered at the true previous step).
  F  B + true last_t0
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from rolo_tpu.runtime.platform import enable_compilation_cache, pin_requested_platform

pin_requested_platform()
enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from bench import _build_pairs
from rolo_tpu.config import RegistrationConfig, RoloConfig
from rolo_tpu.ops import sym3
from rolo_tpu.registration import gicp, lm
from rolo_tpu.registration.rotgicp import register_scan_pair
from rolo_tpu.voxel.knn import estimate_cov6
from rolo_tpu.voxel.voxelmap import build_voxel_map


def register_variant(
    src_xyz, src_mask, tgt_xyz, tgt_mask, init_t, last_t, dt,
    cfg: RegistrationConfig, voxel_capacity: int, k: int,
    rotated_residual: bool,
    trans_voxel: str = "polar",  # polar | uniform
    trans_resolution: float = 1.0,
    trans_neighbors: str = "direct1",
):
    dtype = src_xyz.dtype
    src_cov = estimate_cov6(src_xyz, src_mask, k=k, method=cfg.regularization)
    tgt_cov = estimate_cov6(tgt_xyz, tgt_mask, k=k, method=cfg.regularization)
    polar_res = jnp.asarray(cfg.polar_resolution, dtype) if cfg.voxel_type == "polar" else None
    vmap = build_voxel_map(tgt_xyz, tgt_cov, tgt_mask, voxel_capacity,
                           polar_res=polar_res, resolution=cfg.voxel_resolution)
    ctx = gicp.make_context(src_xyz, src_mask, src_cov, vmap,
                            polar_res=polar_res, resolution=cfg.voxel_resolution,
                            neighbor_search=cfg.neighbor_search)
    rot_res = lm.lm_register_rotation(
        ctx, jnp.eye(3, dtype=dtype), jnp.zeros(3, dtype=dtype),
        max_outer=cfg.max_outer_iterations, max_inner=cfg.lm_max_inner_iterations,
        rot_eps=cfg.rotation_epsilon, trans_eps=cfg.transformation_epsilon,
        init_lambda_factor=cfg.lm_init_lambda_factor)

    if trans_voxel == "cascade":
        # coarse-to-fine: polar stage (rotation-native binning, wide pull)
        # then a fine uniform stage (quantization floor ~resolution/2)
        rot = rot_res.rot
        ctx_t = ctx._replace(
            src_t=rot @ ctx.src_t,
            src_cov6=sym3.congruence(rot, ctx.src_cov6),
        )
        ct1 = lm.lm_translation_rebind(
            ctx_t, jnp.eye(3, dtype=dtype), jnp.zeros(3, dtype=dtype),
            rot @ init_t, last_t, dt, dt, cfg.ct_lambda,
            rebind_rounds=cfg.ct_rebind_rounds,
            max_outer=cfg.max_outer_iterations, max_inner=cfg.lm_max_inner_iterations,
            trans_eps=cfg.transformation_epsilon,
            init_lambda_factor=cfg.lm_init_lambda_factor)
        vmap_t = build_voxel_map(tgt_xyz, tgt_cov, tgt_mask, voxel_capacity,
                                 polar_res=None, resolution=trans_resolution)
        ctx_u = gicp.make_context(
            (rot @ src_xyz.T).T, src_mask, sym3.congruence(rot, src_cov),
            vmap_t, polar_res=None, resolution=trans_resolution,
            neighbor_search=trans_neighbors)
        ct2 = lm.lm_translation_rebind(
            ctx_u, jnp.eye(3, dtype=dtype), ct1.trans,
            rot @ init_t, last_t, dt, dt, cfg.ct_lambda,
            rebind_rounds=cfg.ct_rebind_rounds,
            max_outer=cfg.max_outer_iterations, max_inner=cfg.lm_max_inner_iterations,
            trans_eps=cfg.transformation_epsilon,
            init_lambda_factor=cfg.lm_init_lambda_factor)
        return rot, rot @ init_t + ct2.trans

    if trans_voxel == "p2p":
        # polar CT stage then point-to-plane fine refinement: 5-NN plane
        # fits on the feature clouds (the scan2map machinery) with a
        # translation-only GN — no voxel-mean quantization floor.
        from rolo_tpu.mapping.scan2map import surf_bind, surf_eval
        from rolo_tpu.pointcloud.cloud import PaddedCloud
        rot = rot_res.rot
        ctx_t = ctx._replace(
            src_t=rot @ ctx.src_t,
            src_cov6=sym3.congruence(rot, ctx.src_cov6),
        )
        ct1 = lm.lm_translation_rebind(
            ctx_t, jnp.eye(3, dtype=dtype), jnp.zeros(3, dtype=dtype),
            rot @ init_t, last_t, dt, dt, cfg.ct_lambda,
            rebind_rounds=cfg.ct_rebind_rounds,
            max_outer=cfg.max_outer_iterations, max_inner=cfg.lm_max_inner_iterations,
            trans_eps=cfg.transformation_epsilon,
            init_lambda_factor=cfg.lm_init_lambda_factor)
        src_r = (rot @ src_xyz.T).T
        tgt_cloud = PaddedCloud(tgt_xyz, tgt_mask)
        eye = jnp.eye(3, dtype=dtype)
        t = ct1.trans
        for _ in range(4):
            sb = surf_bind(src_r + t, src_mask, tgt_cloud, eye, jnp.zeros(3, dtype),
                           approx_knn=True)
            for _ in range(2):
                f = surf_eval(sb, src_r + t, eye, jnp.zeros(3, dtype))
                w = f.valid.astype(dtype)
                h = jnp.einsum("n,ni,nj->ij", w, f.direction, f.direction)
                b = jnp.einsum("n,ni,n->i", w, f.direction, f.residual)
                step = jnp.linalg.solve(h + 1e-6 * eye, -b)
                t = t + step
        return rot, rot @ init_t + t

    if rotated_residual:
        rot = rot_res.rot
        if trans_voxel == "uniform":
            vmap_t = build_voxel_map(tgt_xyz, tgt_cov, tgt_mask, voxel_capacity,
                                     polar_res=None, resolution=trans_resolution)
            ctx_t = gicp.make_context(
                (rot @ src_xyz.T).T, src_mask, sym3.congruence(rot, src_cov),
                vmap_t, polar_res=None, resolution=trans_resolution,
                neighbor_search=trans_neighbors)
        else:
            ctx_t = ctx._replace(
                src_t=rot @ ctx.src_t,
                src_cov6=sym3.congruence(rot, ctx.src_cov6),
            )
        ct_res = lm.lm_translation_rebind(
            ctx_t, jnp.eye(3, dtype=dtype), jnp.zeros(3, dtype=dtype),
            rot @ init_t, last_t, dt, dt, cfg.ct_lambda,
            rebind_rounds=cfg.ct_rebind_rounds,
            max_outer=cfg.max_outer_iterations, max_inner=cfg.lm_max_inner_iterations,
            trans_eps=cfg.transformation_epsilon,
            init_lambda_factor=cfg.lm_init_lambda_factor)
        trans = rot @ init_t + ct_res.trans
    else:
        ct_res = lm.lm_translation_rebind(
            ctx, rot_res.rot, jnp.zeros(3, dtype=dtype),
            init_t, last_t, dt, dt, cfg.ct_lambda,
            rebind_rounds=cfg.ct_rebind_rounds,
            max_outer=cfg.max_outer_iterations, max_inner=cfg.lm_max_inner_iterations,
            trans_eps=cfg.transformation_epsilon,
            init_lambda_factor=cfg.lm_init_lambda_factor)
        trans = init_t + ct_res.trans
    return rot_res.rot, trans


def main():
    batch = 16
    cfgs = RoloConfig()
    voxel_capacity = cfgs.static.max_voxels
    k = 20

    import os
    cache = "/tmp/diag_ct_pairs.npz"
    t0 = time.perf_counter()
    if os.path.exists(cache):
        z = np.load(cache)
        src, src_mask, tgt, tgt_mask, gt_rot, gt_trans = (
            z["src"], z["src_mask"], z["tgt"], z["tgt_mask"], z["gt_rot"], z["gt_trans"])
    else:
        src, src_mask, tgt, tgt_mask, gt_rot, gt_trans = _build_pairs(batch)
        np.savez(cache, src=src, src_mask=src_mask, tgt=tgt, tgt_mask=tgt_mask,
                 gt_rot=gt_rot, gt_trans=gt_trans)
    print(f"workload gen {time.perf_counter() - t0:.1f}s  "
          f"median |gt|={np.median(np.linalg.norm(gt_trans, axis=1)):.3f} m",
          file=sys.stderr)
    src = jnp.asarray(src); tgt = jnp.asarray(tgt)
    src_mask = jnp.asarray(src_mask); tgt_mask = jnp.asarray(tgt_mask)
    dt = jnp.full((batch,), 0.2, jnp.float32)
    zero = jnp.zeros((batch, 3))

    # true previous-step translation in the same (cur frame) convention:
    # workload pairs are consecutive same-stride pairs, so the "previous"
    # step roughly equals the current one — use gt itself as last_t0 proxy.
    gt_j = jnp.asarray(gt_trans)

    def run(cfg, rotated, last, tv="polar", tres=1.0, tn="direct1"):
        fn = jax.jit(jax.vmap(
            lambda s, sm, t, tm, g, l, d: register_variant(
                s, sm, t, tm, g, l, d, cfg, voxel_capacity, k, rotated,
                trans_voxel=tv, trans_resolution=tres, trans_neighbors=tn)))
        r, tr = fn(src, src_mask, tgt, tgt_mask, zero, last, dt)
        r = np.asarray(r); tr = np.asarray(tr)
        cos = (np.trace(np.einsum("bij,bik->bjk", gt_rot, r), axis1=1, axis2=2) - 1) / 2
        rot_err = np.degrees(np.arccos(np.clip(cos, -1, 1)))
        terr = np.linalg.norm(tr - gt_trans, axis=1)
        return rot_err, terr

    base = RegistrationConfig()
    variants = [
        ("A default (unrotated, lam=0.3)", base, False, zero, {}),
        ("B rotated-residual", base, True, zero, {}),
        ("P cascade polar->uni0.25 d7", base, True, zero, dict(tv="cascade", tres=0.25, tn="direct7")),
        ("R polar -> point-to-plane", base, True, zero, dict(tv="p2p")),
    ]
    for name, cfg, rotated, last, kw in variants:
        rot_err, terr = run(cfg, rotated, last, **kw)
        print(f"{name:34s} rot med {np.median(rot_err):6.3f} deg   "
              f"trans med {np.median(terr):6.3f} m  mean {np.mean(terr):6.3f}  "
              f"max {np.max(terr):6.3f}")


if __name__ == "__main__":
    main()
