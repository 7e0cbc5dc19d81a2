"""Per-op breakdown of the pipeline front-end step (VERDICT round-3 item 2:
"profile one scan_step — per-op ms: voxel-join kernel, cov moments,
correspondence join, LM body — commit the breakdown, then attack the top
op").

Times each stage of frontend/odometry.scan_step at the REAL pipeline shapes
(max_feature_points=8192 features, voxel_capacity=8192) on the live device,
amortized over `iters` dispatches per timing to hide the ~25-30 ms tunnel
sync. Writes PROFILE_FRONTEND.json.

Usage (TPU): python tools/profile_frontend.py [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--n", type=int, default=8192, help="feature capacity")
    ap.add_argument("--valid", type=int, default=5500, help="valid features (pipeline-typical)")
    ap.add_argument("--out", default="PROFILE_FRONTEND.json")
    args = ap.parse_args()

    from rolo_tpu.runtime.platform import bench_metadata, enable_compilation_cache, pin_requested_platform

    pin_requested_platform()
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rolo_tpu.config import RoloConfig
    from rolo_tpu.frontend import odometry
    from rolo_tpu.ops import sym3
    from rolo_tpu.registration import gicp, lm
    from rolo_tpu.voxel.knn import estimate_cov6
    from rolo_tpu.voxel.voxelmap import build_voxel_map

    cfg = RoloConfig()
    rc = cfg.registration
    n, valid = args.n, args.valid
    cap = cfg.static.max_voxels

    # realistic feature cloud: ring-structured points at lidar ranges
    rng = np.random.default_rng(0)
    az = rng.uniform(0, 2 * np.pi, valid)
    el = rng.uniform(-0.4, 0.26, valid)
    r = rng.uniform(3.0, 60.0, valid)
    pts = np.stack([r * np.cos(el) * np.cos(az), r * np.cos(el) * np.sin(az), r * np.sin(el)], 1)
    src = np.zeros((n, 3), np.float32)
    src[:valid] = pts
    mask = np.zeros((n,), bool)
    mask[:valid] = True
    ang = 0.02
    c, s = np.cos(ang), np.sin(ang)
    rot_gt = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    tgt = np.zeros_like(src)
    tgt[:valid] = pts @ rot_gt.T + np.array([0.15, 0.03, 0.01], np.float32)

    src = jnp.asarray(src); tgt = jnp.asarray(tgt); mask_j = jnp.asarray(mask)
    dtype = src.dtype
    polar = jnp.asarray(rc.polar_resolution, dtype)
    dt = jnp.asarray(0.1, dtype)

    def timeit(name, fn, *a, iters=args.iters):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name:40s} {ms:9.3f} ms", flush=True)
        return out, ms

    rows = {}

    # 1. covariance moments (runs ONCE per scan on the new cloud)
    cov_fn = jax.jit(lambda x, m: estimate_cov6(x, m, k=rc.k_correspondences, method=rc.regularization))
    src_cov, rows["cov_moments"] = timeit("estimate_cov6 (kNN moments)", cov_fn, src, mask_j)
    tgt_cov = cov_fn(tgt, mask_j)

    # 2. polar voxel map build over target
    vm_fn = jax.jit(lambda x, c6, m: build_voxel_map(x, c6, m, cap, polar_res=polar, resolution=rc.voxel_resolution))
    vmap, rows["voxel_build_polar"] = timeit("build_voxel_map (polar)", vm_fn, tgt, tgt_cov, mask_j)

    # 3. correspondence join (make_context): rotation stage
    ctx_fn = jax.jit(lambda x, m, c6: gicp.make_context(
        x, m, c6, vmap, polar_res=polar, resolution=rc.voxel_resolution,
        neighbor_search=rc.neighbor_search))
    ctx, rows["make_context"] = timeit("make_context (join+mahalanobis)", ctx_fn, src, mask_j, src_cov)

    # 4. rotation LM (full outer budget)
    rot_fn = jax.jit(lambda ctx: lm.lm_register_rotation(
        ctx, jnp.eye(3, dtype=dtype), jnp.zeros(3, dtype),
        max_outer=rc.max_outer_iterations, max_inner=rc.lm_max_inner_iterations,
        rot_eps=rc.rotation_epsilon, trans_eps=rc.transformation_epsilon,
        init_lambda_factor=rc.lm_init_lambda_factor))
    rot_res, rows["lm_rotation"] = timeit("lm_register_rotation", rot_fn, ctx)
    print(f"  rotation iterations: {int(rot_res.iterations)}")

    # 5. CT translation (polar stage budgets: outer 16, rebinds 2)
    ct_fn = jax.jit(lambda ctx: lm.lm_translation_rebind(
        ctx, jnp.eye(3, dtype=dtype), jnp.zeros(3, dtype),
        jnp.zeros(3, dtype), jnp.zeros(3, dtype), dt, dt,
        rc.ct_lambda, rebind_rounds=min(rc.ct_rebind_rounds, 2),
        max_outer=min(rc.max_outer_iterations, 16), max_inner=rc.lm_max_inner_iterations,
        trans_eps=rc.transformation_epsilon, init_lambda_factor=rc.lm_init_lambda_factor))
    ct_res, rows["lm_ct_translation"] = timeit("lm_translation_rebind (polar)", ct_fn, ctx)
    print(f"  ct iterations: {int(ct_res.iterations)}")

    # 6. fine uniform stage: voxel build + context + translation
    if rc.ct_fine_resolution > 0:
        vmf_fn = jax.jit(lambda x, c6, m: build_voxel_map(x, c6, m, cap, polar_res=None, resolution=rc.ct_fine_resolution))
        vmap_f, rows["voxel_build_fine"] = timeit("build_voxel_map (fine uniform)", vmf_fn, tgt, tgt_cov, mask_j)
        ctxf_fn = jax.jit(lambda x, m, c6: gicp.make_context(
            x, m, c6, vmap_f, polar_res=None, resolution=rc.ct_fine_resolution,
            neighbor_search=rc.ct_fine_neighbors))
        ctx_f, rows["make_context_fine"] = timeit("make_context (fine, direct7)", ctxf_fn, src, mask_j, src_cov)
        ctf_fn = jax.jit(lambda ctx: lm.lm_translation_rebind(
            ctx, jnp.eye(3, dtype=dtype), jnp.zeros(3, dtype),
            jnp.zeros(3, dtype), jnp.zeros(3, dtype), dt, dt,
            rc.ct_lambda, rebind_rounds=min(rc.ct_rebind_rounds, 2),
            max_outer=min(rc.max_outer_iterations, 16), max_inner=rc.lm_max_inner_iterations,
            trans_eps=rc.transformation_epsilon, init_lambda_factor=rc.lm_init_lambda_factor))
        _, rows["lm_ct_fine"] = timeit("lm_translation_rebind (fine)", ctf_fn, ctx_f)

    # 7. sym3 congruence (translation-stage cov rotation)
    cong_fn = jax.jit(lambda r, c6: sym3.congruence(r, c6))
    _, rows["sym3_congruence"] = timeit("sym3.congruence", cong_fn, rot_res.rot, src_cov)

    # 8. whole scan_step at pipeline shapes
    state = odometry.init_state(n, dtype)
    step_fn = jax.jit(lambda st, x, m: odometry.scan_step(
        st, x, m, dt, rc, cap, rc.k_correspondences))
    state1, _ = step_fn(state, tgt, mask_j)  # prime with target as prev
    jax.block_until_ready(state1)
    _, rows["scan_step_total"] = timeit("scan_step (full)", lambda: step_fn(state1, src, mask_j))

    known = sum(v for k, v in rows.items() if k != "scan_step_total")
    print(f"\nsum of stages: {known:.1f} ms vs scan_step {rows['scan_step_total']:.1f} ms")
    out = {"shapes": {"n": n, "valid": valid, "voxel_capacity": cap},
           "stage_ms": {k: round(v, 3) for k, v in rows.items()},
           "machine": bench_metadata()}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
