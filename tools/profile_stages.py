"""Stage-level timing of the scan-pair registration hot path on the live
device. Times each stage (covariances, voxel build, correspondence join,
rotation LM, CT translation) independently so optimization effort lands on
the actual bottleneck. Not part of the test suite."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from rolo_tpu.config import RegistrationConfig
from rolo_tpu.registration import gicp, lm
from rolo_tpu.registration.rotgicp import register_scan_pair
from rolo_tpu.voxel.knn import estimate_cov6
from rolo_tpu.voxel.voxelmap import build_voxel_map

import sys
sys.path.insert(0, ".")
from __graft_entry__ import _synthetic_features  # noqa: E402


def timeit(name, fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt * 1e3:9.2f} ms")
    return out


def main():
    n = 4096
    batch = 16
    cap = 8192
    cfg = RegistrationConfig()
    print("device:", jax.devices()[0])

    src = jnp.asarray(np.stack([_synthetic_features(n, seed=i) for i in range(batch)]))
    ang = 0.03
    c, s = np.cos(ang), np.sin(ang)
    r = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    tgt = jnp.asarray(np.asarray(src) @ r.T + np.array([0.3, 0.05, 0.0], np.float32))
    mask = jnp.ones((batch, n), bool)
    zeros = jnp.zeros((batch, 3), jnp.float32)
    dt = jnp.full((batch,), 0.1, jnp.float32)

    polar = jnp.asarray(cfg.polar_resolution, jnp.float32)

    cov_fn = jax.jit(jax.vmap(lambda x, m: estimate_cov6(x, m, k=20, method=cfg.regularization)))
    src_cov = timeit("estimate_cov6 (src+tgt)", lambda a, b: (cov_fn(a, mask), cov_fn(b, mask)), src, tgt)
    src_cov, tgt_cov = src_cov

    build_fn = jax.jit(
        jax.vmap(lambda x, c6, m: build_voxel_map(x, c6, m, cap, polar_res=polar, resolution=cfg.voxel_resolution))
    )
    vmaps = timeit("build_voxel_map", build_fn, tgt, tgt_cov, mask)

    def make_ctx(x, m, c6, vm):
        return gicp.make_context(x, m, c6, vm, polar_res=polar, resolution=cfg.voxel_resolution, neighbor_search=cfg.neighbor_search)

    ctxs = jax.vmap(make_ctx)(src, mask, src_cov, vmaps)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (batch, 3, 3))

    corr_fn = jax.jit(jax.vmap(gicp.update_correspondences))
    corr = timeit("update_correspondences (1 bind)", corr_fn, ctxs, eye, zeros)

    lin_fn = jax.jit(jax.vmap(gicp.so3_linearize))
    timeit("so3_linearize (1 iter)", lin_fn, ctxs, corr, eye, zeros)

    err_fn = jax.jit(jax.vmap(gicp.compute_error))
    timeit("compute_error (1 trial)", err_fn, ctxs, corr, eye, zeros)

    rot_fn = jax.jit(
        jax.vmap(
            lambda ctx: lm.lm_register_rotation(
                ctx, jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32),
                max_outer=cfg.max_outer_iterations, max_inner=cfg.lm_max_inner_iterations,
                rot_eps=cfg.rotation_epsilon, trans_eps=cfg.transformation_epsilon,
                init_lambda_factor=cfg.lm_init_lambda_factor,
            )
        )
    )
    rot_res = timeit("lm_register_rotation", rot_fn, ctxs)
    print("  rot iters:", np.asarray(rot_res.iterations))

    ct_fn = jax.jit(
        jax.vmap(
            lambda ctx, rot, g, d: lm.lm_translation_rebind(
                ctx, rot, jnp.zeros(3, jnp.float32), g, jnp.zeros(3, jnp.float32), d, d,
                cfg.ct_lambda, rebind_rounds=cfg.ct_rebind_rounds,
                max_outer=cfg.max_outer_iterations, max_inner=cfg.lm_max_inner_iterations,
                trans_eps=cfg.transformation_epsilon,
                init_lambda_factor=cfg.lm_init_lambda_factor,
            )
        )
    )
    ct_res = timeit("lm_translation_rebind", ct_fn, ctxs, rot_res.rot, zeros, dt)
    print("  ct iters:", np.asarray(ct_res.iterations))

    full = jax.jit(
        jax.vmap(
            lambda s, sm, t, tm, g, l, d: register_scan_pair(s, sm, t, tm, g, l, d, d, cfg, cap, 20)
        )
    )
    timeit("register_scan_pair (full)", full, src, mask, tgt, mask, zeros, zeros, dt)


if __name__ == "__main__":
    main()
