"""Compare dense-Cholesky vs matrix-free PCG pose-graph solves for
accuracy and wall time at several capacity buckets (VERDICT round-2 item 1:
the chain-preconditioned PCG costs ~2 s at 80 poses on TPU because its
three lax.scans serialize 6x6 ops)."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

from rolo_tpu.runtime.platform import enable_compilation_cache, pin_requested_platform

pin_requested_platform()
enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from rolo_tpu.graph import empty_graph, add_between, solve_pose_graph
from test_graph import TestScaleVsOracle


def build(k_cap, n_poses, loops, priors, odom_rot, odom_trans, first_rot, first_trans):
    graph = empty_graph(k_cap, 64, 32)
    ort = np.broadcast_to(np.eye(3, dtype=np.float32), (k_cap, 3, 3)).copy()
    otr = np.zeros((k_cap, 3), np.float32)
    ort[:n_poses] = odom_rot[:n_poses]
    otr[:n_poses] = odom_trans[:n_poses]
    graph = graph._replace(
        odom_rel_rot=jnp.asarray(ort), odom_rel_trans=jnp.asarray(otr),
        first_rot=jnp.asarray(first_rot, jnp.float32),
        first_trans=jnp.asarray(first_trans, jnp.float32),
    )
    for (i, j, rr, rt, var, rc) in loops:
        if i < n_poses and j < n_poses:
            graph = graph._replace(loops=add_between(
                graph.loops, i, j, jnp.asarray(rr, jnp.float32), jnp.asarray(rt, jnp.float32),
                jnp.asarray(var, jnp.float32), robust_c=jnp.asarray(rc, jnp.float32)))
    for (i, j, rr, rt, var, rc) in priors:
        if i < n_poses and j < n_poses:
            graph = graph._replace(priors=add_between(
                graph.priors, i, j, jnp.asarray(rr, jnp.float32), jnp.asarray(rt, jnp.float32),
                jnp.asarray(var, jnp.float32)))
    return graph


def main():
    print("device:", jax.devices()[0])
    gen = TestScaleVsOracle()
    (true_rot, true_trans, odom_rot, odom_trans, est_rot, est_trans,
     loops, priors) = gen._big_graph()

    for k_cap in (128, 256, 512, 1024, 2048):
        n = k_cap
        er = np.broadcast_to(np.eye(3, dtype=np.float32), (k_cap, 3, 3)).copy()
        et = np.zeros((k_cap, 3), np.float32)
        er[:n] = est_rot[:n]
        et[:n] = est_trans[:n]
        graph = build(k_cap, n, loops, priors, odom_rot, odom_trans,
                      true_rot[0], true_trans[0])
        rot0 = jnp.asarray(er)
        trans0 = jnp.asarray(et)
        cnt = jnp.asarray(n)

        results = {}
        for method in ("dense", "pcg"):
            fn = jax.jit(lambda g, r, t, c, m=method: solve_pose_graph(g, r, t, c, method=m))
            sol = fn(graph, rot0, trans0, cnt)
            jax.block_until_ready(sol)
            t0 = time.perf_counter()
            for _ in range(3):
                sol = fn(graph, rot0, trans0, cnt)
            jax.block_until_ready(sol)
            dt = (time.perf_counter() - t0) / 3
            err = np.linalg.norm(np.asarray(sol.trans[:n]) - true_trans[:n], axis=1)
            results[method] = (dt, err.max(), float(sol.final_error), bool(sol.converged))
            if k_cap == 2048 and method == "pcg":
                break  # pcg at 2048 takes ~minutes; skip repeat timing
        for method, (dt, emax, chi2, conv) in results.items():
            print(f"K={k_cap:5d} {method:6s} {dt*1e3:9.2f} ms  max|t-gt|={emax:8.4f} "
                  f"chi2={chi2:12.2f} conv={conv}")


if __name__ == "__main__":
    main()
