"""Decompose the dense graph-solve cost at the 2048 bucket: how much of
the ~800 ms (BENCH_LATENCY.json graph_solve_synced_ms_by_bucket) is the
12288x12288 Cholesky factor+solve, the dense-H assembly, and the GN
iteration count. Informs whether a structure-exploiting solver (chain
cyclic-reduction + Woodbury) is worth building or the dense path is
already near the floor.

Usage (TPU): python tools/diag_dense_solve.py
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

from rolo_tpu.geometry import se3
from rolo_tpu.graph import add_between, empty_graph, solve_pose_graph
from rolo_tpu.graph.solver import _dense_hessian, _linearize


def synth(k, n_loops=24, seed=0):
    rng = np.random.default_rng(seed)
    graph = empty_graph(k, 64, 32)
    rel_t = np.tile(np.array([0.7, 0.0, 0.0], np.float32), (k, 1))
    rel_t += rng.normal(0, 0.02, rel_t.shape).astype(np.float32)
    graph = graph._replace(
        odom_rel_rot=jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (k, 3, 3)),
        odom_rel_trans=jnp.asarray(rel_t),
    )
    loops = graph.loops
    for _ in range(n_loops):
        i = int(rng.integers(0, k - 10))
        j = int(rng.integers(i + 5, min(i + 200, k)))  # bounded span: keeps
        # the synthetic loop residuals far from the so3.log pi-singularity
        # that NaN'd the K=2048 chi2 (both methods) with unbounded spans
        loops = add_between(
            loops, jnp.asarray(i), jnp.asarray(j),
            jnp.eye(3, dtype=jnp.float32),
            jnp.asarray(np.asarray(rel_t[i + 1:j + 1].sum(0)), jnp.float32),
            jnp.full((6,), 1e-2, jnp.float32), jnp.asarray(0.0, jnp.float32),
        )
    return graph._replace(loops=loops)


def timeit(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1000, out


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    graph = synth(k)
    rot = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (k, 3, 3))
    trans = jnp.cumsum(graph.odom_rel_trans, axis=0)
    count = jnp.asarray(k, jnp.int32)
    active = (jnp.arange(k) < count)[:, None]

    lin = jax.jit(lambda r, t: _linearize(graph, r, t, count))
    ms_lin, blocks = timeit(lin, rot, trans)

    asm = jax.jit(lambda b: _dense_hessian(b, k, jnp.asarray(1e-6, jnp.float32), active))
    ms_asm, h = timeit(asm, blocks)

    chol = jax.jit(lambda h: jax.scipy.linalg.cho_factor(h, lower=True)[0])
    ms_chol, cf = timeit(chol, h)

    rhs = jnp.ones((k * 6,), jnp.float32)
    solv = jax.jit(lambda c, b: jax.scipy.linalg.cho_solve((c, True), b))
    ms_solve, _ = timeit(solv, cf, rhs)

    full = jax.jit(
        lambda r, t: solve_pose_graph(graph, r, t, count, method="dense")
    )
    ms_full, sol = timeit(full, rot, trans)
    iters = int(sol.iterations)

    bcr = jax.jit(
        lambda r, t: solve_pose_graph(graph, r, t, count, method="bcr")
    )
    ms_bcr, sol_b = timeit(bcr, rot, trans)

    print(f"K={k}: linearize {ms_lin:.1f} ms, assemble_H {ms_asm:.1f} ms, "
          f"cho_factor {ms_chol:.1f} ms, cho_solve {ms_solve:.1f} ms")
    print(f"dense solve {ms_full:.1f} ms at {iters} GN iterations "
          f"(per-iter floor = lin+asm+chol+solve = "
          f"{ms_lin + ms_asm + ms_chol + ms_solve:.1f} ms)")
    dt = np.abs(np.asarray(sol.trans) - np.asarray(sol_b.trans)).max()
    print(f"bcr solve {ms_bcr:.1f} ms at {int(sol_b.iterations)} GN iterations; "
          f"max |trans diff| vs dense {dt:.2e}; chi2 {float(sol.final_error):.4f} "
          f"vs {float(sol_b.final_error):.4f}")


if __name__ == "__main__":
    main()
