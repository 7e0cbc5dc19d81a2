"""Scaling-efficiency benchmark for batched registrations over a device mesh.

Measures the BASELINE.md pod target ("≥80% scaling efficiency for batched
registrations") in the form measurable in this environment:

  - On real multi-device hardware (a v5e slice), run with no flags: each
    mesh size runs a constant per-device batch (weak scaling) and
    efficiency_n = throughput_n / (n * throughput_1).
  - On the 8-virtual-CPU-device mesh (JAX_PLATFORMS=cpu +
    xla_force_host_platform_device_count=8, shared physical cores), weak
    scaling is meaningless (virtual devices contend for the same 2 cores),
    so the harness ALSO measures *sharding overhead*: the same total batch
    on 1 device vs sharded n ways — efficiency_n = t_1 / t_n. This isolates
    what the mesh actually adds (partitioning + collectives + dispatch),
    which is the controllable part of scaling efficiency.

Writes SCALING.json and prints one JSON line per mesh size.

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/bench_scaling.py [--points 1024] [--batch 16] [--pod]
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
    ap.add_argument("--points", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=16, help="TOTAL batch (shared across devices)")
    ap.add_argument("--voxel-capacity", type=int, default=2048)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--out", default="SCALING.json")
    args = ap.parse_args()

    from rolo_tpu.runtime.platform import enable_compilation_cache, pin_requested_platform

    pin_requested_platform()
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _synthetic_features
    from rolo_tpu.config import RegistrationConfig
    from rolo_tpu.parallel.batch import registration_batch, shard_registration_inputs
    from rolo_tpu.parallel.mesh import make_mesh, make_pod_mesh, shard_batch_pod

    n_dev = len(jax.devices())
    cfg = RegistrationConfig()
    b, n = args.batch, args.points
    rng = np.random.default_rng(0)

    src = np.stack([_synthetic_features(n, seed=i) for i in range(b)])
    ang = rng.uniform(0.01, 0.05, b)
    tgt = np.stack([
        s @ np.array([[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]], np.float32).T
        + rng.uniform(-0.3, 0.3, 3).astype(np.float32)
        for s, a in zip(src, ang)
    ])
    masks = np.ones((b, n), bool)

    def run_on(mesh, pod=False):
        if pod:
            from rolo_tpu.parallel.batch import ShardedRegistrationInputs

            dt = jnp.full((b,), 0.1, jnp.float32)
            tree = ShardedRegistrationInputs(
                jnp.asarray(src), jnp.asarray(masks), jnp.asarray(tgt), jnp.asarray(masks),
                jnp.zeros((b, 3), jnp.float32), jnp.zeros((b, 3), jnp.float32), dt, dt,
            )
            inputs = shard_batch_pod(tree, mesh)
        else:
            inputs = shard_registration_inputs(
                mesh, jnp.asarray(src), jnp.asarray(masks), jnp.asarray(tgt), jnp.asarray(masks)
            )
        fn = lambda: registration_batch(*inputs, cfg=cfg, voxel_capacity=args.voxel_capacity, k=10)
        jax.block_until_ready(fn())  # compile
        best = np.inf
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            best = min(best, time.perf_counter() - t0)
        return best

    sizes = [s for s in (1, 2, 4, 8, 16, 32) if s <= n_dev]
    rows = []
    t1 = None
    for s in sizes:
        mesh = make_mesh(s)
        t = run_on(mesh)
        if t1 is None:
            t1 = t
        speedup = t1 / t
        rows.append({
            "devices": s, "total_batch": b, "time_s": round(t, 4),
            "regs_per_s": round(b / t, 2),
            "speedup_vs_1dev": round(speedup, 3),
            "parallel_efficiency": round(speedup / s, 3),
            # rows with devices > physical cores measure partitioning
            # overhead only, not scaling (machine-readable caveat)
            "devices_exceed_physical_cores": s > os.cpu_count(),
        })
        print(json.dumps(rows[-1]))

    pod_row = None
    if n_dev >= 8:
        mesh2 = make_pod_mesh(n_hosts=2, devices_per_host=4)
        t = run_on(mesh2, pod=True)
        pod_row = {
            "devices": 8, "mesh": "2x4 (host,batch)", "total_batch": b,
            "time_s": round(t, 4), "regs_per_s": round(b / t, 2),
            "speedup_vs_1dev": round(t1 / t, 3),
            "parallel_efficiency": round(t1 / t / 8, 3),
            "devices_exceed_physical_cores": 8 > os.cpu_count(),
        }
        print(json.dumps(pod_row))

    out = {
        "metric": "strong-scaling speedup (t_1dev / t_ndev, same total batch)",
        "mode": "strong",  # same total batch; weak scaling = per-device constant batch
        "note": ("virtual CPU devices share the physical cores: rows where "
                 "devices_exceed_physical_cores carry no scaling information, "
                 "only partitioning/collective overhead. The >=80% BASELINE "
                 "efficiency target needs a real multi-chip slice."),
        "n_physical_cores": os.cpu_count(),
        "rows": rows,
        "pod_2d_mesh": pod_row,
    }
    from rolo_tpu.runtime.platform import bench_metadata

    out["machine"] = bench_metadata()
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
