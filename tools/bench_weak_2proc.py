"""Weak-scaling measurement across TWO OS processes (the DCN boundary):
constant per-device registration batch, 1 process/1 device vs 2 processes
(1 device each) on a ("host",) mesh via jax.distributed.

On this host each process gets its own physical core, so — unlike the
8-virtual-device strong-scaling rows in SCALING.json — the 2-process weak
row carries real scaling information: efficiency = t_1proc / t_2proc at
constant per-device work (perfect scaling = 1.0).

Appends/updates the "weak_2process" entry of SCALING.json.

Usage: python tools/bench_weak_2proc.py [--points 1024] [--per-dev-batch 8]
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_WORKER = r"""
import os, sys, time, json
port, pid, nproc, n, b_per = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]), int(sys.argv[5])
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=1").strip()
import jax
jax.config.update("jax_platforms", "cpu")
from rolo_tpu.runtime.platform import enable_compilation_cache
enable_compilation_cache()
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rolo_tpu.config import RegistrationConfig
from rolo_tpu.parallel.batch import registration_batch, shard_registration_inputs
from rolo_tpu.parallel.mesh import distributed_init

if nproc > 1:
    ok = distributed_init(f"localhost:{port}", nproc, pid)
    assert ok and jax.process_count() == nproc

devs = np.asarray(jax.devices())
mesh = Mesh(devs.reshape(len(devs)), ("batch",))
b = b_per * len(devs)

from __graft_entry__ import _synthetic_features
src = np.stack([_synthetic_features(n, seed=i) for i in range(b)])
rng = np.random.default_rng(0)
ang = rng.uniform(0.01, 0.05, b)
tgt = np.stack([
    s @ np.array([[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]], np.float32).T
    + rng.uniform(-0.3, 0.3, 3).astype(np.float32)
    for s, a in zip(src, ang)
])
masks = np.ones((b, n), bool)
cfg = RegistrationConfig()
inputs = shard_registration_inputs(mesh, jnp.asarray(src), jnp.asarray(masks),
                                   jnp.asarray(tgt), jnp.asarray(masks))
fn = lambda: registration_batch(*inputs, cfg=cfg, voxel_capacity=2048, k=10)
jax.block_until_ready(fn())
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    jax.block_until_ready(fn())
    best = min(best, time.perf_counter() - t0)
print(f"RESULT_{pid} " + json.dumps({"time_s": best, "batch": b, "regs_per_s": b / best}))
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run(nproc: int, n: int, b_per: int, tmp: str) -> dict:
    port = _free_port()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    script = os.path.join(tmp, "weak_worker.py")
    with open(script, "w") as f:
        f.write(_WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, script, str(port), str(pid), str(nproc), str(n), str(b_per)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(nproc)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            raise RuntimeError(f"worker {pid} failed:\n{out}")
    line = next(l for l in outs[0].splitlines() if l.startswith("RESULT_0"))
    return json.loads(line.split(" ", 1)[1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=1024)
    ap.add_argument("--per-dev-batch", type=int, default=8)
    ap.add_argument("--out", default="SCALING.json")
    args = ap.parse_args()

    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        one = _run(1, args.points, args.per_dev_batch, tmp)
        two = _run(2, args.points, args.per_dev_batch, tmp)

    eff = one["time_s"] / two["time_s"]
    row = {
        "mode": "weak (constant per-device batch, 2 OS processes, DCN)",
        "per_device_batch": args.per_dev_batch,
        "points": args.points,
        "t_1proc_s": round(one["time_s"], 4),
        "t_2proc_s": round(two["time_s"], 4),
        "regs_per_s_1proc": round(one["regs_per_s"], 2),
        "regs_per_s_2proc_total": round(2 * args.per_dev_batch / two["time_s"], 2),
        "weak_efficiency": round(eff, 3),
        "n_physical_cores": os.cpu_count(),
    }
    print(json.dumps(row))
    data = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            data = json.load(f)
    data["weak_2process"] = row
    with open(args.out, "w") as f:
        json.dump(data, f, indent=2)
    print(f"updated {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
