"""Two-process `jax.distributed` CPU test (VERDICT round-2 item 7): the
DCN/multi-host path — `distributed_init` + the ("host", "batch") pod mesh —
executed end-to-end across two real OS processes on localhost, not just
unit-tested at process-count 1.

Each worker owns 2 virtual CPU devices; the pod mesh is 2 hosts x 2
devices. The workload shards a batch over (host, batch) and reduces across
the mesh, so the cross-process collective path actually runs.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
port, pid = sys.argv[1], int(sys.argv[2])
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=2").strip()
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from rolo_tpu.parallel.mesh import distributed_init, make_pod_mesh

ok = distributed_init(f"localhost:{port}", 2, pid)
assert ok, "distributed_init did not reach multi-process mode"
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()
assert jax.local_device_count() == 2

mesh = make_pod_mesh()
assert mesh.shape["host"] == 2 and mesh.shape["batch"] == 2

# global batch of 8 rows sharded over (host, batch); the sum reduces over
# BOTH axes -> requires a cross-process (DCN) collective
rows = jnp.arange(8.0)[:, None] * jnp.ones((1, 16))
sharding = NamedSharding(mesh, P(("host", "batch")))
arr = jax.device_put(rows, sharding)

@jax.jit
def reduce_all(x):
    return jnp.sum(x)

total = float(reduce_all(arr))
expected = float(np.sum(np.arange(8.0)[:, None] * np.ones((1, 16))))
assert abs(total - expected) < 1e-3, (total, expected)

# per-host contribution via shard_map psum over the host axis
from jax.sharding import PartitionSpec
try:
    from jax import shard_map
except ImportError:
    from jax.experimental.shard_map import shard_map
from functools import partial

@partial(shard_map, mesh=mesh, in_specs=P(("host", "batch")), out_specs=P())
def host_psum(x):
    local = jnp.sum(x)
    return jax.lax.psum(jax.lax.psum(local, "batch"), "host")[None]

total2 = float(host_psum(arr)[0])
assert abs(total2 - expected) < 1e-3, (total2, expected)

# --- REAL registration workload across the process boundary -------------
# (VERDICT round-3 item 5: no registration had ever crossed DCN)
from rolo_tpu.config import RegistrationConfig
from rolo_tpu.parallel.batch import registration_batch, shard_registration_inputs
from rolo_tpu.parallel.spmd import register_scan_pair_spmd

cfg = RegistrationConfig(max_outer_iterations=8, alt_rounds=1, ct_fine_resolution=0.0)
rng = np.random.default_rng(0)
n, b = 512, 4
base = rng.uniform(-15, 15, (b, n, 3)).astype(np.float32)
ang = 0.03
c, s = np.cos(ang), np.sin(ang)
R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
t_gt = np.array([0.25, -0.1, 0.05], np.float32)
tgt = base @ R.T + t_gt
mask = np.ones((b, n), bool)

# (a) batch sharded over the 2x2 (host, batch) pod mesh
inputs = shard_registration_inputs(
    mesh, jnp.asarray(base), jnp.asarray(mask), jnp.asarray(tgt), jnp.asarray(mask),
    axis_name=("host", "batch"),
)
res = registration_batch(*inputs, cfg=cfg, voxel_capacity=2048, k=10)
# the result spans both processes; check the locally addressable shards
# (every batch item has the same GT transform, so no index bookkeeping)
rot_shards = [np.asarray(s.data).reshape(-1, 3, 3) for s in res.rot.addressable_shards]
trans_shards = [np.asarray(s.data).reshape(-1, 3) for s in res.trans.addressable_shards]
rots = np.concatenate(rot_shards)
trans = np.concatenate(trans_shards)
assert rots.shape[0] >= b // nproc if (nproc := jax.process_count()) else True
for i in range(rots.shape[0]):
    rot_err = np.degrees(np.arccos(np.clip((np.trace(rots[i] @ R.T) - 1) / 2, -1, 1)))
    assert rot_err < 0.5, (i, rot_err)
    assert np.linalg.norm(trans[i] - t_gt) < 0.08, (i, trans[i], t_gt)

# (b) ONE registration with the point axis sharded across all 4 devices
# (2 per process): the psum Hessian reduction rides the DCN boundary
from jax.sharding import Mesh as _Mesh
pt_mesh = _Mesh(np.asarray(jax.devices()).reshape(4), ("point",))
res1 = register_scan_pair_spmd(
    pt_mesh, jnp.asarray(base[0]), jnp.asarray(mask[0]),
    jnp.asarray(tgt[0]), jnp.asarray(mask[0]),
    jnp.zeros(3), jnp.zeros(3), jnp.asarray(0.1), jnp.asarray(0.1),
    cfg=cfg, voxel_capacity=2048, k=10,
)
r1 = np.asarray(res1.rot)
rot_err1 = np.degrees(np.arccos(np.clip((np.trace(r1 @ R.T) - 1) / 2, -1, 1)))
assert rot_err1 < 0.5, rot_err1
assert np.linalg.norm(np.asarray(res1.trans) - t_gt) < 0.08, res1.trans

print(f"WORKER_{pid}_OK total={total}")
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_pod_mesh(tmp_path):
    port = _free_port()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    # workers must not inherit the parent's forced 8-device flag
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"

    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(port), str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"WORKER_{pid}_OK" in out, out
