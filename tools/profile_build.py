"""Micro-profile of build_voxel_map internals + candidate variants on the
live device. Chains dependent iterations inside one jit so per-call
dispatch/tunnel latency doesn't pollute the numbers."""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from __graft_entry__ import _synthetic_features  # noqa: E402

from rolo_tpu.config import RegistrationConfig  # noqa: E402
from rolo_tpu.ops.voxel_join import INVALID_PACK, keyed_matmul, pack_polar  # noqa: E402
from rolo_tpu.voxel.voxelmap import build_voxel_map, polar_coord  # noqa: E402
from rolo_tpu.voxel.knn import estimate_cov6  # noqa: E402


def chain_time(name, fn, x, iters=8):
    """fn: x -> (scalar-ish output, perturbed x). Chained `iters` times."""

    @jax.jit
    def chained(x0):
        def body(c, _):
            return fn(c), None
        out, _ = jax.lax.scan(body, x0, None, length=iters)
        return out

    jax.block_until_ready(chained(x))
    t0 = time.perf_counter()
    jax.block_until_ready(chained(x))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt * 1e3:9.3f} ms/iter")


def main():
    n = 4096
    batch = 16
    cfg = RegistrationConfig()
    polar = jnp.asarray(cfg.polar_resolution, jnp.float32)
    print("device:", jax.devices()[0])

    src = jnp.asarray(np.stack([_synthetic_features(n, seed=i) for i in range(batch)]))
    mask = jnp.ones((batch, n), bool)
    cov_fn = jax.vmap(lambda x, m: estimate_cov6(x, m, k=20, method=cfg.regularization))
    cov = cov_fn(src, mask)
    jax.block_until_ready(cov)

    # 1. full build at two capacities
    for cap in (8192, 4096):
        def step(x, cap=cap):
            vm = jax.vmap(
                lambda xx, cc, mm: build_voxel_map(xx, cc, mm, cap, polar_res=polar)
            )(x, cov, mask)
            return x + vm.mean.sum() * 1e-12
        chain_time(f"build_voxel_map cap={cap}", step, src)

    # 2. pack+sort+unique only
    def sort_only(x):
        pack = jax.vmap(lambda xx: pack_polar(polar_coord(xx, polar)))(x)
        sp = jnp.sort(pack, axis=-1)
        return x + sp.sum() * 1e-12
    chain_time("pack+sort", sort_only, src)

    # 3. keyed_matmul only (fixed table)
    pack0 = jax.vmap(lambda xx: pack_polar(polar_coord(xx, polar)))(src)
    table = jnp.sort(pack0, axis=-1)
    data = jnp.concatenate([jnp.ones((batch, 1, n)), jnp.swapaxes(src, 1, 2), cov], axis=1)

    for cap in (8192, 4096):
        tb = table[:, :cap] if cap <= n else jnp.pad(table, ((0, 0), (0, cap - n)), constant_values=np.int32(0x7FFFFFFF))
        def km_only(x, tb=tb):
            out = jax.vmap(keyed_matmul)(data, pack0, tb)
            return x + out.sum() * 1e-12
        chain_time(f"keyed_matmul build [10,{n}]x[{cap}]", km_only, src)

    # 5. searchsorted-gather lookup variant vs keyed_matmul lookup
    def ss_lookup(x):
        q = jax.vmap(lambda xx: pack_polar(polar_coord(xx, polar)))(x)
        def one(tbl, dat, qq):
            idx = jnp.clip(jnp.searchsorted(tbl, qq), 0, tbl.shape[0] - 1)
            found = tbl[idx] == qq
            stats = jnp.take(dat, idx, axis=1)  # [10, N]
            return jnp.where(found[None, :], stats, 0.0)
        out = jax.vmap(one)(table, data, q)
        return x + out.sum() * 1e-12
    chain_time("searchsorted+gather lookup", ss_lookup, src)

    def km_lookup(x):
        q = jax.vmap(lambda xx: pack_polar(polar_coord(xx, polar)))(x)
        out = jax.vmap(keyed_matmul)(data, table, q)
        return x + out.sum() * 1e-12
    chain_time("keyed_matmul lookup", km_lookup, src)


if __name__ == "__main__":
    main()
