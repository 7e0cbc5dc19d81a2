"""Fused k-NN-neighborhood moments: one Pallas kernel per query block.

OPT-IN (ROLO_KNN_KERNEL=1) alternative to the XLA moment path of
estimate_cov6 (the per-point covariance pass of
RotVGICP::calculate_covariances,
/root/reference/include/rot_gicp/gicp/rot_vgicp_impl.hpp:419-496). The XLA
moment path materializes the [N, N] squared-distance matrix in HBM three
times over (matmul output, approx_min_k input, membership re-read); here
each distance tile lives only in VMEM:

  1. d2 tile [N, BQ] built ELEMENTWISE on the VPU (see _moments_kernel —
     the matmul form cancels catastrophically at lidar ranges),
  2. the k-th-neighbor radius per query by BISECTION in the radius
     domain (`iters` fixed compare+count sweeps; resolution
     hi0 / 2^iters ~ 0.2-0.5 mm at lidar ranges, below point spacing,
     and unlike lax.approx_min_k's 0.95 recall it never misses the true
     k-th neighbor),
  3. neighborhood moments as one [16, N] x [N, BQ] MXU matmul of the
     moment table against the 0/1 membership mask (exact in bf16; the
     f32 table rides as an exact 3-way bf16 split done IN-KERNEL).

Status (round 5, v5e): oracle-accurate (tests/test_knn_moments.py) and
standalone-competitive with the XLA path (0.49 vs 0.46 ms per 16x8192
batch, k=20), but measured ~35% slower END-TO-END in the registration
program — the pallas_call is a fusion/scheduling barrier for XLA. The
XLA moment path is therefore the production default; this kernel is kept
as the VMEM-resident variant for workloads where the [N, N] HBM traffic
dominates (very large N with few queries) and as the reference bisection
selector.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Squared penalty distance for invalid candidate rows (entered as a 4th
# coordinate sqrt(_PENALTY), see _moments_kernel). Large enough that no
# real squared distance (< ~1.5e4 m^2 at lidar ranges) ever reaches it;
# kept finite so d2 stays NaN-free, and above the 1e30 cutoff the
# row-max upper bound filters on (so invalid candidates are excluded
# from membership even for starved queries).
_PENALTY = 1e32


def _split3(v):
    """Exact-to-f32 three-way bf16 split: v ~= hi + mid + lo.

    MUST run inside the Pallas kernel: Mosaic lowers the converts
    literally, whereas jitted XLA's excess-precision pass (on by default
    on TPU) elides f32->bf16->f32 round-trips, which collapses mid/lo to
    zero and silently downgrades the table to a single bf16 pass. That
    elision WAS the round-4 accuracy regression's second half: moment
    tables quantized to bf16 shifted neighborhood means by ~3 cm."""
    hi = v.astype(jnp.bfloat16)
    r1 = v - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _moments_kernel(k, iters, qt_ref, cand_ref, xc_ref, out_ref):
    # qt [4, BQ] f32 queries (4th row zero); cand [4, N] f32 candidates,
    # 4th row 0 for valid / sqrt(_PENALTY) for invalid — its square folds
    # the invalid-candidate penalty into |c|^2 with no extra operand (a
    # [N, 1] penalty input would pad its lane dim 1 -> 128 in VMEM);
    # xc [16, N] f32 moment planes (split to bf16 x3 in-kernel);
    # out [16, BQ].
    qt = qt_ref[:]
    cand = cand_ref[:]
    # [N, BQ] squared distances, ELEMENTWISE on the VPU — not the
    # |c|^2 - 2 c.q + |q|^2 matmul form. At lidar ranges the matmul form
    # catastrophically cancels (|c|^2 ~ 3.6e3 vs neighbor gaps ~1e-2;
    # f32 round-off ~4e-4, and the in-kernel MXU product is bf16-passed
    # regardless of the requested precision), which scrambled membership:
    # measured mu errors up to 0.43 m vs the exact selector, the round-4
    # bench regression (0.011 -> 0.052 m median translation error). The
    # difference form subtracts nearby coordinates FIRST, so round-off is
    # relative to the gap itself and neighbor ordering is f64-exact in
    # practice. Cost: 4 fused multiply-subtract sweeps over the tile,
    # cheaper than one bisection iteration pair.
    d2 = jnp.zeros((cand.shape[1], qt.shape[1]), jnp.float32)
    for c in range(4):
        diff = cand[c][:, None] - qt[c][None, :]
        d2 = d2 + diff * diff

    kf = jnp.float32(k)

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum((d2 <= mid * mid).astype(jnp.float32), axis=0,
                      keepdims=True)  # [1, BQ]
        small = cnt < kf
        return jnp.where(small, mid, lo), jnp.where(small, hi, mid)

    bq = d2.shape[1]
    lo0 = jnp.zeros((1, bq), jnp.float32)
    # data-derived upper bound: the per-query max over VALID candidates.
    # Starting from a fixed huge value would waste the whole iteration
    # budget just getting down to lidar scale (1e15 / 2^22 is ~2e8 m).
    rmax = jnp.max(jnp.where(d2 < jnp.float32(1e30), d2, 0.0), axis=0,
                   keepdims=True)
    hi0 = jnp.sqrt(rmax) + 1.0
    _, hi = jax.lax.fori_loop(0, iters, body, (lo0, hi0))

    w = (d2 <= hi * hi).astype(jnp.bfloat16)  # [N, BQ] 0/1, exact in bf16
    x_hi, x_mid, x_lo = _split3(xc_ref[:])

    def dotw(x):
        return jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )

    out_ref[:] = dotw(x_hi) + dotw(x_mid) + dotw(x_lo)


@functools.partial(jax.jit, static_argnames=("k", "iters", "block_q", "interpret"))
def knn_moments(
    xyz: jnp.ndarray,
    mask: jnp.ndarray,
    cand_xyz: jnp.ndarray,
    cand_mask: jnp.ndarray,
    xc: jnp.ndarray,
    k: int,
    iters: int = 18,
    block_q: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-query k-NN-neighborhood sums of the candidate moment table.

    xyz [Q, 3] queries (masked query slots MUST be zeroed by the caller —
    the `mask` argument only zeroes the returned columns, it does not
    sanitize NaN inputs); cand_xyz [N, 3] candidates (masked slots MUST
    be zeroed, see estimate_cov6); xc [16, N] per-candidate moment planes
    (zeroed invalid columns; rows beyond 10 are padding). Returns
    [16, Q] f32 SoA: out[:, q] = sum of xc[:, j] over the k nearest
    candidates j (ties at the k-th radius all included — same semantics
    as the d2 <= r_k membership of the XLA path).

    Membership radius comes from `iters` bisection steps starting at
    hi0 = sqrt(max_j d2[q, j]) + 1, so its resolution is hi0 / 2^iters —
    ~0.2-0.5 mm at outdoor-lidar ranges (hi0 ~ 60-120 m) with the default
    iters=18, below typical point spacing; points in that slack band
    beyond the true k-th radius are included (the max observed over-count
    is +1-2 ties).
    """
    q = xyz.shape[0]
    n = cand_xyz.shape[0]
    pad = (-q) % block_q
    if pad:
        xyz = jnp.pad(xyz, ((0, pad), (0, 0)))
    qp = xyz.shape[0]
    qt = jnp.pad(xyz.T, ((0, 1), (0, 0)))  # [4, Q'], 4th row zero
    cand_t = jnp.concatenate(
        [cand_xyz.T,
         jnp.where(cand_mask, 0.0, _PENALTY ** 0.5)[None, :]], axis=0
    )  # [4, N]
    # The moment table enters the kernel as plain f32; the exact 3-way
    # bf16 split happens INSIDE the kernel (see _split3 — XLA's
    # excess-precision pass would elide an outside split).

    out = pl.pallas_call(
        functools.partial(_moments_kernel, k, iters),
        grid=(qp // block_q,),
        in_specs=[
            pl.BlockSpec((4, block_q), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((16, block_q), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, qp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * qp * n * (3 + iters + 3 * 16),
            bytes_accessed=(qp * 3 + n * 3 + n + 16 * n + qp * 16) * 4,
            transcendentals=0,
        ),
        # interpret=True runs the kernel logic on CPU (tests/CI parity
        # against the exact selector without TPU hardware)
        interpret=interpret,
    )(qt, cand_t, xc)
    # zero masked query columns: downstream divides by max(count, 1) and
    # re-masks, but garbage columns from padded/invalid queries must not
    # propagate NaNs/Infs through that path
    return out[:, :q] * mask[None, :]
