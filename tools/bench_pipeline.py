"""End-to-end pipeline benchmark: SlamSystem scans/s at the reference
cadences on realistic raycast scans.

Covers what bench.py (front-end registration only) does not: projection,
LOAM features, scan-to-submap GN (the backMapping.cpp:681-1068 hot path),
loop-closure and prior ticks, and the host<->device traffic of the real
driver loop. Reports steady-state scans/s (compile-heavy warmup excluded),
per-stage wall-clock ms, and an MFU estimate for the front-end registration
step from XLA's own flop count.

Usage (real TPU):
  python tools/bench_pipeline.py [--scans 80] [--warmup 20] [--out BENCH_PIPELINE.json]

The 10 Hz LiDAR design point (src/imageProjection.cpp:79) means
vs_baseline = scans_per_s / 10.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def registration_mfu(slam, peak_tflops: float):
    """XLA-reported flops of one jitted front-end scan_step divided by its
    measured wall time and the chip's peak. Conservative: XLA counts only
    the HLO it keeps after optimization."""
    import jax
    import jax.numpy as jnp

    from rolo_tpu.frontend import odometry

    cfg = slam.cfg
    st = slam.odom_state
    fn = jax.jit(
        lambda state, xyz, mask, dt: odometry.scan_step(
            state, xyz, mask, dt, cfg.registration,
            cfg.static.max_voxels, cfg.registration.k_correspondences,
        )
    )
    n = st.prev_xyz.shape[0]
    lowered = fn.lower(st, jnp.zeros((n, 3), jnp.float32), jnp.ones((n,), bool),
                       jnp.asarray(0.1, jnp.float32))
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    flops = float(cost.get("flops", 0.0))
    return flops


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans", type=int, default=80)
    ap.add_argument("--warmup", type=int, default=20)
    ap.add_argument("--cols", type=int, default=1024)
    ap.add_argument("--peak-tflops", type=float, default=197.0,
                    help="chip peak (v5e bf16 = 197); MFU is vs this")
    ap.add_argument("--no-loops", action="store_true")
    ap.add_argument("--no-priors", action="store_true")
    ap.add_argument("--out", default="BENCH_PIPELINE.json")
    args = ap.parse_args()

    import numpy as np

    from rolo_tpu.runtime.platform import enable_compilation_cache, pin_requested_platform

    pin_requested_platform()
    enable_compilation_cache()

    from rolo_tpu.config import LoopConfig, RoloConfig
    from rolo_tpu.runtime.slam import SlamSystem
    from rolo_tpu.sim import SimConfig, generate_sequence, ground_map_points
    from rolo_tpu.sim.dataset import make_scene

    cfg = RoloConfig()
    if args.no_loops:
        cfg = cfg.replace(loop=LoopConfig(enable=False))

    total = args.warmup + args.scans
    sim = SimConfig(n_scans=total, n_cols=args.cols, sensor="velodyne32",
                    period=24.0, roughness=1.0, seed=0)
    scene = make_scene(sim)

    print(f"generating {total} sim scans ...", file=sys.stderr)
    frames = list(generate_sequence(sim, scene))

    slam = SlamSystem(cfg)
    use_priors = cfg.prior.enable and not args.no_priors
    if use_priors:
        slam.set_ground_map(ground_map_points(sim, scene))

    gt = np.stack([f.gt_trans for f in frames])

    # warmup: trigger every cadence branch's compile
    for f in frames[: args.warmup]:
        slam.process_scan(f.points, f.stamp, ring=f.ring, rel_time=f.rel_time)
    slam.timers.reset()

    t0 = time.perf_counter()
    for f in frames[args.warmup:]:
        slam.process_scan(f.points, f.stamp, ring=f.ring, rel_time=f.rel_time)
    elapsed = time.perf_counter() - t0
    scans_per_s = args.scans / elapsed

    # accuracy sanity on the measured window (not a gate — just recorded)
    from rolo_tpu.runtime import metrics
    est = slam.front_positions_np()
    ate = metrics.ate(est, gt[: est.shape[0]])
    kt, kp, _ = slam.keyframe_trajectory()
    stamps = np.asarray([f.stamp for f in frames])
    ia, ib = metrics.associate_by_time(np.asarray(kt), stamps, max_diff=0.05)
    ate_kf = metrics.ate(kp[ia], gt[ib]) if len(ia) >= 3 else None

    stage = {k: round(v["mean_ms"], 3) for k, v in slam.timers.summary().items()}

    flops = registration_mfu(slam, args.peak_tflops)
    frontend_s = slam.timers.summary().get("frontend", {}).get("mean_ms", 0.0) / 1e3
    mfu = (flops / frontend_s / (args.peak_tflops * 1e12)) if frontend_s else 0.0

    out = {
        "metric": "pipeline_scans_per_s",
        "value": round(scans_per_s, 2),
        "unit": "scans/s/chip (end-to-end)",
        "vs_baseline": round(scans_per_s / 10.0, 2),
        "n_scans_measured": args.scans,
        "loops_enabled": bool(cfg.loop.enable),
        "priors_enabled": bool(use_priors),
        "stage_mean_ms": stage,
        "ate_frontend_rmse_m": round(ate.rmse, 4),
        "ate_keyframes_rmse_m": round(ate_kf.rmse, 4) if ate_kf else None,
        "frontend_flops_per_step": flops,
        "frontend_mfu_vs_peak": round(mfu, 5),
        "peak_tflops_assumed": args.peak_tflops,
        "drop_counts": slam.drop_counts,
    }
    print(json.dumps(out))
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
