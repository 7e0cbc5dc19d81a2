"""A/B accuracy studies on simulated sequences: quantify what each
subsystem buys (the evidence VERDICT-style reviews ask for instead of
"documented but unproven" deviations).

Variants (vs a shared baseline run):
  - deskew on/off          (imageProjection deskew path, weak item 8)
  - loop closure on/off    (SC+RS factor convention, weak item 6)
  - priors on/off          (ground-contact factors)

Each variant runs the FULL SlamSystem over the same raycast sequence (real
motion distortion, uneven terrain, one loop revisit) and reports frontend +
keyframe ATE. Writes AB_STUDY.json.

Usage (TPU): python tools/ab_study.py [--scans 300] [--cols 1024]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans", type=int, default=300)
    ap.add_argument("--cols", type=int, default=1024)
    ap.add_argument("--period", type=float, default=24.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--roughness", type=float, default=1.0)
    ap.add_argument("--noise-std", type=float, default=0.02)
    ap.add_argument("--dropout", type=float, default=0.05)
    ap.add_argument("--boxes", type=int, default=14)
    ap.add_argument("--cyls", type=int, default=24)
    ap.add_argument("--variants", default="baseline,no_deskew,no_loops,no_priors")
    ap.add_argument("--out", default="AB_STUDY.json")
    args = ap.parse_args()

    from rolo_tpu.runtime.platform import (
        bench_metadata,
        enable_compilation_cache,
        pin_requested_platform,
    )

    pin_requested_platform()
    enable_compilation_cache()

    from rolo_tpu.config import LoopConfig, PriorConfig, RoloConfig
    from rolo_tpu.runtime.dataset import run_simulated
    from rolo_tpu.sim import SimConfig

    sim = SimConfig(n_scans=args.scans, n_cols=args.cols, sensor="velodyne32",
                    period=args.period, seed=args.seed, roughness=args.roughness,
                    noise_std=args.noise_std, dropout=args.dropout,
                    n_boxes=args.boxes, n_cyls=args.cyls)
    base = RoloConfig()

    def variant_cfg(name):
        if name == "baseline":
            return base, True
        if name == "deskew":
            return base.replace(
                sensor=dataclasses.replace(base.sensor, deskew_enabled=True)
            ), True
        if name == "no_deskew":
            return base.replace(
                sensor=dataclasses.replace(base.sensor, deskew_enabled=False)
            ), True
        if name == "no_loops":
            return base.replace(loop=dataclasses.replace(base.loop, enable=False)), True
        if name == "no_priors":
            return base, False
        if name == "no_loops_no_priors":
            # control for the prior-value question: z/roll/pitch drift is
            # only correctable by priors when loops aren't already pinning
            # it (short looped runs sit at mm-level z error with loops on)
            return base.replace(loop=dataclasses.replace(base.loop, enable=False)), False
        raise ValueError(name)

    results = {}
    for name in args.variants.split(","):
        cfg, with_priors = variant_cfg(name)
        t0 = time.perf_counter()
        res = run_simulated(cfg, sim, with_priors=with_priors, progress_every=50)
        row = res.to_json()
        row["variant_wall_s"] = round(time.perf_counter() - t0, 1)
        results[name] = row
        print(f"[{name}] " + json.dumps(row))

    out = {"sim": dataclasses.asdict(sim), "machine": bench_metadata(), "results": results}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
