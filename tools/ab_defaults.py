"""Speed-deviation defaults grid (VERDICT round-3 item 3d): the committed
evidence for the TPU knobs that deviate from reference semantics —
approx_knn (exact in the reference), scan2map_rebind_every (reference
rebinds every iteration), scan2map_candidates, scan2map_max_iterations
(reference runs 30).

Each variant changes ONE knob from the shipped defaults and runs the full
SlamSystem over the same sim sequence; the grid reports keyframe ATE and
end-to-end throughput. Writes AB_DEFAULTS.json.

Usage (TPU): python tools/ab_defaults.py [--scans 200]
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
    ap.add_argument("--scans", type=int, default=200)
    ap.add_argument("--cols", type=int, default=1024)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="AB_DEFAULTS.json")
    args = ap.parse_args()

    from rolo_tpu.runtime.platform import (
        bench_metadata,
        enable_compilation_cache,
        pin_requested_platform,
    )

    pin_requested_platform()
    enable_compilation_cache()

    from rolo_tpu.config import RoloConfig
    from rolo_tpu.runtime.dataset import run_simulated
    from rolo_tpu.sim import SimConfig

    sim = SimConfig(n_scans=args.scans, n_cols=args.cols, sensor="velodyne32",
                    period=24.0, seed=args.seed)
    base = RoloConfig()

    def with_mapping(**kw):
        return base.replace(mapping=dataclasses.replace(base.mapping, **kw))

    variants = {
        "default (approx=T rebind=5 cand=0 iters=16)": base,
        "exact_knn": with_mapping(approx_knn=False),
        "rebind_every_1 (reference semantics)": with_mapping(scan2map_rebind_every=1),
        "rebind_every_10": with_mapping(scan2map_rebind_every=10),
        "candidates_64": with_mapping(scan2map_candidates=64),
        "iters_30 (reference count)": with_mapping(scan2map_max_iterations=30),
    }

    results = {}
    for name, cfg in variants.items():
        t0 = time.perf_counter()
        res = run_simulated(cfg, sim, with_priors=True, progress_every=0)
        row = res.to_json()
        row["variant_wall_s"] = round(time.perf_counter() - t0, 1)
        results[name] = row
        print(f"[{name}] " + json.dumps(
            {k: row.get(k) for k in ("ate_keyframes_rmse_m", "ate_frontend_rmse_m",
                                     "scans_per_s", "n_keyframes", "variant_wall_s")}
        ), flush=True)

    out = {"sim": dataclasses.asdict(sim), "machine": bench_metadata(), "results": results}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
