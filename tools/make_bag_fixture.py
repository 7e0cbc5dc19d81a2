"""Synthesize the checked-in recorded-data fixture (VERDICT r4 item 8).

The closest feasible stand-in for M2UD/RELLIS parity in a ROS-less
environment: a raycast-simulated sequence serialized as a REAL rosbag v2
(uncompressed chunk, Velodyne-layout PointCloud2 with ring + per-point
time) plus its exact TUM ground truth. The committed fixture drives the
native BagReader (cpp/rolo_host.cpp) -> SlamSystem path end-to-end in
tests/test_cpp_host.py and docs/README "recorded data" recipe.

Regenerate (deterministic, seed-pinned):
    python tools/make_bag_fixture.py [--out tests/fixtures/sim_bag]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="tests/fixtures/sim_bag")
    ap.add_argument("--scans", type=int, default=12)
    ap.add_argument("--cols", type=int, default=384)
    args = ap.parse_args()

    from rolo_tpu.geometry import so3 as _so3  # noqa: F401 (import check)
    from rolo_tpu.runtime import io as rio
    from rolo_tpu.runtime.bagwriter import write_bag
    from rolo_tpu.sim import SimConfig, generate_sequence

    import jax.numpy as jnp

    from rolo_tpu.geometry import so3

    sim = SimConfig(n_scans=args.scans, n_cols=args.cols, sensor="velodyne16",
                    period=60.0, seed=7, noise_std=0.015, dropout=0.03)
    os.makedirs(args.out, exist_ok=True)

    frames = list(generate_sequence(sim))

    def scan_iter():
        for f in frames:
            yield (f.stamp, f.points, None, f.ring, f.rel_time)

    n = write_bag(os.path.join(args.out, "seq.bag"), scan_iter())

    quats = np.stack([
        np.asarray(so3.matrix_to_quat(jnp.asarray(f.gt_rot))) for f in frames
    ])
    rio.write_tum(
        os.path.join(args.out, "gt_tum.txt"),
        [f.stamp for f in frames],
        np.stack([f.gt_trans for f in frames]),
        quats,
    )
    size = os.path.getsize(os.path.join(args.out, "seq.bag"))
    print(f"wrote {n} scans ({size / 1e6:.2f} MB) + gt_tum.txt to {args.out}")


if __name__ == "__main__":
    main()
