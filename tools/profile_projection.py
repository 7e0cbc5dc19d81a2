"""Per-op timing of the ingest->projection->feature-extraction path at
pipeline shapes on the live device (amortized over iters to hide tunnel
latency). Companion to profile_frontend.py / profile_backend.py.

Usage (TPU): python tools/profile_projection.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rolo_tpu.runtime.platform import enable_compilation_cache, pin_requested_platform

pin_requested_platform()
enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from rolo_tpu.config import RoloConfig
from rolo_tpu.pointcloud import features as feats
from rolo_tpu.pointcloud.cloud import concat_clouds
from rolo_tpu.pointcloud.projection import RawScan, project_scan
from rolo_tpu.sim import SimConfig, generate_sequence
from rolo_tpu.sim.dataset import make_scene


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt * 1e3:9.2f} ms", flush=True)
    return out


def main():
    cfg = RoloConfig()
    st = cfg.static
    sc = cfg.sensor
    print("device:", jax.devices()[0])

    # one realistic sim scan (velodyne32 x 1024)
    sim = SimConfig(n_scans=1, n_cols=1024, sensor="velodyne32", seed=0)
    frame = next(iter(generate_sequence(sim, make_scene(sim))))
    cap = st.max_raw_points
    n = min(len(frame.points), cap)
    xyz = np.zeros((cap, 3), np.float32); xyz[:n] = frame.points[:n, :3]
    ring = np.zeros((cap,), np.int32); ring[:n] = frame.ring[:n]
    rel = np.zeros((cap,), np.float32); rel[:n] = frame.rel_time[:n]
    mask = np.zeros((cap,), bool); mask[:n] = True
    scan = RawScan(jnp.asarray(xyz), jnp.asarray(ring), jnp.asarray(rel), jnp.asarray(mask))

    proj = jax.jit(lambda s: project_scan(
        s, sc.n_scan, sc.horizon_scan, sc.lidar_min_range, sc.lidar_max_range,
        sc.downsample_rate))
    ring_img = timeit("project_scan", proj, scan)

    ext = jax.jit(lambda r: feats.extract_features(
        r, cfg.features.edge_threshold, cfg.features.surf_threshold,
        cfg.features.odometry_surf_leaf_size,
        st.max_corner_points, st.max_surf_points))
    fc = timeit("extract_features", ext, ring_img)

    cc = jax.jit(lambda c, s: concat_clouds(c, s, st.max_feature_points))
    timeit("concat_clouds", cc, fc.corners, fc.surfaces)

    both = jax.jit(lambda s: ext(proj(s)))
    timeit("project+extract fused", both, scan)

    # sub-ops of extract_features
    from rolo_tpu.pointcloud import features as F
    names = [n for n in dir(F) if not n.startswith("__")]
    print("feature module fns:", [n for n in names if callable(getattr(F, n))][:20])


if __name__ == "__main__":
    main()
