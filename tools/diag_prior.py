"""Diagnose the ground-prior acceptance chain gate by gate.

Runs the full SlamSystem over a sim sequence, but at every prior tick ALSO
re-executes the prior chain un-fused, fetching each gate:
  tick -> fusion valid -> solver success -> record gates (count>10, 10 ms
  keyframe sync, synced_interval) -> association gates (eligible/near,
  ICP fitness, z/r/p diff).

Usage: JAX_PLATFORMS=cpu python tools/diag_prior.py [--scans 200]
"""

from __future__ import annotations

import argparse
import collections
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans", type=int, default=200)
    ap.add_argument("--cols", type=int, default=512)
    ap.add_argument("--period", type=float, default=24.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--roughness", type=float, default=1.0)
    args = ap.parse_args()

    from rolo_tpu.runtime.platform import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp
    import numpy as np

    from rolo_tpu.config import RoloConfig
    from rolo_tpu.filter import fusion
    from rolo_tpu.geometry import so3
    from rolo_tpu.mapping import backend
    from rolo_tpu.prior import association as prior_assoc
    from rolo_tpu.prior import ground as prior_ground
    from rolo_tpu.runtime.slam import SlamSystem
    from rolo_tpu.sim import SimConfig, generate_sequence, ground_map_points
    from rolo_tpu.sim.dataset import make_scene

    cfg = RoloConfig()
    sim = SimConfig(n_scans=args.scans, n_cols=args.cols, sensor="velodyne32",
                    period=args.period, seed=args.seed, roughness=args.roughness)
    scene = make_scene(sim)
    slam = SlamSystem(cfg)
    slam.set_ground_map(ground_map_points(sim, scene))

    stats = collections.Counter()
    tick_log = []

    orig_cycle = slam._prior_cycle_jit

    def traced_cycle(fusion_state, stamp, backend_state, ground_map, vehicle):
        stats["ticks"] += 1
        fut = fusion.predict_future(fusion_state, cfg.filter)
        fused = fusion.fused_pose(fusion_state, stamp, cfg.filter)
        valid = bool(fut.valid & fused.valid)
        row = {"t": float(stamp), "fusion_valid": valid}
        if valid:
            stats["fusion_valid"] += 1
            local_rot = so3.quat_to_matrix(fut.final_quat)
            world_pos = fused.rot @ fut.final_pos + fused.trans
            world_rot = fused.rot @ local_rot
            yaw = jnp.arctan2(world_rot[1, 0], world_rot[0, 0])
            obs = prior_assoc.compute_prior(
                ground_map, vehicle, world_pos[0], world_pos[1], yaw, cfg.prior, 2048)
            row["solver_success"] = bool(obs.success)
            if row["solver_success"]:
                stats["solver_success"] += 1
            else:
                from rolo_tpu.prior.vehicle import solve_pose
                res = solve_pose(ground_map, vehicle, world_pos[0], world_pos[1], yaw, cfg.prior)
                if not bool(res.converged) and not os.path.exists("/tmp/prior_fail.npz"):
                    np.savez("/tmp/prior_fail.npz",
                             gm_xyz=np.asarray(ground_map.xyz), gm_mask=np.asarray(ground_map.mask),
                             x=float(world_pos[0]), y=float(world_pos[1]), yaw=float(yaw))
                row["solver_conv"] = bool(res.converged)
                row["solver_z"] = round(float(res.z), 2)
                row["solver_rp"] = (round(float(res.roll), 3), round(float(res.pitch), 3))
                row["solver_wheel_max"] = round(float(jnp.max(jnp.abs(res.wheel_signed_distances))), 3)
                for gate, ok in (
                    ("fail_conv", res.converged),
                    ("fail_rp", (jnp.abs(res.roll) <= cfg.prior.tolerance_roll) & (jnp.abs(res.pitch) <= cfg.prior.tolerance_pitch)),
                    ("fail_wheel", jnp.all(jnp.abs(res.wheel_signed_distances) <= cfg.prior.tolerance_wheel_distance)),
                ):
                    if not bool(ok):
                        stats[gate] += 1
            # record gates
            db = backend_state.db
            cur = int(np.maximum(int(db.count) - 1, 0))
            row["db_count"] = int(db.count)
            row["gate_count10"] = int(db.count) > 10
            dt_kf = abs(float(stamp) - float(db.time[cur]))
            row["dt_keyframe_ms"] = round(dt_kf * 1e3, 2)
            row["gate_sync10ms"] = dt_kf < 1e-2
            row["gate_interval"] = (
                float(stamp) - float(backend_state.prior_queue.last_time)
                >= cfg.prior.synced_interval)
            if row["gate_count10"]:
                stats["gate_count10"] += 1
            if row["gate_sync10ms"]:
                stats["gate_sync10ms"] += 1
            if row["solver_success"] and row["gate_count10"] and row["gate_sync10ms"] and row["gate_interval"]:
                stats["recorded"] += 1
        # association gates on the REAL state (before this tick's record)
        q = backend_state.prior_queue
        db = backend_state.db
        cur = max(int(db.count) - 1, 0)
        qn = int(q.count)
        row["queue_count"] = qn
        if qn > 0 and int(db.count) > 0:
            cur_trans = np.asarray(db.trans[cur])
            idx_all = np.arange(q.capacity)
            linked_all = np.minimum(np.asarray(q.linked_key), db.capacity - 1)
            linked_rot = np.asarray(db.rot)[linked_all]
            linked_trans = np.asarray(db.trans)[linked_all]
            prior_xy = (np.einsum("pij,pj->pi", linked_rot, np.asarray(q.rel_trans))
                        + linked_trans)[:, :2]
            d2 = np.sum((prior_xy - cur_trans[:2]) ** 2, axis=-1)
            eligible = (np.asarray(q.valid) & (idx_all < qn)
                        & (np.asarray(q.linked_key) != cur)
                        & (d2 < cfg.prior.near_prior_radius ** 2))
            row["min_dist_m"] = round(float(np.sqrt(d2[np.asarray(q.valid) & (idx_all < qn)].min())), 3) if (np.asarray(q.valid) & (idx_all < qn)).any() else None
            row["n_eligible"] = int(eligible.sum())
            if eligible.any():
                stats["assoc_eligible"] += 1
                pick = int(np.argmin(np.where(eligible, d2, np.inf)))
                linked = int(linked_all[pick])
                patch = prior_ground.extract_patch(
                    ground_map, db.trans[cur][:2],
                    4.0 * cfg.prior.ground_patch_size, 4096)
                from rolo_tpu.pointcloud.cloud import PaddedCloud
                factor = prior_assoc.associate_prior(
                    q.rel_rot[pick], q.rel_trans[pick], q.linked_key[pick],
                    PaddedCloud(q.patch_xyz[pick], q.patch_mask[pick]),
                    jnp.asarray(True),
                    db.rot[linked], db.trans[linked],
                    jnp.asarray(cur, jnp.int32), db.rot[cur], db.trans[cur],
                    patch, cfg.prior, approx_knn=cfg.mapping.approx_knn)
                row["assoc_accepted"] = bool(factor.accepted)
                # re-run pieces for the sub-gates
                from rolo_tpu.geometry.se3 import SE3
                from rolo_tpu.loop.closure import icp_point2point
                icp = icp_point2point(
                    PaddedCloud(q.patch_xyz[pick], q.patch_mask[pick]), patch,
                    jnp.eye(3), jnp.zeros(3),
                    max_corr_dist=cfg.prior.ground_patch_size,
                    max_iterations=100, approx_knn=cfg.mapping.approx_knn)
                row["icp_converged"] = bool(icp.converged)
                row["icp_fitness"] = float(icp.fitness)
                if bool(factor.accepted):
                    stats["assoc_accepted"] += 1
        tick_log.append(row)
        return orig_cycle(fusion_state, stamp, backend_state, ground_map, vehicle)

    slam._prior_cycle_jit = traced_cycle

    import time
    t0 = time.perf_counter()
    n = 0
    for frame in generate_sequence(sim, scene):
        slam.process_scan(frame.points, frame.stamp, ring=frame.ring, rel_time=frame.rel_time)
        n += 1
        if n % 50 == 0:
            print(f"scan {n} ({time.perf_counter()-t0:.0f}s) stats={dict(stats)}", flush=True)

    print("\n=== per-tick log (last 40) ===")
    for row in tick_log[-40:]:
        print(row)
    print("\n=== totals ===")
    print(dict(stats))
    print("n_prior_factors (graph):", int(slam.backend_state.graph.priors.count))
    print("queue count:", int(slam.backend_state.prior_queue.count))
    print("n_keyframes:", int(slam.backend_state.db.count))


if __name__ == "__main__":
    main()
