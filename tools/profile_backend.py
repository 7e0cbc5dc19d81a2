"""Component-level timing of the back-end mapping hot path on the live
device: submap extraction, scan2map bind/eval, voxel downsample, graph
solve, scan-context descriptor, and the full backend_step — so the
<100 ms/step optimization effort lands on the actual bottleneck
(VERDICT round-2 item 1). Not part of the test suite."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from rolo_tpu.runtime.platform import enable_compilation_cache, pin_requested_platform

pin_requested_platform()
enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from rolo_tpu.config import RoloConfig
from rolo_tpu.mapping import backend
from rolo_tpu.mapping.keyframes import add_keyframe, extract_submap
from rolo_tpu.mapping.scan2map import scan2map_optimize
from rolo_tpu.pointcloud.cloud import PaddedCloud
from rolo_tpu.pointcloud.features import voxel_downsample
from rolo_tpu.geometry.se3 import SE3
from rolo_tpu.loop import scancontext as sc
from rolo_tpu.graph.solver import solve_pose_graph


def timeit(name, fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt * 1e3:9.2f} ms")
    return out


def make_cloud(n, cap, seed, spread=30.0):
    rng = np.random.default_rng(seed)
    xyz = np.zeros((cap, 3), np.float32)
    xyz[:n] = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    mask = np.zeros((cap,), bool)
    mask[:n] = True
    return PaddedCloud(jnp.asarray(xyz), jnp.asarray(mask))


def main():
    cfg = RoloConfig()
    st = cfg.static
    m = cfg.mapping
    print("device:", jax.devices()[0])

    # populate a backend state with ~80 keyframes along a line
    state = backend.init_backend(cfg)
    db = state.db
    n_kf = 80
    add_fn = jax.jit(add_keyframe)
    for i in range(n_kf):
        c = make_cloud(2000, st.max_corner_points, seed=i)
        s = make_cloud(8000, st.max_surf_points, seed=100 + i)
        pose = SE3(jnp.eye(3), jnp.asarray([0.6 * i, 0.0, 0.0], jnp.float32))
        db = add_fn(db, pose, jnp.asarray(0.15 * i, jnp.float32), c, s)
    db = jax.block_until_ready(db)
    state = state._replace(db=db, rpy=jnp.zeros(3), xyz=jnp.asarray([0.6 * n_kf, 0.0, 0.0], jnp.float32))

    corner = make_cloud(2000, st.max_corner_points, seed=999)
    surf = make_cloud(8000, st.max_surf_points, seed=998)
    query_t = jnp.asarray([0.6 * n_kf, 0.0, 0.0], jnp.float32)
    query_time = jnp.asarray(0.15 * n_kf, jnp.float32)

    # 0) dispatch round-trip latency
    nop = jax.jit(lambda x: x + 1.0)
    timeit("nop dispatch roundtrip", nop, jnp.zeros(()), iters=20)

    # 1) voxel downsample of current scan
    vd = jax.jit(lambda c: voxel_downsample(c, m.mapping_surf_leaf_size, st.max_surf_points))
    timeit("voxel_downsample surf [12k cap]", vd, surf)

    # 2) submap extraction
    ext = jax.jit(lambda db, t, tt: extract_submap(
        db, t, tt, m.surrounding_keyframe_search_radius, m.surrounding_keyframe_recency_sec,
        max_nearby=m.surrounding_keyframe_max_nearby,
        corner_out_cap=st.max_submap_points, surf_out_cap=st.max_submap_points,
        corner_leaf=m.mapping_corner_leaf_size, surf_leaf=m.mapping_surf_leaf_size))
    sub_c, sub_s = timeit("extract_submap [64 kf -> 2x65536]", ext, db, query_t, query_time)

    # 3) scan2map at defaults
    s2m = jax.jit(lambda rpy, xyz, sc_, ss_: scan2map_optimize(
        rpy, xyz, corner.xyz, corner.mask, surf.xyz, surf.mask, sc_, ss_,
        max_iterations=m.scan2map_max_iterations,
        degeneracy_threshold=m.degeneracy_eigen_threshold, chunk=st.knn_query_chunk,
        rebind_every=m.scan2map_rebind_every, approx_knn=m.approx_knn,
        n_candidates=m.scan2map_candidates))
    timeit("scan2map_optimize (defaults)", s2m, jnp.zeros(3), query_t, sub_c, sub_s)

    # 4) scan-context descriptor
    scd = jax.jit(lambda c: sc.make_descriptor(
        c.xyz, c.mask, cfg.loop.sc_num_ring, cfg.loop.sc_num_sector,
        cfg.loop.sc_max_radius, cfg.loop.sc_lidar_height))
    timeit("sc.make_descriptor", scd, surf)

    # 5) graph solve at this size
    solve = jax.jit(lambda g, r, t, c: solve_pose_graph(g, r, t, c))
    timeit("solve_pose_graph [80 kf]", solve, state.graph, db.rot, db.trans, db.count)

    # 6) full backend_step
    bstep = jax.jit(lambda s, c, su, scc, fr, ft: backend.backend_step(
        s, c, su, scc, fr, ft, jnp.asarray(True), query_time, cfg)[1].trans)
    timeit("backend_step (full)", bstep, state, corner, surf, surf,
           jnp.eye(3), query_t)

    # 7) loop closure step
    lstep = jax.jit(lambda s: backend.loop_closure_step(s, cfg)[0].pending_solve)
    timeit("loop_closure_step", lstep, state)

    # 8) differential rows: where does backend_step's residual time go?
    raw_cloud = make_cloud(30000, 32768, seed=997)  # pipeline-size sc input
    timeit("sc.make_descriptor [32768 raw]", scd, raw_cloud)
    timeit("backend_step (sc_cloud=raw 32768)", bstep, state, corner, surf,
           raw_cloud, jnp.eye(3), query_t)
    fresh = backend.init_backend(cfg)
    timeit("backend_step (count=0: no scan2map)", bstep, fresh, corner, surf,
           surf, jnp.eye(3), query_t)

    # masked keyframe write-back (the add/where over the full-capacity DB)
    def add_and_where(s, c, su):
        pose = SE3(jnp.eye(3), query_t)
        newdb = add_keyframe(s.db, pose, query_time, c, su)
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(True, b, a), s.db, newdb
        ).count
    timeit("add_keyframe + tree where [full DB]", jax.jit(add_and_where), state, corner, surf)


if __name__ == "__main__":
    main()
