"""Offline visualization exports — the headless stand-in for the
reference's RViz observability (config/rviz/rolo.rviz, the global-map /
path / loop-marker / factor-graph publishers, backMapping.cpp:1341-1454,
1667-1900, 2626-2677).

Everything renders to files (PNG via matplotlib when available, PLY always)
so runs on TPU pods produce inspectable artifacts without a display.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np


def write_ply(path: str, xyz: np.ndarray, color: Optional[np.ndarray] = None) -> None:
    """ASCII PLY point cloud (viewable in CloudCompare/MeshLab)."""
    xyz = np.asarray(xyz, np.float32).reshape(-1, 3)
    n = xyz.shape[0]
    has_c = color is not None
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {n}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if has_c:
            f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write("end_header\n")
        if has_c:
            c = np.asarray(color).reshape(-1, 3).astype(np.uint8)
            for p, rgb in zip(xyz, c):
                f.write(f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f} {rgb[0]} {rgb[1]} {rgb[2]}\n")
        else:
            for p in xyz:
                f.write(f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f}\n")


def plot_trajectory(
    path: str,
    trajectories: Sequence[Tuple[str, np.ndarray]],
    loops: Optional[Sequence[Tuple[np.ndarray, np.ndarray]]] = None,
    title: str = "trajectory",
) -> bool:
    """Top-down XY plot of one or more trajectories with optional loop
    constraint segments (the visualizeLoopClosure marker set,
    backMapping.cpp:2626-2677). Returns False when matplotlib is absent."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return False

    fig, ax = plt.subplots(figsize=(8, 8))
    for name, pos in trajectories:
        pos = np.asarray(pos).reshape(-1, 3)
        ax.plot(pos[:, 0], pos[:, 1], label=name, linewidth=1.2)
        if len(pos):
            ax.scatter([pos[0, 0]], [pos[0, 1]], marker="^", s=40)
    if loops:
        for a, b in loops:
            ax.plot([a[0], b[0]], [a[1], b[1]], "r--", linewidth=0.8, alpha=0.7)
    ax.set_aspect("equal")
    ax.grid(True, alpha=0.3)
    ax.legend()
    ax.set_title(title)
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return True


def export_run(slam, out_dir: str) -> None:
    """One-call artifact dump for a SlamSystem: trajectory plot, loop
    segments, and the global map as PLY (height-colored)."""
    os.makedirs(out_dir, exist_ok=True)
    st = slam.backend_state
    k = int(st.db.count)
    trajs = []
    if slam.front_positions:
        trajs.append(("front-end", np.asarray(slam.front_positions)))
    if k:
        trajs.append(("keyframes", np.asarray(st.db.trans[:k])))

    loops = []
    nl = int(st.graph.loops.count)
    for i in range(nl):
        a = np.asarray(st.db.trans[int(st.graph.loops.i[i])])
        b = np.asarray(st.db.trans[int(st.graph.loops.j[i])])
        loops.append((a, b))
    plot_trajectory(os.path.join(out_dir, "trajectory.png"), trajs, loops)

    clouds = []
    for i in range(k):
        rot = np.asarray(st.db.rot[i])
        trans = np.asarray(st.db.trans[i])
        pts = np.asarray(st.db.surf_xyz[i])[np.asarray(st.db.surf_mask[i])]
        clouds.append(pts @ rot.T + trans)
    if clouds:
        pts = np.concatenate(clouds)
        z = pts[:, 2]
        zr = (z - z.min()) / max(float(z.max() - z.min()), 1e-6)
        color = np.stack([255 * zr, 64 + 0 * zr, 255 * (1 - zr)], axis=-1)
        write_ply(os.path.join(out_dir, "global_map.ply"), pts, color)
