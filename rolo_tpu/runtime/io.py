"""Host-side IO: PCD read/write, KITTI velodyne .bin, TUM trajectory and
g2o pose-graph export.

Re-design of the reference's end-of-run exporters
(/root/reference/src/backMapping.cpp): saveTUM (:2679-2699), the g2o writer
(writeG2OVertex/writeG2OEdge :1480-1498) and saveGlobalPCDs (:1500-1608),
plus the PCL-based cloud ingest the nodes get from ROS. Pure numpy here —
device arrays never touch this layer except at ingest/egress
(SURVEY.md section 5: host<->device transfer only at the boundaries).
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# PCD
# ---------------------------------------------------------------------------

_PCD_DTYPES = {("F", 4): "f4", ("F", 8): "f8", ("I", 1): "i1", ("I", 2): "i2",
               ("I", 4): "i4", ("U", 1): "u1", ("U", 2): "u2", ("U", 4): "u4"}


def read_pcd(path: str) -> Dict[str, np.ndarray]:
    """Read an ascii or binary PCD file into named field arrays.

    Supports the fields the reference's point types use (utility.h:68-95:
    x y z intensity ring time / t). Returns {field: [N] array}.
    """
    with open(path, "rb") as f:
        header = {}
        while True:
            line = f.readline().decode("ascii", errors="replace").strip()
            if not line or line.startswith("#"):
                continue
            key, _, rest = line.partition(" ")
            header[key.upper()] = rest.split()
            if key.upper() == "DATA":
                break
        fields = header["FIELDS"]
        sizes = [int(s) for s in header["SIZE"]]
        types = header["TYPE"]
        counts = [int(c) for c in header.get("COUNT", ["1"] * len(fields))]
        n = int(header["POINTS"][0])
        mode = header["DATA"][0].lower()

        np_fields = []
        for name, size, typ, cnt in zip(fields, sizes, types, counts):
            base = _PCD_DTYPES[(typ, size)]
            if cnt == 1:
                np_fields.append((name, base))
            else:
                np_fields.append((name, base, (cnt,)))
        dtype = np.dtype(np_fields)

        if mode == "ascii":
            body = np.loadtxt(f, dtype=np.float64, ndmin=2)
            out = {}
            col = 0
            for name, size, typ, cnt in zip(fields, sizes, types, counts):
                base = _PCD_DTYPES[(typ, size)]
                out[name] = body[:, col:col + cnt].astype(base).squeeze(-1) if cnt == 1 else body[:, col:col + cnt].astype(base)
                col += cnt
            return out
        if mode == "binary":
            raw = np.frombuffer(f.read(n * dtype.itemsize), dtype=dtype, count=n)
            return {name: np.ascontiguousarray(raw[name]) for name in dtype.names}
        raise ValueError(f"unsupported PCD DATA mode: {mode} (binary_compressed not supported)")


def write_pcd(path: str, xyz: np.ndarray, intensity: Optional[np.ndarray] = None, binary: bool = True) -> None:
    """Write [N, 3] points (+ optional intensity) as PCD (pcl::io::savePCDFile
    analog used by saveGlobalPCDs, backMapping.cpp:1543-1557)."""
    xyz = np.asarray(xyz, np.float32).reshape(-1, 3)
    n = xyz.shape[0]
    fields = "x y z" + (" intensity" if intensity is not None else "")
    nf = 4 if intensity is not None else 3
    header = (
        "# .PCD v0.7 - Point Cloud Data file format\n"
        "VERSION 0.7\n"
        f"FIELDS {fields}\n"
        f"SIZE {' '.join(['4'] * nf)}\n"
        f"TYPE {' '.join(['F'] * nf)}\n"
        f"COUNT {' '.join(['1'] * nf)}\n"
        f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS {n}\n"
        f"DATA {'binary' if binary else 'ascii'}\n"
    )
    data = xyz if intensity is None else np.column_stack([xyz, np.asarray(intensity, np.float32)])
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        if binary:
            f.write(np.ascontiguousarray(data, np.float32).tobytes())
        else:
            np.savetxt(f, data, fmt="%.6f")


def read_kitti_bin(path: str) -> np.ndarray:
    """KITTI velodyne scan: [N, 4] (x, y, z, intensity) float32."""
    return np.fromfile(path, dtype=np.float32).reshape(-1, 4)


# ---------------------------------------------------------------------------
# Trajectories
# ---------------------------------------------------------------------------

def write_tum(
    path: str,
    times: Sequence[float],
    positions: np.ndarray,
    quats_wxyz: np.ndarray,
) -> None:
    """TUM format `t x y z qx qy qz qw` (saveTUM, backMapping.cpp:2679-2699)."""
    positions = np.asarray(positions).reshape(-1, 3)
    q = np.asarray(quats_wxyz).reshape(-1, 4)
    with open(path, "w") as f:
        for t, p, (w, x, y, z) in zip(times, positions, q):
            f.write(f"{t:.6f} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} {x:.6f} {y:.6f} {z:.6f} {w:.6f}\n")


def read_tum(path: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (times [N], positions [N,3], quats_wxyz [N,4])."""
    rows = np.loadtxt(path, ndmin=2)
    t = rows[:, 0]
    pos = rows[:, 1:4]
    qxyzw = rows[:, 4:8]
    quat = np.column_stack([qxyzw[:, 3], qxyzw[:, 0], qxyzw[:, 1], qxyzw[:, 2]])
    return t, pos, quat


def write_g2o(
    path: str,
    positions: np.ndarray,
    quats_wxyz: np.ndarray,
    odom_edges: Sequence[Tuple[int, int, np.ndarray, np.ndarray]],
    loop_edges: Sequence[Tuple[int, int, np.ndarray, np.ndarray]] = (),
    prior_edges: Sequence[Tuple[int, int, np.ndarray, np.ndarray]] = (),
) -> None:
    """g2o export (writeG2OVertex/writeG2OEdge, backMapping.cpp:1480-1498,
    invocation :1559-1605): VERTEX_SE3:QUAT lines then EDGE_SE3:QUAT with
    identity information (the reference writes no information matrix
    weighting — identity upper triangle).

    Edges are (i, j, rel_pos [3], rel_quat_wxyz [4]).
    """
    positions = np.asarray(positions).reshape(-1, 3)
    q = np.asarray(quats_wxyz).reshape(-1, 4)
    info = " ".join(["1 0 0 0 0 0", "1 0 0 0 0", "1 0 0 0", "1 0 0", "1 0", "1"])
    with open(path, "w") as f:
        for i, (p, (w, x, y, z)) in enumerate(zip(positions, q)):
            f.write(f"VERTEX_SE3:QUAT {i} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} {x:.6f} {y:.6f} {z:.6f} {w:.6f}\n")
        for edges in (odom_edges, loop_edges, prior_edges):
            for i, j, rp, rq in edges:
                w, x, y, z = rq
                f.write(
                    f"EDGE_SE3:QUAT {i} {j} {rp[0]:.6f} {rp[1]:.6f} {rp[2]:.6f} "
                    f"{x:.6f} {y:.6f} {z:.6f} {w:.6f} {info}\n"
                )


# ---------------------------------------------------------------------------
# Checkpointing (keyframe DB + graph state as the resume unit,
# SURVEY.md section 5 "checkpoint/resume")
# ---------------------------------------------------------------------------

def save_checkpoint(path: str, pytree, host_meta: np.ndarray = None) -> None:
    """Serialize any NamedTuple/array pytree to one .npz file. `host_meta`
    (optional f64 array) rides alongside WITHOUT passing through device
    dtypes — UNIX-epoch stamps need f64, which jax_enable_x64=0 would
    silently truncate to ~128 s resolution."""
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(pytree)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    if host_meta is not None:
        arrays["host_meta"] = np.asarray(host_meta, np.float64)
    np.savez_compressed(path, treedef=repr(treedef), **arrays)


def load_checkpoint(path: str, example_pytree, with_host_meta: bool = False):
    """Restore a pytree saved by save_checkpoint into the structure of
    `example_pytree` (shapes/dtypes must match). With `with_host_meta`,
    returns (pytree, host_meta_f64_or_None)."""
    import jax
    import jax.numpy as jnp

    data = np.load(path, allow_pickle=False)
    leaves, treedef = jax.tree_util.tree_flatten(example_pytree)
    restored = [jnp.asarray(data[f"leaf_{i}"]) for i in range(len(leaves))]
    tree = jax.tree_util.tree_unflatten(treedef, restored)
    if with_host_meta:
        meta = data["host_meta"] if "host_meta" in data.files else None
        return tree, meta
    return tree
