"""Range-image projection + motion deskew.

TPU-native re-design of ImageProjection
(/root/reference/src/imageProjection.cpp:158-512). The reference loops over
points filling a cv::Mat and a compacted list; here the whole scan becomes a
dense [n_scan, horizon] image via vectorized scatter, and the "extracted
cloud with ring start/end indices" becomes per-ring compacted arrays
(RingImage) that feature extraction consumes directly.

First-return semantics (imageProjection.cpp:451: a filled pixel is never
overwritten) are reproduced exactly with a scatter-min over original point
indices.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax.numpy as jnp

from ..geometry import so3


class RawScan(NamedTuple):
    """Host-ingested raw scan, padded to a fixed capacity.

    xyz [N, 3]; ring [N] int32; rel_time [N] f32 (seconds since scan start);
    mask [N] bool.
    """

    xyz: jnp.ndarray
    ring: jnp.ndarray
    rel_time: jnp.ndarray
    mask: jnp.ndarray


class RingImage(NamedTuple):
    """Per-ring compacted scan: the TPU analog of CloudInfoStamp's
    (extracted cloud, startRingIndex, endRingIndex, pointColInd, pointRange).

    All arrays are [n_scan, horizon]; for each ring, valid points are packed
    to the front in column order. count[r] = number of valid points in ring r.
    """

    xyz: jnp.ndarray  # [R, H, 3]
    rng: jnp.ndarray  # [R, H] range (m)
    col: jnp.ndarray  # [R, H] original column index
    mask: jnp.ndarray  # [R, H]
    count: jnp.ndarray  # [R]


def project_scan(
    scan: RawScan,
    n_scan: int,
    horizon: int,
    min_range: float,
    max_range: float,
    downsample_rate: int = 1,
    deskew_rpy: Optional[jnp.ndarray] = None,
    odom_time_diff: Optional[jnp.ndarray] = None,
    deskew_vel: Optional[jnp.ndarray] = None,
) -> RingImage:
    """Project a raw scan into a per-ring compacted range image.

    deskew_rpy: optional [3] odometry rotation increment (roll, pitch, yaw)
    over odom_time_diff seconds; when given, applies the reference's
    rotation-only deskew (imageProjection.cpp:368-396: each point is rotated
    by -rpy * rel_time / odom_time_diff; the translational part is zeroed at
    :386).

    deskew_vel: optional [3] sensor displacement over `odom_time_diff`
    expressed in the sweep-start frame. Extends the reference with the
    translational correction it zeroes: p0 = R(t) p + ratio * deskew_vel.
    Rotation-only deskew breaks the distortion cancellation two
    equally-distorted consecutive scans enjoy in scan-to-scan registration
    (measured: step translation error 0.08 -> 0.13 m when only rotation is
    corrected); correcting both restores geometric consistency outright.
    """
    xyz = scan.xyz
    n = xyz.shape[0]
    rng = jnp.linalg.norm(xyz, axis=-1)

    valid = scan.mask & (rng >= min_range) & (rng <= max_range)
    valid &= (scan.ring >= 0) & (scan.ring < n_scan)
    if downsample_rate > 1:
        valid &= (scan.ring % downsample_rate) == 0

    # Column index from azimuth (imageProjection.cpp:438-444).
    horizon_f = float(horizon)
    ang_res = 360.0 / horizon_f
    horizon_angle = jnp.arctan2(xyz[..., 0], xyz[..., 1]) * (180.0 / math.pi)
    col = (-jnp.round((horizon_angle - 90.0) / ang_res)).astype(jnp.int32) + horizon // 2
    col = jnp.where(col >= horizon, col - horizon, col)
    valid &= (col >= 0) & (col < horizon)

    if deskew_rpy is not None:
        # ratio = rel_time / odom_time_diff (deskewPoint: trans * (scanPeriod/odomDiff) * relTime/scanPeriod)
        ratio = scan.rel_time / jnp.maximum(odom_time_diff, 1e-6)
        rpy = -deskew_rpy[None, :] * ratio[:, None]
        rot = so3.rpy_to_matrix(rpy[..., 0], rpy[..., 1], rpy[..., 2])  # [N, 3, 3]
        xyz = jnp.einsum("nij,nj->ni", rot, xyz)
        if deskew_vel is not None:
            xyz = xyz + ratio[:, None] * deskew_vel[None, :]

    # First-return-wins scatter: the winning point per pixel is the one with
    # the smallest original index (reference fills pixels in point order and
    # skips already-filled pixels).
    pix = jnp.where(valid, scan.ring * horizon + col, n_scan * horizon)  # sentinel bucket
    winner = jnp.full((n_scan * horizon + 1,), n, dtype=jnp.int32)
    winner = winner.at[pix].min(jnp.arange(n, dtype=jnp.int32))
    winner = winner[: n_scan * horizon]
    pix_valid = winner < n
    widx = jnp.minimum(winner, n - 1)

    img_xyz = jnp.where(pix_valid[:, None], xyz[widx], 0.0).reshape(n_scan, horizon, 3)
    img_rng = jnp.where(pix_valid, rng[widx], jnp.inf).reshape(n_scan, horizon)
    pix_valid = pix_valid.reshape(n_scan, horizon)

    # Per-ring compaction in column order (cloudExtraction,
    # imageProjection.cpp:477-505): dest position = rank of this valid pixel
    # within its ring.
    order = jnp.cumsum(pix_valid, axis=1) - 1  # [R, H]
    count = jnp.sum(pix_valid, axis=1).astype(jnp.int32)
    dest = jnp.where(pix_valid, order, horizon)  # overflow slot per ring

    cols = jnp.broadcast_to(jnp.arange(horizon, dtype=jnp.int32)[None, :], (n_scan, horizon))

    def ring_scatter(values, fill):
        out = jnp.full((n_scan, horizon + 1) + values.shape[2:], fill, dtype=values.dtype)
        ridx = jnp.broadcast_to(jnp.arange(n_scan)[:, None], (n_scan, horizon))
        out = out.at[ridx, dest].set(values)
        return out[:, :horizon]

    c_xyz = ring_scatter(img_xyz, 0.0)
    c_rng = ring_scatter(jnp.where(pix_valid, img_rng, 0.0), 0.0)
    c_col = ring_scatter(cols, 0)
    c_mask = jnp.arange(horizon)[None, :] < count[:, None]

    return RingImage(c_xyz, c_rng, c_col, c_mask, count)
