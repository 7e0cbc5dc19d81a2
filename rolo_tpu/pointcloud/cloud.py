"""Fixed-capacity padded point-cloud containers.

The reference passes pcl::PointCloud (dynamic std::vector) between stages
(msg/CloudInfoStamp.msg). XLA needs static shapes, so every cloud here is a
(xyz [N, 3], mask [N]) pair padded to a fixed capacity; reductions must be
mask-weighted. This is the pytree equivalent of the CloudInfoStamp record.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np


class PaddedCloud(NamedTuple):
    """Padded cloud: xyz [N, 3] float32, mask [N] bool (True = real point)."""

    xyz: jnp.ndarray
    mask: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.xyz.shape[-2]

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.mask, axis=-1)

    @staticmethod
    def from_points(points: np.ndarray, capacity: int) -> "PaddedCloud":
        """Host-side constructor from a dense [M, 3] array (truncates if M > capacity)."""
        points = np.asarray(points, dtype=np.float32).reshape(-1, 3)
        m = min(points.shape[0], capacity)
        xyz = np.zeros((capacity, 3), dtype=np.float32)
        xyz[:m] = points[:m]
        mask = np.zeros((capacity,), dtype=bool)
        mask[:m] = True
        return PaddedCloud(jnp.asarray(xyz), jnp.asarray(mask))

    def to_numpy(self) -> np.ndarray:
        """Host-side: extract the valid points as a dense array."""
        xyz = np.asarray(self.xyz)
        mask = np.asarray(self.mask)
        return xyz[mask]

    def transformed(self, rot: jnp.ndarray, trans: jnp.ndarray) -> "PaddedCloud":
        xyz = jnp.einsum("...ij,...nj->...ni", rot, self.xyz) + trans[..., None, :]
        return PaddedCloud(xyz, self.mask)


def concat_clouds(a: PaddedCloud, b: PaddedCloud, capacity: Optional[int] = None) -> PaddedCloud:
    """Stack two padded clouds; padding stays at the tail of each segment.

    Mirrors `*featureLast = *CloudCornerLast + *CloudSurfLast`
    (lidarOdometry.cpp:524) — downstream consumers are mask-aware so
    interior padding is fine.
    """
    xyz = jnp.concatenate([a.xyz, b.xyz], axis=-2)
    mask = jnp.concatenate([a.mask, b.mask], axis=-1)
    if capacity is not None and capacity != xyz.shape[-2]:
        if capacity < xyz.shape[-2]:
            # Keep valid points first via a stable sort on ~mask.
            order = jnp.argsort(~mask, axis=-1, stable=True)
            xyz = jnp.take_along_axis(xyz, order[..., None], axis=-2)[..., :capacity, :]
            mask = jnp.take_along_axis(mask, order, axis=-1)[..., :capacity]
        else:
            pad = capacity - xyz.shape[-2]
            xyz = jnp.pad(xyz, [*[(0, 0)] * (xyz.ndim - 2), (0, pad), (0, 0)])
            mask = jnp.pad(mask, [*[(0, 0)] * (mask.ndim - 1), (0, pad)])
    return PaddedCloud(xyz, mask)


def compact_cloud(cloud: PaddedCloud) -> PaddedCloud:
    """Move valid points to the front (stable), padding to the back."""
    order = jnp.argsort(~cloud.mask, axis=-1, stable=True)
    xyz = jnp.take_along_axis(cloud.xyz, order[..., None], axis=-2)
    mask = jnp.take_along_axis(cloud.mask, order, axis=-1)
    return PaddedCloud(xyz, mask)
