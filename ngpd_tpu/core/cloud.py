"""Point-cloud container.

Host-side counterpart of the reference's ``Pointcloud(v, n)``
(Object.py:43-56). The jitted compute core is array-in/array-out; this
dataclass is the convenience wrapper around device arrays for IO, noise
bookkeeping and padding.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

# Sentinel coordinate for padding rows: far enough that padded points can
# never win a nearest-neighbor race against real geometry.
PAD_SENTINEL = 1e30


@dataclasses.dataclass
class PointCloud:
    """A (possibly padded) point cloud.

    Attributes:
      points: (N, 3) float32 positions. Rows >= num_valid are padding.
      normals: optional (N, 3) float32 unit normals.
      num_valid: count of real points (<= N).
    """

    points: jnp.ndarray
    normals: Optional[jnp.ndarray] = None
    num_valid: Optional[int] = None

    def __post_init__(self):
        assert self.points.ndim == 2 and self.points.shape[1] == 3, self.points.shape
        if self.normals is not None:
            assert self.normals.shape == self.points.shape
        if self.num_valid is None:
            self.num_valid = int(self.points.shape[0])

    def __len__(self) -> int:
        return int(self.num_valid)

    def has_normals(self) -> bool:
        return self.normals is not None

    def padded_to(self, multiple: int) -> "PointCloud":
        """Pad the point count up to a multiple (for sharding / kernels).

        Padding rows sit at PAD_SENTINEL so distance-based neighbor search
        ignores them without extra masks.
        """
        n = self.points.shape[0]
        target = -(-n // multiple) * multiple
        if target == n:
            return self
        pad = target - n
        pts = jnp.pad(self.points, ((0, pad), (0, 0)), constant_values=PAD_SENTINEL)
        nrm = (
            None
            if self.normals is None
            else jnp.pad(self.normals, ((0, pad), (0, 0)))
        )
        return PointCloud(pts, nrm, num_valid=self.num_valid)

    def valid_points(self) -> np.ndarray:
        return np.asarray(self.points[: self.num_valid])

    def valid_normals(self) -> Optional[np.ndarray]:
        if self.normals is None:
            return None
        return np.asarray(self.normals[: self.num_valid])

    @classmethod
    def from_numpy(
        cls, v: np.ndarray, n: Optional[np.ndarray] = None
    ) -> "PointCloud":
        pts = jnp.asarray(v, dtype=jnp.float32)
        nrm = None if n is None else jnp.asarray(n, dtype=jnp.float32)
        return cls(pts, nrm)
