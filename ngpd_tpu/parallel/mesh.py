"""Device-mesh plumbing.

The reference has NO distributed runtime at all — single CUDA GPU,
``CUDA_VISIBLE_DEVICES=0``, commented-out DataParallel (SURVEY.md §2.5:
Config.py:43-44, DenoisingGCN/train.py:86). Scale-out here is
green-field: a 1-D ``jax.sharding.Mesh`` over the point axis for
geometry (ICI collectives inserted by XLA / explicit in shard_map), and
a data-parallel axis for training.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

POINTS_AXIS = "points"
DATA_AXIS = "dp"
MODEL_AXIS = "mp"


def make_mesh(
    n_devices: Optional[int] = None, axis_names: Sequence[str] = (POINTS_AXIS,)
) -> Mesh:
    """A dense mesh over the first n devices (default: all)."""
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    devs = np.asarray(devs[:n])
    if len(axis_names) == 1:
        shape = (n,)
    elif len(axis_names) == 2:
        # Favor the first axis; fall back to 1 on the second.
        first = max(d for d in range(1, n + 1) if n % d == 0 and d <= n)
        shape = (first, n // first)
    else:
        raise ValueError("only 1-D or 2-D meshes supported here")
    return Mesh(devs.reshape(shape), axis_names)


def shard_points(
    points, mesh: Mesh, axis: str = POINTS_AXIS, pad_value: float = 1e30
):
    """Pad the leading axis to a multiple of the mesh axis size and place
    the array row-sharded. Returns (sharded_array, num_valid).

    Padding rows sit at ``pad_value`` (far sentinel): their pairwise
    distances overflow to +inf in float32, so kNN masks them out with no
    extra bookkeeping.
    """
    import jax.numpy as jnp

    n = points.shape[0]
    d = mesh.shape[axis]
    target = -(-n // d) * d
    if target != n:
        points = jnp.pad(
            points, ((0, target - n),) + ((0, 0),) * (points.ndim - 1),
            constant_values=pad_value,
        )
    sharding = NamedSharding(mesh, P(axis, *([None] * (points.ndim - 1))))
    return jax.device_put(points, sharding), n
