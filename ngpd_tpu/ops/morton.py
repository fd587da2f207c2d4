"""Morton (Z-order) spatial sorting.

The windowed denoise engine (core/fused.py) requires spatial locality in
MEMORY order: after sorting by Morton code, a point's geometric
neighbors lie within a small index window, so neighbor search and all
neighbor reductions become contiguous dynamic slices + tile matmuls —
no random-access gathers, which on TPU cost ~8 ns per row regardless of
row size (measured; the reason the naive (N, k) gather formulation
cannot reach the 1M x 20-iter target).

Sorting carries the payload columns through jax.lax.sort directly
(bandwidth-bound bitonic passes), never materializing a permutation
gather.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

MORTON_BITS = 10  # 1024^3 grid; codes fit in 30 bits of an int32.


def _part1by2(v: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of v so consecutive bits are 3 apart."""
    v = v & 0x3FF
    v = (v | (v << 16)) & 0x30000FF
    v = (v | (v << 8)) & 0x300F00F
    v = (v | (v << 4)) & 0x30C30C3
    v = (v | (v << 2)) & 0x9249249
    return v


def morton_codes(
    points: jnp.ndarray, num_valid: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Z-order codes of (N, 3) points, padding rows forced to the max
    code so they sort to the end."""
    n = points.shape[0]
    nv = jnp.asarray(n if num_valid is None else num_valid, jnp.int32)
    row = jnp.arange(n, dtype=jnp.int32)
    valid = row < nv
    safe = jnp.where(valid[:, None], points, 0.0)
    mn = jnp.min(jnp.where(valid[:, None], safe, jnp.inf), axis=0)
    mx = jnp.max(jnp.where(valid[:, None], safe, -jnp.inf), axis=0)
    scale = (2**MORTON_BITS - 1) / jnp.maximum(mx - mn, 1e-30)
    cell = jnp.clip(
        ((safe - mn) * scale).astype(jnp.int32), 0, 2**MORTON_BITS - 1
    )
    code = (
        _part1by2(cell[:, 0])
        | (_part1by2(cell[:, 1]) << 1)
        | (_part1by2(cell[:, 2]) << 2)
    )
    return jnp.where(valid, code, jnp.int32(2**30))


class SortedCloud(NamedTuple):
    """Point data in Morton order.

    orig_idx maps sorted row -> original row; padding rows sit at the
    end (their coords are clamped finite but index-masked everywhere).
    """

    pos: jnp.ndarray  # (N, 3)
    nrm: jnp.ndarray  # (N, 3)
    orig_idx: jnp.ndarray  # (N,) int32
    num_valid: jnp.ndarray  # scalar int32


def morton_sort(
    points: jnp.ndarray,
    normals: jnp.ndarray,
    num_valid: Optional[jnp.ndarray] = None,
) -> SortedCloud:
    n = points.shape[0]
    nv = jnp.asarray(n if num_valid is None else num_valid, jnp.int32)
    code = morton_codes(points, nv)
    row = jnp.arange(n, dtype=jnp.int32)
    # Clamp padding coords to a finite corner so no inf/nan reaches the
    # distance matmuls (they stay excluded by index masks).
    valid = row < nv
    far = jnp.max(jnp.where(valid[:, None], points, -jnp.inf), axis=0) + 1.0
    pts = jnp.where(valid[:, None], points, far)
    ops = jax.lax.sort(
        (code, pts[:, 0], pts[:, 1], pts[:, 2],
         normals[:, 0], normals[:, 1], normals[:, 2], row),
        num_keys=1,
    )
    pos = jnp.stack(ops[1:4], axis=1)
    nrm = jnp.stack(ops[4:7], axis=1)
    return SortedCloud(pos=pos, nrm=nrm, orig_idx=ops[7], num_valid=nv)


def unsort(values: jnp.ndarray, orig_idx: jnp.ndarray) -> jnp.ndarray:
    """Scatter sorted-order rows back to original order (one scatter at
    the very end of a run — the only non-contiguous memory op left)."""
    out = jnp.zeros_like(values)
    return out.at[orig_idx].set(values)
