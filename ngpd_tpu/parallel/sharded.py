"""Point-axis-sharded geometry: kNN, Chamfer, and the denoise loop.

The pattern everywhere: queries stay sharded over the ``points`` mesh
axis; the (small) full coordinate set is all-gathered over ICI and each
shard runs the same dense (N_local, k) kernels as the single-chip path.
For a 4M-point cloud the gathered positions are 48 MB — one ICI round
per iteration versus an O(N*k) compute body, so the collective is far
off the critical path. Cross-shard reductions (mean edge length, the
per-class flat delta) ride psum/pmax.

This whole module is the green-field replacement for the reference's
missing distributed layer (SURVEY.md §2.5): there is nothing to port —
the design is mesh + shard_map + XLA collectives.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:  # jax >= 0.8 moved shard_map out of experimental
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..config import DenoiseConfig
from ..core.pipeline import DEFAULT_STRATEGY, denoise_iteration
from ..ops.knn import knn, nn_distances
from .mesh import POINTS_AXIS


def _all_gather(x, axis_name):
    return jax.lax.all_gather(x, axis_name, axis=0, tiled=True)


@functools.partial(
    jax.jit, static_argnames=("k", "mesh", "axis", "exclude_self")
)
def knn_sharded(
    points: jnp.ndarray,
    k: int,
    mesh: Mesh,
    axis: str = POINTS_AXIS,
    exclude_self: bool = False,
    num_valid: Optional[jnp.ndarray] = None,
):
    """kNN with the query rows sharded over the mesh axis.

    Returns (Neighborhood, sqdists) with GLOBAL indices, row-sharded.
    """
    n = points.shape[0]
    nv = jnp.asarray(n if num_valid is None else num_valid, dtype=jnp.int32)
    shard_rows = n // mesh.shape[axis]

    def body(local_pts, nv_):
        full = _all_gather(local_pts, axis)
        # Global row offset of this shard for self-exclusion.
        idx = jax.lax.axis_index(axis)
        if exclude_self:
            # Mask the self match by index: query g-row = offset + row.
            nbh, d = knn(full, k + 1, local_pts, num_valid=nv_[0])
            grow = idx * shard_rows + jnp.arange(shard_rows)
            is_self = nbh.idx == grow[:, None]
            # Drop the self column: shift left where self appears.
            order = jnp.argsort(
                jnp.where(is_self, jnp.inf, d), axis=1
            )[:, :k]
            new_idx = jnp.take_along_axis(nbh.idx, order, axis=1)
            new_d = jnp.take_along_axis(d, order, axis=1)
            new_mask = jnp.take_along_axis(
                nbh.mask & ~is_self, order, axis=1
            )
            return new_idx, new_mask, new_d
        nbh, d = knn(full, k, local_pts, num_valid=nv_[0])
        return nbh.idx, nbh.mask, d

    f = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis, None), P()),
        out_specs=(P(axis, None), P(axis, None), P(axis, None)),
        check_vma=False,
    )
    idx, mask, d = f(points, nv[None])
    from ..ops.neighbors import Neighborhood

    return Neighborhood(idx=idx, mask=mask), d


@functools.partial(jax.jit, static_argnames=("mesh", "axis"))
def chamfer_distance_sharded(
    pos0: jnp.ndarray, pos1: jnp.ndarray, mesh: Mesh, axis: str = POINTS_AXIS
):
    """Bi-directional mean squared NN distance with both clouds row-sharded.

    Returns the scalar mean (the vector form of Utils.py:253-265 is
    shard-local; the mean is what the notebooks consume).
    """
    n0, n1 = pos0.shape[0], pos1.shape[0]

    def body(a, b):
        fa = _all_gather(a, axis)
        fb = _all_gather(b, axis)
        d0, _ = nn_distances(a, fb)
        d1, _ = nn_distances(b, fa)
        s = jax.lax.psum(jnp.sum(d0) + jnp.sum(d1), axis)
        return s[None]

    f = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None)),
        out_specs=P(axis),
        check_vma=False,
    )
    total = f(pos0, pos1)[0] / (n0 + n1)
    return total


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "strategy", "iterations", "mesh", "axis"),
)
def denoise_sharded(
    points: jnp.ndarray,
    normals: jnp.ndarray,
    mesh: Mesh,
    cfg: DenoiseConfig = DenoiseConfig(),
    strategy: tuple[str, str, str] = DEFAULT_STRATEGY,
    iterations: Optional[int] = None,
    num_valid: Optional[jnp.ndarray] = None,
    axis: str = POINTS_AXIS,
):
    """Multi-chip classical denoise: rows sharded, one all-gather of
    positions + normals per iteration, everything else local.

    Exactly the single-chip iteration semantics (same tests pass against
    the unsharded path); the d threshold and flat-step delta reduce
    across shards.
    """
    iters = cfg.iterations if iterations is None else iterations
    n = points.shape[0]
    nv = jnp.asarray(n if num_valid is None else num_valid, dtype=jnp.int32)

    def body(local_pos, local_nrm, nv_):
        nv_ = nv_[0]
        gather = lambda x: _all_gather(x, axis)

        # d = 2 * mean 6-NN edge length, global (Processor.py:120-121).
        full0 = gather(local_pos)
        nbh6, d6 = knn(full0, 6, local_pos, num_valid=nv_)
        dist = jnp.sqrt(jnp.where(nbh6.mask, d6, 0.0))
        cnt = jax.lax.psum(jnp.sum(nbh6.mask), axis)
        tot = jax.lax.psum(jnp.sum(dist), axis)
        d_thr = cfg.d_scale * tot / jnp.maximum(cnt, 1)

        def one_iter(carry, _):
            pos, nrm = carry
            src_pos = gather(pos)
            src_nrm = gather(nrm)
            nbh_f, _ = knn(src_pos, cfg.feature_k, pos, num_valid=nv_)
            nbh_s, _ = knn(src_pos, cfg.step_k, pos, num_valid=nv_)
            new_pos, f_n, _ = denoise_iteration(
                pos, nrm, nbh_f, nbh_s, d_thr,
                cfg.alphas, cfg.angle, cfg.class_scale, strategy,
                cfg.vu_tau, cfg.vu_damping,
                src_points=src_pos, src_normals=src_nrm,
                gather_fn=gather, axis_name=axis,
            )
            return (new_pos, f_n), None

        (pos, nrm), _ = jax.lax.scan(
            one_iter, (local_pos, local_nrm), None, length=iters
        )
        return pos, nrm

    f = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P()),
        out_specs=(P(axis, None), P(axis, None)),
        check_vma=False,
    )
    return f(points, normals, nv[None])
