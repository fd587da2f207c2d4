"""Tiled k-nearest-neighbor search — the keystone every layer consumes.

The reference round-trips to host SciPy KDTrees for every neighborhood
query (Selector.py:141,226,243 build/query a scipy.spatial.KDTree on CPU;
the C++ app uses FLANN, FlannKDTree.h:12-108). On TPU the idiomatic
replacement is brute-force pairwise distances ridden on the MXU
(``-2 q @ p^T`` dominates) with a running top-k, tiled so VMEM holds one
``(query_tile, point_tile)`` distance block at a time; and for >100k-point
clouds a voxel-hash grid that bounds each query to 27 candidate cells.

Everything is static-shaped: radius queries become kNN + distance mask
(see core callers), padding points are pushed to +inf distance via
``num_valid``.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

from .neighbors import Neighborhood

_INF = jnp.float32(jnp.inf)
# Hash primes for voxel-grid cells (standard spatial-hash constants).
_P1, _P2, _P3 = 73856093, 19349663, 83492791


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def pairwise_sqdist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Squared euclidean distances (Qa, 3) x (Qb, 3) -> (Qa, Qb).

    Written as |a|^2 + |b|^2 - 2 a.b so the cross term is a matmul the MXU
    can tile; clamped at 0 against cancellation.
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    aa = jnp.sum(a * a, axis=-1, keepdims=True)  # (Qa, 1)
    bb = jnp.sum(b * b, axis=-1)[None, :]  # (1, Qb)
    # HIGHEST precision: the default matmul path drops to bf16 passes,
    # whose ~1e-2 error is enough to reorder nearest neighbors.
    ab = jax.lax.dot_general(
        a,
        b,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.maximum(aa + bb - 2.0 * ab, 0.0)


def _topk_smallest(d: jnp.ndarray, idx: jnp.ndarray, k: int):
    """Row-wise k smallest of d with their idx. d, idx: (Q, M)."""
    neg_vals, arg = jax.lax.top_k(-d, k)
    return -neg_vals, jnp.take_along_axis(idx, arg, axis=1)


def _knn_chunk(
    q_chunk: jnp.ndarray,
    points: jnp.ndarray,
    k: int,
    point_tile: int,
    num_valid: jnp.ndarray,
    exclude_idx: Optional[jnp.ndarray],
):
    """Exact kNN of one query chunk against all points.

    Scans point tiles, keeping a running (Qc, k) best set; each step is a
    top-k over the concatenation of the running set and the fresh tile.
    """
    qc = q_chunk.shape[0]
    p = points.shape[0]
    num_tiles = _cdiv(p, point_tile)
    pad_p = num_tiles * point_tile - p
    points_pad = jnp.pad(points, ((0, pad_p), (0, 0)), constant_values=1e30)

    best_d = jnp.full((qc, k), _INF, dtype=jnp.float32)
    best_i = jnp.zeros((qc, k), dtype=jnp.int32)

    def body(carry, t):
        bd, bi = carry
        blk = jax.lax.dynamic_slice_in_dim(points_pad, t * point_tile, point_tile)
        d = pairwise_sqdist(q_chunk, blk)  # (Qc, tile)
        gidx = t * point_tile + jax.lax.broadcasted_iota(
            jnp.int32, (1, point_tile), 1
        )
        d = jnp.where(gidx >= num_valid, _INF, d)
        if exclude_idx is not None:
            d = jnp.where(gidx == exclude_idx[:, None], _INF, d)
        all_d = jnp.concatenate([bd, d], axis=1)
        all_i = jnp.concatenate(
            [bi, jnp.broadcast_to(gidx, (qc, point_tile))], axis=1
        )
        return _topk_smallest(all_d, all_i, k), None

    (best_d, best_i), _ = jax.lax.scan(
        body, (best_d, best_i), jnp.arange(num_tiles, dtype=jnp.int32)
    )
    return best_d, best_i


@functools.partial(
    jax.jit,
    static_argnames=("k", "exclude_self", "point_tile", "query_tile"),
)
def knn(
    points: jnp.ndarray,
    k: int,
    queries: Optional[jnp.ndarray] = None,
    *,
    exclude_self: bool = False,
    num_valid: Optional[jnp.ndarray] = None,
    point_tile: int = 2048,
    query_tile: int = 1024,
):
    """Exact brute-force kNN: for each query, the k nearest of ``points``.

    Returns ``(Neighborhood, sqdists)`` with ascending distances per row.

    Semantics notes for parity with the reference:
      * With ``exclude_self=False`` the query itself is its own first
        neighbor, matching scipy ``KDTree.query(pos, k)`` as used by
        ``Selector.getKNNSelection`` (Selector.py:235-246).
      * With ``exclude_self=True`` (requires ``queries is None``) the self
        match is masked, matching ``torch_cluster.knn_graph`` as used by
        ``GraphBuilder.getKNNEdgeIndex`` (GraphBuilder.py:60-63).

    Args:
      points: (N, 3) source cloud. Rows >= num_valid are ignored.
      k: neighbor count (static).
      queries: (Q, 3); defaults to ``points``.
      num_valid: scalar int — number of valid source rows (default N).
    """
    self_query = queries is None
    if exclude_self and not self_query:
        raise ValueError("exclude_self requires queries drawn from `points`")
    q = points if self_query else queries
    n = points.shape[0]
    nq = q.shape[0]
    nv = jnp.asarray(n if num_valid is None else num_valid, dtype=jnp.int32)

    num_chunks = _cdiv(nq, query_tile)
    pad_q = num_chunks * query_tile - nq
    q_pad = jnp.pad(q, ((0, pad_q), (0, 0)))
    q_chunks = q_pad.reshape(num_chunks, query_tile, 3)

    if exclude_self:
        self_idx = jnp.arange(num_chunks * query_tile, dtype=jnp.int32).reshape(
            num_chunks, query_tile
        )

        def run(args):
            qc, ex = args
            return _knn_chunk(qc, points, k, point_tile, nv, ex)

        d, i = jax.lax.map(run, (q_chunks, self_idx))
    else:
        run = lambda qc: _knn_chunk(qc, points, k, point_tile, nv, None)
        d, i = jax.lax.map(run, q_chunks)

    d = d.reshape(num_chunks * query_tile, k)[:nq]
    i = i.reshape(num_chunks * query_tile, k)[:nq]
    mask = jnp.isfinite(d)
    idx = jnp.where(mask, i, 0)
    return Neighborhood(idx=idx, mask=mask), jnp.where(mask, d, _INF)


def nn_distances(
    a: jnp.ndarray,
    b: jnp.ndarray,
    *,
    num_valid_b: Optional[jnp.ndarray] = None,
    point_tile: int = 2048,
    query_tile: int = 1024,
):
    """1-NN squared distance from each point of ``a`` into cloud ``b``.

    The shared primitive behind Chamfer / Hausdorff / PaperDistance
    (Utils.py:253-295), which the reference computes with a host-side PyG
    knn pool.
    Returns ``(sqdist (Qa,), idx (Qa,))``.
    """
    nbh, d = knn(
        b, 1, a, num_valid=num_valid_b, point_tile=point_tile, query_tile=query_tile
    )
    return d[:, 0], nbh.idx[:, 0]


def _cell_hash(cells: jnp.ndarray, table_bits: int) -> jnp.ndarray:
    """Spatial hash of integer cell coordinates -> [0, 2^table_bits)."""
    h = (cells[..., 0] * _P1) ^ (cells[..., 1] * _P2) ^ (cells[..., 2] * _P3)
    return h & ((1 << table_bits) - 1)


@functools.partial(
    jax.jit,
    static_argnames=("k", "capacity", "exclude_self", "query_tile", "table_bits"),
)
def knn_grid(
    points: jnp.ndarray,
    k: int,
    cell_size: jnp.ndarray,
    queries: Optional[jnp.ndarray] = None,
    *,
    capacity: int = 64,
    exclude_self: bool = False,
    num_valid: Optional[jnp.ndarray] = None,
    query_tile: int = 4096,
    table_bits: Optional[int] = None,
):
    """Voxel-hash kNN for large clouds (the >1M-point path).

    Points are bucketed into cubic cells of edge ``cell_size`` and sorted
    by cell hash; each query scans the 27 surrounding cells, up to
    ``capacity`` points per hash run. Exact whenever the true k-th
    neighbor lies within ``cell_size`` and no visited hash run overflows
    ``capacity``; hash collisions only ever ADD candidates (they lose in
    the top-k), never remove true ones.

    Replaces the CPU KDTree for the scale the reference never reaches
    (single-GPU, Selector.py:141). O(N * 27 * capacity) distance ops —
    bandwidth-bound gathers instead of N^2 FLOPs.
    """
    self_query = queries is None
    if exclude_self and not self_query:
        raise ValueError("exclude_self requires queries drawn from `points`")
    q = points if self_query else queries
    n = points.shape[0]
    nq = q.shape[0]
    nv = jnp.asarray(n if num_valid is None else num_valid, dtype=jnp.int32)
    if table_bits is None:
        table_bits = max(10, math.ceil(math.log2(max(2 * n, 2))))

    cell_size = jnp.asarray(cell_size, dtype=jnp.float32)
    origin = jnp.min(jnp.where(jnp.isfinite(points), points, 0.0)) - 1.0

    def cells_of(x):
        return jnp.floor((x - origin) / cell_size).astype(jnp.int32)

    pidx = jnp.arange(n, dtype=jnp.int32)
    ph = _cell_hash(cells_of(points), table_bits)
    # Push padding rows to an unused max hash so they sort to the end.
    ph = jnp.where(pidx < nv, ph, (1 << table_bits) - 1)
    order = jnp.argsort(ph).astype(jnp.int32)
    ph_sorted = ph[order]

    # 27 neighbor-cell offsets.
    off = jnp.stack(
        jnp.meshgrid(
            jnp.arange(-1, 2), jnp.arange(-1, 2), jnp.arange(-1, 2), indexing="ij"
        ),
        axis=-1,
    ).reshape(27, 3)

    num_chunks = _cdiv(nq, query_tile)
    pad_q = num_chunks * query_tile - nq
    q_pad = jnp.pad(q, ((0, pad_q), (0, 0)))
    q_chunks = q_pad.reshape(num_chunks, query_tile, 3)
    if exclude_self:
        self_idx = jnp.arange(num_chunks * query_tile, dtype=jnp.int32).reshape(
            num_chunks, query_tile
        )
    else:
        self_idx = jnp.zeros((num_chunks, query_tile), dtype=jnp.int32)

    cap_iota = jnp.arange(capacity, dtype=jnp.int32)
    # Structure-of-arrays view: gathering (T, 27*C, 3) rows would get
    # lane-padded 3 -> 128 by the TPU tiler (a 42x memory/bandwidth
    # blowup); per-component gathers keep the large candidate axis in
    # the lanes instead.
    points_t = points.T  # (3, N)

    def run(args):
        qc, ex = args  # (T, 3), (T,)
        t = qc.shape[0]
        qcells = cells_of(qc)  # (T, 3)
        nh = _cell_hash(qcells[:, None, :] + off[None, :, :], table_bits)  # (T, 27)
        starts = jnp.searchsorted(ph_sorted, nh, side="left").astype(jnp.int32)
        pos = starts[..., None] + cap_iota  # (T, 27, C) positions in sorted order
        pos_c = jnp.minimum(pos, n - 1)
        run_ok = (pos < n) & (ph_sorted[pos_c] == nh[..., None])
        cand = order[pos_c].reshape(t, 27 * capacity)  # global point ids
        valid = run_ok.reshape(t, 27 * capacity) & (cand < nv)
        d = jnp.zeros(cand.shape, jnp.float32)
        for c in range(3):
            diff = points_t[c][cand] - qc[:, c][:, None]
            d = d + diff * diff
        d = jnp.where(valid, d, _INF)
        if exclude_self:
            d = jnp.where(cand == ex[:, None], _INF, d)
        return _topk_smallest(d, cand, k)

    d, i = jax.lax.map(run, (q_chunks, self_idx))
    d = d.reshape(num_chunks * query_tile, k)[:nq]
    i = i.reshape(num_chunks * query_tile, k)[:nq]
    mask = jnp.isfinite(d)
    idx = jnp.where(mask, i, 0)
    return Neighborhood(idx=idx, mask=mask), jnp.where(mask, d, _INF)


def estimate_cell_size(
    points: jnp.ndarray, k: int, sample: int = 1024, safety: float = 1.25
) -> jnp.ndarray:
    """Pick a grid cell size ~ the k-NN radius of a point subsample.

    A brute-force kNN over ``sample`` strided rows (deterministic) gives
    the k-th neighbor distance distribution; the MAX scaled by ``safety``
    bounds the search radius so knn_grid stays exact on the sampled
    queries (and with high probability everywhere). ``k`` should include
    the self neighbor the caller will or won't exclude — the estimate
    uses k+1 so it covers the exclude_self case.
    """
    n = points.shape[0]
    stride = max(1, n // sample)
    sub = points[::stride][:sample]
    _, d = knn(points, k + 1, sub)
    kth = jnp.sqrt(d[:, -1])
    return jnp.max(kth) * safety
