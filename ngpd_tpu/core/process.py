"""High-level processing APIs — the remaining Processor surface.

Covers the reference entry points not already owned by pipeline.py:
  * radius selections (Selector.getPointsInRangeSelection,
    Selector.py:214-233) as kNN + distance mask;
  * getVUDecomposition (Processor.py:83-100);
  * getMartinFeatureDecomposition (Processor.py:102-108);
  * getMDFeatures (Processor.py:35-38);
  * preprocessPointcloud (Processor.py:187-199).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import PatchConfig
from ..ops import metrics
from ..ops.knn import knn
from ..ops.neighbors import Neighborhood
from . import noise as noise_mod
from . import voting
from .normals import orient_normals, pvt_normals
from .patches import md_selection


def radius_neighborhood(
    points: jnp.ndarray,
    radius: jnp.ndarray,
    k_cap: int = 64,
    num_valid: Optional[jnp.ndarray] = None,
) -> Neighborhood:
    """All points within ``radius`` (scalar or per-point), capped at the
    k_cap nearest — the static-shape replacement for the KD-tree ball
    query (Selector.py:214-233). Points beyond the cap are dropped
    (choose k_cap generously for the density at hand)."""
    nbh, d = knn(points, k_cap, num_valid=num_valid)
    r2 = jnp.broadcast_to(jnp.asarray(radius) ** 2, (points.shape[0],))
    return nbh.and_mask(d <= r2[:, None])


@functools.partial(jax.jit, static_argnames=("k_cap",))
def vu_decomposition(
    points: jnp.ndarray, normals: jnp.ndarray, k_cap: int = 64
):
    """getVUDecomposition (Processor.py:83-100): radius selection at
    r = 2 * mean 6-NN edge length, NormalFilteredNVT(rho=0.95) ->
    VU-smoothed normals (tau=0.3, d=3) -> NormalFilteredPVT."""
    nbh6, _ = knn(points, 6, exclude_self=True)
    r = 2.0 * metrics.average_edge_length(points, nbh6)
    sel = radius_neighborhood(points, r, k_cap)
    nvt = voting.normal_filtered_nvt(sel, normals, rho=0.95)
    filtered = voting.vu_smoothed_normals(nvt, normals, tau=0.3, damping=3.0)
    return voting.normal_filtered_pvt(points, sel, filtered, rho=0.95)


@functools.partial(jax.jit, static_argnames=("k_cap",))
def martin_feature_decomposition(
    points: jnp.ndarray,
    normals: jnp.ndarray,
    r: jnp.ndarray,
    rho: float = 0.9,
    k_cap: int = 64,
):
    """getMartinFeatureDecomposition (Processor.py:102-108)."""
    sel = radius_neighborhood(points, r, k_cap)
    nvt = voting.normal_filtered_nvt(sel, normals, rho)
    filtered = voting.vu_smoothed_normals(nvt, normals)
    dec = voting.normal_filtered_pvt(points, sel, filtered, rho)
    return dec, filtered


@functools.partial(jax.jit, static_argnames=("cfg",))
def md_features(
    points: jnp.ndarray,
    normals: jnp.ndarray,
    cfg: PatchConfig = PatchConfig(),
) -> jnp.ndarray:
    """getMDFeatures (Processor.py:35-38): MD-selection voting tensor ->
    eigenvalue-threshold classes {0: none, 1: flat, 2: edge, 3: corner}."""
    nbh, mass, _ = md_selection(points, cfg)
    dec, _ = voting.md_transformation(points, nbh, normals, mass)
    return voting.md_features(dec)


def preprocess_pointcloud(
    key: jax.Array,
    points: jnp.ndarray,
    k: int = 12,
    noise_level: float = 0.3,
):
    """preprocessPointcloud (Processor.py:187-199): estimate normals on
    the clean cloud, corrupt it (stdev = noise_level * mean edge length),
    then re-estimate + orient normals on the noisy cloud.

    Returns (noisy_points, noisy_normals, gt_normals).
    """
    nbh, _ = knn(points, k, exclude_self=True)
    gt_n = pvt_normals(points, nbh)  # un-flipped, like flip=False
    mel = metrics.average_edge_length(points, nbh)
    noisy = noise_mod.generate_noise(key, points, gt_n, noise_level, mel)
    nbh2, _ = knn(noisy, k, exclude_self=True)
    noisy_n = orient_normals(noisy, pvt_normals(noisy, nbh2), nbh2)
    return noisy, noisy_n, gt_n


@functools.partial(jax.jit, static_argnames=("k", "cap"))
def laplacian_neighborhood(points: jnp.ndarray, k: int = 12, cap: Optional[int] = None):
    """Symmetrized kNN graph + lumped masses — the TPU-native stand-in
    for the robust point-cloud-Laplacian connectivity the reference
    attaches to its graph (GraphBuilder.setTriangleGraphWithFlippedNormals
    / getLaplacianEdgeIndex, GraphBuilder.py:54-70).

    The reference builds edges and a lumped mass matrix on the host via
    robust_laplacian (local Delaunay tufting). The dense static-shape
    equivalent is the union-symmetrized kNN graph: j ~ i iff
    j in kNN(i) or i in kNN(j), so every edge is bidirectional like a
    Laplacian stencil; the lumped mass is the k-th-NN-radius area
    estimate (pi r_k^2 / k, core/patches.point_masses, which replaces
    the same robust_laplacian mass at Selector.py:249-262). Reverse
    edges beyond ``cap`` (default 2k) slots per point are dropped —
    rare on surface-sampled clouds where in-degree concentrates near k.

    Returns (Neighborhood (N, cap), mass (N,)).
    """
    from .patches import point_masses

    if cap is None:
        cap = 2 * k
    n = points.shape[0]
    nbh, dists = knn(points, k, exclude_self=True)
    idx32 = nbh.idx.astype(jnp.int32)
    # Reverse edges: group the flat (src -> tgt) list by tgt via sort,
    # then slot each source at its rank within the group.
    flat_t = jnp.where(nbh.mask, idx32, n).reshape(-1)
    flat_s = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], (n, k)
    ).reshape(-1)
    order = jnp.argsort(flat_t, stable=True)
    st = flat_t[order]
    ss = flat_s[order]
    rank = jnp.arange(n * k, dtype=jnp.int32) - jnp.searchsorted(
        st, st, side="left"
    ).astype(jnp.int32)
    rev_idx = jnp.zeros((n, cap), jnp.int32).at[st, rank].set(ss, mode="drop")
    rev_mask = jnp.zeros((n, cap), bool).at[st, rank].set(True, mode="drop")
    # Union forward + reverse, dedup by sorting (k_ring's idiom).
    both = jnp.concatenate([jnp.where(nbh.mask, idx32, n), jnp.where(rev_mask, rev_idx, n)], axis=1)
    sorted_ids = jnp.sort(both, axis=1)
    first = jnp.concatenate(
        [jnp.ones((n, 1), bool), sorted_ids[:, 1:] != sorted_ids[:, :-1]], axis=1
    ) & (sorted_ids < n)
    slot = jnp.where(first, jnp.cumsum(first, axis=1) - 1, cap)
    rows = jnp.arange(n)[:, None]
    out_idx = jnp.zeros((n, cap), jnp.int32).at[rows, slot].set(sorted_ids, mode="drop")
    out_mask = jnp.zeros((n, cap), bool).at[rows, slot].set(first, mode="drop")
    return Neighborhood(idx=out_idx, mask=out_mask), point_masses(dists, k)


def k_ring(nbh: Neighborhood, rings: int, cap: int = 64) -> Neighborhood:
    """r-ring neighborhoods over the kNN graph.

    Replaces Selector.getVectorizedKRing / getSparseVectorizedKRing
    (Selector.py:147-203), which grow ragged BFS frontiers with python
    batching or sparse matrix powers. Here ring expansion is iterated
    dense index composition: ring r+1's candidates are the neighbors of
    ring r's members, deduplicated into a fixed ``cap``-wide slot array.
    Exact while the true ring size stays within ``cap``.
    """
    n, k = nbh.idx.shape
    idx = jnp.where(nbh.mask, nbh.idx, jnp.arange(n, dtype=nbh.idx.dtype)[:, None])
    cur_idx, cur_mask = idx, nbh.mask
    for _ in range(rings - 1):
        # Candidates: neighbors of current members -> (N, cur*k).
        cand = idx[cur_idx].reshape(n, -1)
        cand_mask = (nbh.mask[cur_idx] & cur_mask[..., None]).reshape(n, -1)
        both = jnp.concatenate([cur_idx, cand], axis=1)
        both_mask = jnp.concatenate([cur_mask, cand_mask], axis=1)
        # Dedup by sorting; invalid slots pushed to the end as n.
        key = jnp.where(both_mask, both, n)
        order = jnp.argsort(key, axis=1)
        sorted_ids = jnp.take_along_axis(key, order, axis=1)
        first = jnp.concatenate(
            [jnp.ones((n, 1), bool), sorted_ids[:, 1:] != sorted_ids[:, :-1]],
            axis=1,
        ) & (sorted_ids < n)
        # Compact the unique members into cap slots.
        rank = jnp.cumsum(first, axis=1) - 1
        slot = jnp.where(first & (rank < cap), rank, cap)
        out_idx = jnp.zeros((n, cap + 1), nbh.idx.dtype)
        out_idx = out_idx.at[jnp.arange(n)[:, None], slot].set(sorted_ids)
        out_mask = jnp.zeros((n, cap + 1), bool)
        out_mask = out_mask.at[jnp.arange(n)[:, None], slot].set(first)
        cur_idx = out_idx[:, :cap]
        cur_mask = out_mask[:, :cap]
    return Neighborhood(idx=jnp.where(cur_mask, cur_idx, 0), mask=cur_mask)
