"""Normal estimation and consistent orientation.

PVT normal estimation is the eigenvector of the smallest eigenvalue of
the local neighbor covariance (GraphBuilder.getPVTDecompositionWithKNN,
GraphBuilder.py:99-111), rebuilt as masked (N, k) reductions + the
closed-form eigh.

Orientation: the reference builds a Kruskal MST over edge cost
1 - |ni.nj| in a Python loop and recursively DFS-flips normals from the
max-z vertex with threshold cos(7/12 pi) (GraphBuilder.py:129-209) — a
strictly sequential algorithm. The TPU-native replacement is iterative
wavefront sign propagation: starting from the max-z seed, every
unvisited point adjacent to the visited set adopts the sign that aligns
it with the confidence-weighted vote of its visited neighbors. Each
sweep is one masked (N, k) reduction inside a lax.while_loop; sweeps ~
graph diameter. Sign-invariant metrics are unaffected; parity with the
MST/DFS result is tested on analytic fixtures. The exact host-side
MST+DFS is kept (numpy, iterative) for small-cloud golden tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.eigh3 import eigh3x3
from ..ops.neighbors import Neighborhood, outer3

# cos(7/12 * pi): flip when alignment falls below this (GraphBuilder.py:187).
FLIP_THRESHOLD = float(np.cos(7.0 / 12.0 * np.pi))


def pvt_decomposition(points: jnp.ndarray, nbh: Neighborhood):
    """Eigendecomposition of the neighbor covariance per point.

    Mirrors GraphBuilder.getPVTDecompositionWithKNN (GraphBuilder.py:99-111):
    covariance of neighbors about their own mean (biased toward the
    neighborhood, not the query).
    """
    vj = nbh.gather(points)  # (N, k, 3)
    center = nbh.mean(vj)  # (N, 3)
    dv = vj - center[:, None, :]
    cov = nbh.sum(outer3(dv, dv))  # (N, 3, 3)
    return eigh3x3(cov)


def pvt_normals(points: jnp.ndarray, nbh: Neighborhood) -> jnp.ndarray:
    """Unit normals = smallest-eigenvalue eigenvector (GraphBuilder.py:95-97)."""
    _, eigvec = pvt_decomposition(points, nbh)
    return eigvec[..., :, 0]


def tangent_basis(points: jnp.ndarray, nbh: Neighborhood):
    """Per-point orthonormal frame (normal, x_basis, y_basis).

    The reference exposes this through DeltaConv's estimate_basis
    (GraphBuilder.getDeltaconvCoordinates / setNormalsDeltaconv,
    GraphBuilder.py:84-96): PCA of the kNN neighborhood yields the
    normal (smallest-eigenvalue eigenvector) plus the dominant tangent
    direction. Both fall out of the same closed-form eigh used by
    pvt_normals; the frame is completed right-handed with a cross
    product (so det[n | t1 | t2] = +1).

    Returns (normal, x_basis, y_basis), each (N, 3) unit vectors.
    """
    _, eigvec = pvt_decomposition(points, nbh)
    nrm = eigvec[..., :, 0]
    t1 = eigvec[..., :, 2]  # largest-eigenvalue direction
    t2 = jnp.cross(nrm, t1)
    t2 = t2 / jnp.maximum(jnp.linalg.norm(t2, axis=-1, keepdims=True), 1e-12)
    return nrm, t1, t2


@functools.partial(jax.jit, static_argnames=("max_sweeps",))
def orient_normals(
    points: jnp.ndarray,
    normals: jnp.ndarray,
    nbh: Neighborhood,
    max_sweeps: int = 0,
) -> jnp.ndarray:
    """Consistently orient normals by wavefront sign propagation.

    Seed: the max-z point, forced to n_z >= 0 (GraphBuilder.py:205-209).
    Each sweep, every unvisited point with at least one visited neighbor
    takes sign = sign(sum_j visited_j * w_ij * (ni.nj)) with confidence
    weight w_ij = |ni.nj|. Runs until the visited set stops growing (or
    max_sweeps). Points in disconnected components keep their sign.
    """
    n = points.shape[0]
    if max_sweeps <= 0:
        max_sweeps = 4 * int(np.ceil(np.sqrt(n))) + 16

    seed = jnp.argmax(jnp.where(jnp.isfinite(points[:, 2]), points[:, 2], -jnp.inf))
    sign0 = jnp.ones(n, dtype=points.dtype)
    sign0 = sign0.at[seed].set(jnp.where(normals[seed, 2] < 0, -1.0, 1.0))
    visited0 = jnp.zeros(n, dtype=bool).at[seed].set(True)

    dots = jnp.sum(nbh.gather(normals) * normals[:, None, :], axis=-1)  # (N,k)
    conf = jnp.abs(dots)

    def cond(state):
        visited, _, grew, sweeps = state
        return jnp.logical_and(grew, sweeps < max_sweeps)

    def body(state):
        visited, sign, _, sweeps = state
        vis_j = visited[nbh.idx] & nbh.mask  # (N, k)
        vote = jnp.sum(
            jnp.where(vis_j, conf * dots * sign[nbh.idx], 0.0), axis=1
        )
        frontier = (~visited) & (jnp.sum(vis_j, axis=1) > 0)
        new_sign = jnp.where(frontier, jnp.where(vote < 0, -sign, sign), sign)
        new_visited = visited | frontier
        grew = jnp.any(frontier)
        return new_visited, new_sign, grew, sweeps + 1

    _, sign, _, _ = jax.lax.while_loop(
        cond, body, (visited0, sign0, jnp.asarray(True), jnp.asarray(0))
    )
    return normals * sign[:, None]


def orient_normals_mst(
    points: np.ndarray, normals: np.ndarray, idx: np.ndarray
) -> np.ndarray:
    """Host-side exact MST + DFS orientation for golden tests.

    Faithful semantics of GraphBuilder.flipNormals (GraphBuilder.py:129-209):
    Kruskal over edge cost 1 - |ni.nj|, then DFS from the max-z vertex
    flipping a neighbor when (n_src . n_dest) < cos(7/12 pi). Iterative
    stack instead of recursion; numpy only (small clouds).
    """
    points = np.asarray(points)
    normals = np.asarray(normals).copy()
    idx = np.asarray(idx)
    n, k = idx.shape
    # Undirected candidate edges (i, j) from the kNN graph.
    src = np.repeat(np.arange(n), k)
    dst = idx.reshape(-1)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    cost = 1.0 - np.abs(np.sum(normals[src] * normals[dst], axis=1))
    order = np.argsort(cost, kind="stable")

    parent = np.arange(n)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    adj: list[list[int]] = [[] for _ in range(n)]
    for e in order:
        a, b = int(src[e]), int(dst[e])
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            adj[a].append(b)
            adj[b].append(a)

    start = int(np.argmax(points[:, 2]))
    if normals[start, 2] < 0:
        normals[start] *= -1
    visited = np.zeros(n, dtype=bool)
    stack = [start]
    visited[start] = True
    while stack:
        srcn = stack.pop()
        for destn in adj[srcn]:
            if not visited[destn]:
                visited[destn] = True
                if float(np.dot(normals[srcn], normals[destn])) < FLIP_THRESHOLD:
                    normals[destn] *= -1
                stack.append(destn)
    return normals
