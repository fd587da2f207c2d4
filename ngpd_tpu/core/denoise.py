"""Class-specific normal-guided vertex update steps.

Rebuilds Pointcloud/Modules/Denoiser.py. Every step has the same shape:
assemble one 3x3 normal-equation system per point from gathered neighbor
normals, solve (keeping the old position when singular — the inv_ex
info-mask semantics, Denoiser.py:43-46), damp the displacement by alpha
and reject it entirely when its norm reaches the threshold ``d``
(Denoiser.py:47-50).

TPU-first difference: the reference filters the CSR selection per class
and runs each step on a ragged subset (Processor.py:127-138). Here every
step evaluates for ALL points as dense masked (N, k) reductions and the
driver selects per point with ``jnp.where`` over the class id — data
dispatch instead of control flow, so the whole iteration jits into one
fused program.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..ops.neighbors import Neighborhood, matvec3, outer3
from ..ops.solve3 import solve3x3_guarded


def _clamp_step(
    vi: jnp.ndarray, opt: jnp.ndarray, alpha: float, d: jnp.ndarray, strict: bool
) -> jnp.ndarray:
    """di = (opt - vi) * alpha; keep vi when ||di|| >= d
    (Denoiser.py:47-50; flat_step uses <= at Denoiser.py:117)."""
    di = (opt - vi) * alpha
    norm = jnp.linalg.norm(di, axis=-1)
    ok = norm < d if strict else norm <= d
    return jnp.where(ok[:, None], vi + di, vi)


def corner_step(
    points: jnp.ndarray,
    nbh: Neighborhood,
    n: jnp.ndarray,
    d: jnp.ndarray,
    alpha: float = 0.1,
    src_points: Optional[jnp.ndarray] = None,
    src_normals: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Solve (sum nj nj^T) v = sum (nj nj^T) vj (Denoiser.py:26-51).

    ``src_*`` (here and in the other steps) are the gather sources for
    sharded callers whose row arrays hold only local queries; they
    default to the query arrays.
    """
    vj = nbh.gather(points if src_points is None else src_points)
    nj = nbh.gather(n if src_normals is None else src_normals)
    m = nbh.mask.astype(nj.dtype)[..., None]
    njm = nj * m
    # a = sum nj nj^T, b = sum nj (nj . vj) — batched matmuls, no
    # (N, k, 3, 3) intermediate.
    a = jnp.einsum("nki,nkj->nij", njm, nj)
    b = jnp.einsum("nki,nk->ni", njm, jnp.sum(nj * vj, axis=-1))
    opt, _ = solve3x3_guarded(a, b, points)
    return _clamp_step(points, opt, alpha, d, strict=True)


def edge_step(
    points: jnp.ndarray,
    nbh: Neighborhood,
    n: jnp.ndarray,
    edge_vectors: jnp.ndarray,
    d: jnp.ndarray,
    alpha: float = 0.1,
    src_points: Optional[jnp.ndarray] = None,
    src_normals: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Corner solve with positions/normals projected off the edge
    direction plus an edge-pinning term (Denoiser.py:53-88).

    ``edge_vectors`` is the smallest-eigenvalue NVT eigenvector
    (eigvec[..., 0] at Processor.py:134,159) — the direction normals vary
    least along, i.e. the crease direction.
    """
    y = edge_vectors  # (N, 3)
    vi = points
    vj = nbh.gather(points if src_points is None else src_points)
    nj = nbh.gather(n if src_normals is None else src_normals)
    yk = y[:, None, :]
    vj_pi = vj - jnp.sum((vj - vi[:, None, :]) * yk, axis=-1, keepdims=True) * yk
    nj_pi = nj - jnp.sum(nj * yk, axis=-1, keepdims=True) * yk
    m = nbh.mask.astype(nj.dtype)
    deg = jnp.sum(m, axis=1)
    njm = nj_pi * m[..., None]
    y_o = outer3(y, y)  # (N, 3, 3)
    a = jnp.einsum("nki,nkj->nij", njm, nj_pi) + deg[:, None, None] * y_o
    b = (
        jnp.einsum("nki,nk->ni", njm, jnp.sum(nj_pi * vj_pi, axis=-1))
        + deg[:, None] * matvec3(y_o, vi)
    )
    opt, _ = solve3x3_guarded(a, b, points)
    return _clamp_step(points, opt, alpha, d, strict=True)


def flat_step(
    points: jnp.ndarray,
    nbh: Neighborhood,
    n: jnp.ndarray,
    d: jnp.ndarray,
    alpha: float = 0.1,
    delta: jnp.ndarray | None = None,
    src_points: Optional[jnp.ndarray] = None,
    src_normals: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Bilateral normal-position weighting (Denoiser.py:90-119):
    Wij = exp(-16||ni-nj||^2/delta^2) * exp(-4||vj-vi||^2/delta^2),
    di = sum Wij (nj.(vj-vi)) ni / sum Wij * alpha.

    ``delta`` is the reference's global neighbor-spread scale (max
    distance of gathered neighbors from their global mean,
    Denoiser.py:106-107); the driver precomputes it per class subset.
    """
    vj = nbh.gather(points if src_points is None else src_points)
    nj = nbh.gather(n if src_normals is None else src_normals)
    dist = vj - points[:, None, :]
    if delta is None:
        w = nbh.mask.astype(points.dtype)[..., None]
        center = jnp.sum(vj * w, axis=(0, 1)) / jnp.maximum(jnp.sum(w), 1.0)
        delta = jnp.max(
            jnp.where(nbh.mask, jnp.linalg.norm(vj - center, axis=-1), 0.0)
        )
    d2 = jnp.maximum(delta**2, 1e-30)
    similarity = jnp.exp(
        -16.0 * jnp.sum((n[:, None, :] - nj) ** 2, axis=-1) / d2
    )
    closeness = jnp.exp(-4.0 * jnp.sum(dist**2, axis=-1) / d2)
    wij = jnp.where(nbh.mask, similarity * closeness, 0.0)
    dot = jnp.sum(nj * dist, axis=-1)
    summed = jnp.sum((wij * dot)[..., None] * n[:, None, :], axis=1)
    wsum = jnp.sum(wij, axis=1)
    di = summed / jnp.maximum(wsum, 1e-30)[:, None] * alpha
    norm = jnp.linalg.norm(di, axis=-1)
    di = jnp.where((norm <= d)[:, None], di, 0.0)
    return points + di


def _three_term_system(
    points: jnp.ndarray,
    nbh: Neighborhood,
    n: jnp.ndarray,
    wij: jnp.ndarray,
    src_points: Optional[jnp.ndarray] = None,
    src_normals: Optional[jnp.ndarray] = None,
):
    """Shared assembly of feature/new steps (Denoiser.py:144-162,191-209):
    A = (I + ni ni^T) + sum_j w_ij nj nj^T + |N(i)| ni ni^T
    b = (vi + ni ni^T vi) + ni ni^T sum_j w_ij vj + sum_j w_ij nj nj^T vj
    with unit term weights w0 = w1 = w2 = 1.
    """
    vi = points
    vj = nbh.gather(points if src_points is None else src_points)
    nj = nbh.gather(n if src_normals is None else src_normals)
    ni_o = outer3(n, n)  # (N, 3, 3)
    w = jnp.where(nbh.mask, wij, 0.0)
    njw = nj * w[..., None]
    summed_nj_o = jnp.einsum("nki,nkj->nij", njw, nj)
    # Cardinality is the reference's slice length — the raw neighbor count
    # of the selection (Denoiser.py:148,204), NOT weighted.
    cardinality = nbh.degree()
    summed_nj_o_vj = jnp.einsum("nki,nk->ni", njw, jnp.sum(nj * vj, axis=-1))
    summed_vj = jnp.sum(w[..., None] * vj, axis=1)
    eye = jnp.eye(3, dtype=points.dtype)
    a = eye[None] + ni_o + summed_nj_o + cardinality[:, None, None] * ni_o
    b = vi + matvec3(ni_o, vi) + matvec3(ni_o, summed_vj) + summed_nj_o_vj
    return a, b


def feature_step(
    points: jnp.ndarray,
    nbh: Neighborhood,
    n: jnp.ndarray,
    d: jnp.ndarray,
    alpha: float = 0.1,
    src_points: Optional[jnp.ndarray] = None,
    src_normals: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Unweighted three-term system (Denoiser.py:174-219)."""
    a, b = _three_term_system(
        points, nbh, n, jnp.ones(nbh.mask.shape, points.dtype),
        src_points, src_normals,
    )
    opt, _ = solve3x3_guarded(a, b, points)
    return _clamp_step(points, opt, alpha, d, strict=True)


def new_step(
    points: jnp.ndarray,
    nbh: Neighborhood,
    n: jnp.ndarray,
    d: jnp.ndarray,
    alpha: float = 0.1,
    delta: jnp.ndarray | None = None,
    src_points: Optional[jnp.ndarray] = None,
    src_normals: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """feature_step with the 'likeliness' weight
    w_ij = exp(-9 (nj.(vj-vi))^2 / delta^2) (Denoiser.py:121-172, weight
    defined at 141)."""
    vj = nbh.gather(points if src_points is None else src_points)
    nj = nbh.gather(n if src_normals is None else src_normals)
    if delta is None:
        w = nbh.mask.astype(points.dtype)[..., None]
        center = jnp.sum(vj * w, axis=(0, 1)) / jnp.maximum(jnp.sum(w), 1.0)
        delta = jnp.max(
            jnp.where(nbh.mask, jnp.linalg.norm(vj - center, axis=-1), 0.0)
        )
    d2 = jnp.maximum(delta**2, 1e-30)
    plane_dist = jnp.sum(nj * (vj - points[:, None, :]), axis=-1)
    likeliness = jnp.exp(-9.0 * plane_dist**2 / d2)
    a, b = _three_term_system(points, nbh, n, likeliness, src_points, src_normals)
    opt, _ = solve3x3_guarded(a, b, points)
    return _clamp_step(points, opt, alpha, d, strict=True)


def dummy_step(
    points: jnp.ndarray,
    nbh: Neighborhood,
    n: jnp.ndarray,
    d: jnp.ndarray,
    alpha: float = 0.1,
) -> jnp.ndarray:
    """Identity (Denoiser.py:221-232)."""
    del nbh, n, d, alpha
    return points
