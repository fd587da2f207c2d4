"""Tensor voting, eigenanalysis and feature classification.

Rebuilds Pointcloud/Modules/Decompositionor.py as pure functions over
dense (N, k) neighborhoods. Eigen conventions: ascending eigenvalues,
eigenvectors in columns — identical to torch.linalg.eigh, so indexing
parity with the reference holds (e.g. ``eigvec[..., 0]`` is the
smallest-eigenvalue eigenvector used as the edge direction at
Processor.py:134,159).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from ..ops.eigh3 import eigh3x3
from ..ops.neighbors import Neighborhood, normalize, outer3

FACE, EDGE, CORNER = 0, 1, 2


class Decomposition(NamedTuple):
    """Eigenpairs of per-point 3x3 voting tensors
    (Decompositionor.py:25-55)."""

    eigval: jnp.ndarray  # (N, 3) ascending
    eigvec: jnp.ndarray  # (N, 3, 3) columns


# ---------------------------------------------------------------------------
# Decomposition-derived features
# ---------------------------------------------------------------------------


def nvt_features(d: Decomposition):
    """(planarity, linearity, sphericity) from sorted eigenvalues
    (Decompositionor.py:57-63)."""
    lam1 = d.eigval[:, 2]  # largest
    lam2 = d.eigval[:, 1]
    lam3 = d.eigval[:, 0]  # smallest
    safe = jnp.where(jnp.abs(lam1) > 1e-30, lam1, 1e-30)
    linearity = (lam2 - lam3) / safe
    planarity = (lam1 - lam2) / safe
    sphericity = lam3 / safe
    return planarity, linearity, sphericity


def classes(d: Decomposition, scale: float = 0.2) -> jnp.ndarray:
    """argmax of [scale*planarity, linearity, sphericity] ->
    {0: face, 1: edge, 2: corner} (Decompositionor.py:65-69)."""
    planarity, linearity, sphericity = nvt_features(d)
    feats = jnp.stack([planarity * scale, linearity, sphericity], axis=1)
    return jnp.argmax(feats, axis=1).astype(jnp.int32)


def md_features(d: Decomposition) -> jnp.ndarray:
    """Eigenvalue-threshold classes {0: none, 1: flat, 2: edge, 3: corner}
    (Decompositionor.py:71-82). Applied in the reference's write order so
    overlapping predicates resolve identically (corner wins)."""
    desc = d.eigval[:, ::-1]  # descending
    e1, e2 = desc[:, 1], desc[:, 2]
    char = jnp.zeros(d.eigval.shape[0], dtype=jnp.int32)
    char = jnp.where((e1 < 0.01) & (e2 < 0.001), 1, char)
    char = jnp.where((e1 > 0.01) & (e2 < 0.1), 2, char)
    char = jnp.where(e2 > 0.1, 3, char)
    return char


def vu_features(d: Decomposition, tau: float) -> jnp.ndarray:
    """(eigval < tau).sum % 3 (Decompositionor.py:84-85)."""
    return jnp.sum((d.eigval < tau).astype(jnp.int32), axis=1) % 3


def better_vu_features(
    d: Decomposition, mean_graph_edge_length: jnp.ndarray, k: int = 6
) -> jnp.ndarray:
    """tau = 16/k * l^2 variant (Decompositionor.py:87-90)."""
    tau = 16.0 / k * mean_graph_edge_length**2
    return jnp.sum((d.eigval < tau).astype(jnp.int32), axis=1) % 3


def vu_smoothed_normals(
    d: Decomposition, n: jnp.ndarray, tau: float = 0.3, damping: float = 3.0
) -> jnp.ndarray:
    """Project normals onto dominant eigenvectors and renormalize
    (Decompositionor.py:92-106):
    n' = normalize(d*n + sum_i [lam_i > tau] (e_i . n) e_i).
    """
    # Descending order to match the reference's sort (the set of kept
    # eigenvectors is order-independent, kept for clarity).
    lam = d.eigval[:, ::-1]  # (N, 3) desc
    vecs = jnp.flip(d.eigvec, axis=2)  # columns desc
    keep = (lam > tau).astype(n.dtype)  # (N, 3)
    proj = jnp.sum(vecs * n[:, :, None], axis=1)  # (N, 3) e_i . n per column
    contrib = jnp.sum((keep * proj)[:, None, :] * vecs, axis=2)  # (N, 3)
    out = damping * n + contrib
    return normalize(out)


def r_inv(d: Decomposition, n: jnp.ndarray) -> jnp.ndarray:
    """Patch-alignment rotation R^{-1} (Decompositionor.py:108-127).

    Rows of R are the eigenvectors sorted by DESCENDING eigenvalue; the
    first row's sign is fixed to the point normal, then det(R) < 0 flips
    the last row; returned transposed (= inverse, R orthogonal).
    """
    # R rows = descending eigenvectors = transpose with columns flipped.
    rows = jnp.flip(jnp.swapaxes(d.eigvec, 1, 2), axis=1)  # (N, 3rows, 3)
    sign0 = jnp.where(jnp.sum(rows[:, 0, :] * n, axis=1) < 0, -1.0, 1.0)
    rows = rows * sign0[:, None, None]
    det = jnp.linalg.det(rows)
    flip2 = jnp.where(det < 0, -1.0, 1.0)
    rows = rows.at[:, 2, :].multiply(flip2[:, None])
    return jnp.swapaxes(rows, 1, 2)


# ---------------------------------------------------------------------------
# Voting-tensor builders
# ---------------------------------------------------------------------------


def pvt(
    points: jnp.ndarray,
    nbh: Neighborhood,
    src_points: Optional[jnp.ndarray] = None,
) -> Decomposition:
    """Plain neighbor covariance (Decompositionor.py:239-246).

    ``src_*`` arguments (here and below) let sharded callers gather from
    the FULL replicated arrays while the positional arrays hold only the
    local query rows; they default to the query arrays.
    """
    vj = nbh.gather(points if src_points is None else src_points)
    center = nbh.mean(vj)
    dv = vj - center[:, None, :]
    dv = jnp.where(nbh.mask[..., None], dv, 0.0)
    # Batched (3,k)@(k,3) rides the MXU and never materializes (N,k,3,3).
    cov = jnp.einsum("nki,nkj->nij", dv, dv)
    return Decomposition(*eigh3x3(cov))


def nvt(
    nbh: Neighborhood,
    n: jnp.ndarray,
    src_normals: Optional[jnp.ndarray] = None,
) -> Decomposition:
    """Mean outer product of neighbor normals (Decompositionor.py:248-258)."""
    nj = nbh.gather(n if src_normals is None else src_normals)
    w = nbh.mask.astype(nj.dtype)
    t = jnp.einsum("nki,nkj->nij", nj * w[..., None], nj)
    t = t / jnp.maximum(nbh.degree(), 1.0)[:, None, None]
    return Decomposition(*eigh3x3(t))


def _acos_dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.arccos(jnp.clip(jnp.sum(a * b, axis=-1), -1.0, 1.0))


def normal_filtered_nvt(
    nbh: Neighborhood,
    n: jnp.ndarray,
    rho: float = 0.9,
    src_normals: Optional[jnp.ndarray] = None,
) -> Decomposition:
    """NVT with binary weight acos(ni.nj) <= rho; zero-weight rows fall
    back to the own-normal tensor ni ni^T (Decompositionor.py:260-276)."""
    nj = nbh.gather(n if src_normals is None else src_normals)
    w = (_acos_dot(n[:, None, :], nj) <= rho) & nbh.mask
    wsum = jnp.sum(w, axis=1).astype(n.dtype)
    t = jnp.einsum("nki,nkj->nij", nj * w[..., None].astype(nj.dtype), nj)
    t = t / jnp.maximum(wsum, 1.0)[:, None, None]
    rescue = outer3(n, n)
    t = jnp.where((wsum == 0)[:, None, None], rescue, t)
    return Decomposition(*eigh3x3(t))


def better_filtered_nvt(
    points: jnp.ndarray,
    nbh: Neighborhood,
    n: jnp.ndarray,
    rho: float = 0.9,
    src_points: Optional[jnp.ndarray] = None,
    src_normals: Optional[jnp.ndarray] = None,
) -> Decomposition:
    """NVT weighted by acos(|normalize(vj-vi) . nj|) > rho; rows whose
    weights all vanish get every weight reset to 1
    (Decompositionor.py:278-300, rescue at 292-296)."""
    vj = nbh.gather(points if src_points is None else src_points)
    dv = normalize(vj - points[:, None, :])
    nj = nbh.gather(n if src_normals is None else src_normals)
    ang = jnp.arccos(jnp.clip(jnp.abs(jnp.sum(dv * nj, axis=-1)), -1.0, 1.0))
    w = (ang > rho) & nbh.mask
    wsum = jnp.sum(w, axis=1)
    # Zero-weight rescue: all valid neighbors get weight 1.
    w = jnp.where((wsum == 0)[:, None], nbh.mask, w)
    wsum = jnp.sum(w, axis=1).astype(n.dtype)
    t = jnp.einsum("nki,nkj->nij", nj * w[..., None].astype(nj.dtype), nj)
    t = t / jnp.maximum(wsum, 1.0)[:, None, None]
    return Decomposition(*eigh3x3(t))


def normal_filtered_pvt(
    points: jnp.ndarray,
    nbh: Neighborhood,
    n: jnp.ndarray,
    rho: float = 0.9,
    src_points: Optional[jnp.ndarray] = None,
    src_normals: Optional[jnp.ndarray] = None,
) -> Decomposition:
    """Weighted covariance about the weighted neighbor mean
    (Decompositionor.py:172-211), weight acos(ni.nj) <= rho; zero-weight
    rows rebuilt from the analytic cross-sample tensor
    (Decompositionor.py:201-209)."""
    vj = nbh.gather(points if src_points is None else src_points)
    nj = nbh.gather(n if src_normals is None else src_normals)
    w = (_acos_dot(n[:, None, :], nj) <= rho) & nbh.mask
    wsum0 = jnp.sum(w, axis=1)
    # First rescue (Decompositionor.py:188-192): rows with zero weight get
    # every valid neighbor weight set to 1.
    w = jnp.where((wsum0 == 0)[:, None], nbh.mask, w)
    wf = w.astype(points.dtype)
    wsum = jnp.sum(wf, axis=1)
    center = jnp.sum(wf[..., None] * vj, axis=1) / jnp.maximum(wsum, 1.0)[:, None]
    dv = vj - center[:, None, :]
    t = jnp.einsum("nki,nkj->nij", dv * wf[..., None], dv)
    t = t / jnp.maximum(wsum, 1.0)[:, None, None]
    # Second rescue (Decompositionor.py:201-209): still-empty rows (no
    # valid neighbors at all) get the tensor spanned by +-cross samples.
    s1 = jnp.cross(n, points)
    s2 = jnp.cross(n, s1)
    rescue = 2.0 * (outer3(s1, s1) + outer3(s2, s2))
    t = jnp.where((wsum == 0)[:, None, None], rescue, t)
    return Decomposition(*eigh3x3(t))


def better_filtered_pvt(
    points: jnp.ndarray,
    nbh: Neighborhood,
    n: jnp.ndarray,
    rho: float = 0.9,
    src_points: Optional[jnp.ndarray] = None,
    src_normals: Optional[jnp.ndarray] = None,
) -> Decomposition:
    """Covariance weighted by acos(|normalize(dv) . nj|) > rho
    (Decompositionor.py:213-237). The reference divides by a possibly-zero
    weight sum (no rescue, NaNs downstream); here zero-weight rows fall
    back to all-ones weights — a deliberate, documented fix."""
    vj = nbh.gather(points if src_points is None else src_points)
    dv = normalize(vj - points[:, None, :])
    nj = nbh.gather(n if src_normals is None else src_normals)
    ang = jnp.arccos(jnp.clip(jnp.abs(jnp.sum(dv * nj, axis=-1)), -1.0, 1.0))
    w = (ang > rho) & nbh.mask
    wsum0 = jnp.sum(w, axis=1)
    w = jnp.where((wsum0 == 0)[:, None], nbh.mask, w)
    wf = w.astype(points.dtype)
    wsum = jnp.sum(wf, axis=1)
    center = jnp.sum(wf[..., None] * vj, axis=1) / jnp.maximum(wsum, 1.0)[:, None]
    dvc = vj - center[:, None, :]
    t = jnp.einsum("nki,nkj->nij", dvc * wf[..., None], dvc)
    t = t / jnp.maximum(wsum, 1.0)[:, None, None]
    return Decomposition(*eigh3x3(t))


def md_transformation(
    points: jnp.ndarray,
    nbh: Neighborhood,
    n: jnp.ndarray,
    mass: jnp.ndarray,
    sigma_inv: float = 3.0,
    src_points: Optional[jnp.ndarray] = None,
    src_normals: Optional[jnp.ndarray] = None,
):
    """The paper's patch voting tensor (Decompositionor.py:136-170).

    Per query i over neighbors j: scale the patch to unit radius
    (1/max||dv||), reflect neighbor normals about the plane spanned by
    dv — n' = 2(n.w)w - n with w = normalize((dv x n) x dv) — weight by
    mu = (area/maxArea) * exp(-3||dv||), sum outer products, eigh.

    Returns (Decomposition, scale_factors (N,)).
    """
    vj = nbh.gather(points if src_points is None else src_points)
    dv = vj - points[:, None, :]
    dist = jnp.linalg.norm(dv, axis=-1)
    max_dist = jnp.max(jnp.where(nbh.mask, dist, 0.0), axis=1)
    scale = 1.0 / jnp.maximum(max_dist, 1e-30)
    dv_s = dv * scale[:, None, None]
    nj = nbh.gather(n if src_normals is None else src_normals)
    w = normalize(jnp.cross(jnp.cross(dv_s, nj), dv_s))
    nj_ref = 2.0 * jnp.sum(nj * w, axis=-1, keepdims=True) * w - nj
    areas = nbh.gather(mass) * (scale**2)[:, None]
    max_area = jnp.max(jnp.where(nbh.mask, areas, 0.0), axis=1)
    ddcs = jnp.linalg.norm(dv_s, axis=-1)
    mu = (areas / jnp.maximum(max_area, 1e-30)[:, None]) * jnp.exp(
        -ddcs * sigma_inv
    )
    mu = jnp.where(nbh.mask, mu, 0.0)
    t = jnp.einsum("nki,nkj->nij", nj_ref * mu[..., None], nj_ref)
    return Decomposition(*eigh3x3(t)), scale


# FeatureDetection.ipynb cell 3 calls Decomposition.getVUFilteredNormals,
# a symbol that does not exist in the reference modules (drift). The
# intended operation — shown by the equivalent getMyFeatureDecomposition
# chain (Processor.py:110-117) — is VU smoothing of the normals.
vu_filtered_normals = vu_smoothed_normals
