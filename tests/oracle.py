"""Independent float64 numpy oracle of the classical pipeline math.

Written directly from the algorithm definitions (voting weights,
VU smoothing, per-class solves) in ragged per-point loops — deliberately
the OPPOSITE shape of the (N, k) vectorized JAX code — so agreement
between the two is strong evidence both implement the same math.
scipy KDTree provides the include-self kNN semantics of
Selector.getKNNSelection (Selector.py:235-246).
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import KDTree


def knn_with_self(points: np.ndarray, k: int) -> np.ndarray:
    return KDTree(points).query(points, k=k)[1]


def better_filtered_nvt(points, idx, normals, rho):
    """Per-row loop twin of Decompositionor.getBetterFilteredNVT."""
    n_pts = len(points)
    eigval = np.zeros((n_pts, 3))
    eigvec = np.zeros((n_pts, 3, 3))
    for i in range(n_pts):
        js = idx[i]
        dv = points[js] - points[i]
        norms = np.linalg.norm(dv, axis=1, keepdims=True)
        dvn = np.divide(dv, np.maximum(norms, 1e-12), where=norms > 0)
        dvn[norms[:, 0] == 0] = 0.0
        ang = np.arccos(np.clip(np.abs(np.sum(dvn * normals[js], axis=1)), -1, 1))
        w = (ang > rho).astype(float)
        if w.sum() == 0:
            w[:] = 1.0
        nj = normals[js]
        t = (w[:, None, None] * nj[:, :, None] * nj[:, None, :]).sum(0) / w.sum()
        vals, vecs = np.linalg.eigh(t)
        eigval[i], eigvec[i] = vals, vecs
    return eigval, eigvec


def vu_smoothed_normals(eigval, eigvec, normals, tau=0.3, damping=3.0):
    out = np.zeros_like(normals)
    for i in range(len(normals)):
        order = np.argsort(eigval[i])[::-1]
        acc = damping * normals[i]
        for o in order:
            if eigval[i][o] > tau:
                e = eigvec[i][:, o]
                acc = acc + np.dot(e, normals[i]) * e
        out[i] = acc / np.linalg.norm(acc)
    return out


def classify(eigval, scale=0.2):
    lam1, lam2, lam3 = eigval[:, 2], eigval[:, 1], eigval[:, 0]
    planarity = (lam1 - lam2) / lam1
    linearity = (lam2 - lam3) / lam1
    sphericity = lam3 / lam1
    feats = np.stack([planarity * scale, linearity, sphericity], axis=1)
    return feats.argmax(axis=1)


def _solve_or_keep(a, b, vi):
    if abs(np.linalg.det(a)) < 1e-12 * max(np.abs(a).max(), 1e-30) ** 3:
        return vi
    return np.linalg.solve(a, b)


def _clamp(vi, opt, alpha, d):
    di = (opt - vi) * alpha
    if np.linalg.norm(di) < d:
        return vi + di
    return vi


def flat_step(points, idx, rows, normals, d, alpha):
    """Row-loop twin of Denoiser.flat_step for the given class rows."""
    all_vj = points[idx[rows].reshape(-1)]
    center = all_vj.mean(axis=0)
    delta = np.linalg.norm(all_vj - center, axis=1).max()
    out = points.copy()
    for i in rows:
        js = idx[i]
        vj, nj = points[js], normals[js]
        dist = vj - points[i]
        sim = np.exp(-16 * ((normals[i] - nj) ** 2).sum(1) / delta**2)
        clo = np.exp(-4 * (dist**2).sum(1) / delta**2)
        w = sim * clo
        dot = (nj * dist).sum(1)
        di = (w * dot).sum() * normals[i] / w.sum() * alpha
        if np.linalg.norm(di) <= d:
            out[i] = points[i] + di
    return out


def edge_step(points, idx, rows, normals, edge_vectors, d, alpha):
    out = points.copy()
    for i in rows:
        js = idx[i]
        y = edge_vectors[i]
        vi = points[i]
        vj, nj = points[js], normals[js]
        vj_pi = vj - ((vj - vi) @ y)[:, None] * y
        nj_pi = nj - (nj @ y)[:, None] * y
        a = (nj_pi[:, :, None] * nj_pi[:, None, :]).sum(0) + len(js) * np.outer(y, y)
        b = np.einsum("kij,kj->i", nj_pi[:, :, None] * nj_pi[:, None, :], vj_pi) + len(
            js
        ) * np.outer(y, y) @ vi
        opt = _solve_or_keep(a, b, vi)
        out[i] = _clamp(vi, opt, alpha, d)
    return out


def feature_step(points, idx, rows, normals, d, alpha):
    out = points.copy()
    eye = np.eye(3)
    for i in rows:
        js = idx[i]
        vi = points[i]
        vj, nj = points[js], normals[js]
        ni_o = np.outer(normals[i], normals[i])
        nj_o = nj[:, :, None] * nj[:, None, :]
        a = eye + ni_o + nj_o.sum(0) + len(js) * ni_o
        b = (
            vi
            + ni_o @ vi
            + ni_o @ vj.sum(0)
            + np.einsum("kij,kj->i", nj_o, vj)
        )
        opt = _solve_or_keep(a, b, vi)
        out[i] = _clamp(vi, opt, alpha, d)
    return out


def denoise_iteration(points, normals, k_feat, k_step, d, alphas, angle, scale=0.2):
    """One full classify+update iteration, ragged-loop style."""
    idx_f = knn_with_self(points, k_feat)
    eigval1, eigvec1 = better_filtered_nvt(points, idx_f, normals, angle)
    f_n = vu_smoothed_normals(eigval1, eigvec1, normals)
    eigval2, eigvec2 = better_filtered_nvt(points, idx_f, f_n, angle)
    cls = classify(eigval2, scale)
    edge_vectors = eigvec2[:, :, 0]
    idx_s = knn_with_self(points, k_step)
    out = points.copy()
    rows0 = np.where(cls == 0)[0]
    rows1 = np.where(cls == 1)[0]
    rows2 = np.where(cls == 2)[0]
    if len(rows0):
        out[rows0] = flat_step(points, idx_s, rows0, f_n, d, alphas[0])[rows0]
    if len(rows1):
        out[rows1] = edge_step(points, idx_s, rows1, f_n, edge_vectors, d, alphas[1])[rows1]
    if len(rows2):
        out[rows2] = feature_step(points, idx_s, rows2, f_n, d, alphas[2])[rows2]
    return out, f_n, cls
