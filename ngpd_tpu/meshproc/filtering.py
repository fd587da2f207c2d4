"""Guided normal filtering + vertex updating — the C++ app's denoise
backend, TPU-rebuilt.

guided_normal_filter follows MeshNormalFiltering::
updateFilteredNormalsWithPredictedNormal (MeshNormalFiltering.cpp:
170-240): for ``normal_iterations`` rounds, every face normal becomes
the normalized area x spatial x range weighted sum over its radius
neighborhood (Gaussian weights exp(-0.5 d^2/sigma^2),
MeshNormalFiltering.cpp:97-100); the range distance always compares
GUIDANCE normals, the accumulated normal is the guidance on iteration 0
and the previous filtered normal afterwards (cpp:223-231); each round
ends with ``vertex_iterations`` position updates (cpp:239).

Differences by design: the reference collects neighborhoods by BFS over
face adjacency limited to a radius (cpp:46-95); here the neighborhood is
the centroid kNN capped by the same radius — dense (F, K) indices, one
gather per filter run (neighborhoods are built ONCE, exactly like
cpp:196-197 builds all_face_neighbor before iterating).

update_vertex_positions is the classic normal-driven vertex flow
p += mean_f n_f (n_f . (c_f - p)) (MeshDenoisingBase.cpp:107-143; the
mesh-era twin is Mesh.py:377-418).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import GNFConfig
from ..ops.knn import knn
from .trimesh import TriMesh, face_normals_areas_centroids


@functools.partial(jax.jit, static_argnames=("iterations", "fixed_boundary"))
def update_vertex_positions(
    v: jnp.ndarray,
    f: jnp.ndarray,
    vf_idx: jnp.ndarray,
    vf_mask: jnp.ndarray,
    filtered_normals: jnp.ndarray,
    iterations: int = 16,
    boundary_mask: Optional[jnp.ndarray] = None,
    fixed_boundary: bool = False,
):
    """Iterate p += mean over incident faces of n (n . (c - p))."""

    def body(pts, _):
        _, _, centroids = face_normals_areas_centroids(pts, f)
        nf = filtered_normals[vf_idx]  # (V, D, 3)
        cf = centroids[vf_idx]
        dot = jnp.sum(nf * (cf - pts[:, None, :]), axis=-1)
        # where-mask the whole contribution: a padding slot whose
        # gathered face carries non-finite data must contribute exactly
        # 0 — multiplying by a 0 mask would leave 0 * NaN = NaN.
        contrib = jnp.where(
            vf_mask[..., None], nf * dot[..., None], 0.0
        )
        m = vf_mask.astype(pts.dtype)[..., None]
        deg = jnp.maximum(jnp.sum(m, axis=1), 1.0)
        new = pts + jnp.sum(contrib, axis=1) / deg
        if fixed_boundary and boundary_mask is not None:
            new = jnp.where(boundary_mask[:, None], pts, new)
        return new, None

    out, _ = jax.lax.scan(body, v, None, length=iterations)
    return out


def _gnf_radius_sigma(
    mesh: TriMesh,
    multiple: float,
    face_mask: Optional[jnp.ndarray] = None,
):
    """Mean adjacent-centroid distance x multiple
    (MeshNormalFiltering.cpp:135-170). ``face_mask`` excludes padded
    sentinel faces (meshproc.bucketing) from the mean — real faces'
    adjacency rows only ever reference real faces, so masking rows is
    exact."""
    _, _, centroids = mesh.face_data()
    ff_idx, ff_mask = mesh.face_face_adjacency()
    d = jnp.linalg.norm(centroids[ff_idx] - centroids[:, None, :], axis=-1)
    m = ff_mask.astype(d.dtype)
    if face_mask is not None:
        fm = face_mask.astype(d.dtype)
        # mask both the row AND the referenced face: either side being
        # a padded sentinel excludes the pair from the mean.
        m = m * fm[:, None] * fm[ff_idx]
    # where-mask, not multiply: masked-out entries (padded sentinel
    # faces, meshproc.bucketing) can carry inf/NaN centroids and
    # 0 * NaN = NaN would poison the global mean.
    d = jnp.where(m > 0, d, 0.0)
    return multiple * jnp.sum(d) / jnp.maximum(jnp.sum(m), 1.0)


def guided_normal_filter(
    mesh: TriMesh,
    guidance_normals: jnp.ndarray,
    cfg: GNFConfig = GNFConfig(),
    neighbors: int = 64,
    face_mask: Optional[jnp.ndarray] = None,
    pre_nbh=None,
) -> TriMesh:
    """Denoise a mesh given per-face guidance normals (e.g. GCN
    predictions) — MeshNormalFiltering.denoiseWithPredictedNormal.

    ``pre_nbh``: optional precomputed ``(idx, mask, sqdist)`` centroid
    kNN (k = ``neighbors``) shared with patch extraction — the kNN is
    the pipeline's single most expensive op.

    Returns the mesh with updated vertex positions.
    """
    v, f = mesh.v, mesh.f
    vf_idx, vf_mask = mesh.vertex_face_adjacency()
    radius = _gnf_radius_sigma(mesh, cfg.radius_scale, face_mask)

    # Fixed neighborhoods from the INITIAL mesh (cpp:196-197).
    if pre_nbh is None:
        _, _, centroids0 = mesh.face_data()
        nbh, d2 = knn(centroids0, neighbors)
        nb_idx, nb_mask = nbh.idx, nbh.mask
    else:
        nb_idx, nb_mask, d2 = pre_nbh
    in_radius = nb_mask & (d2 <= radius**2)

    if cfg.guidance_smooth_iterations > 0:
        # Bilateral smoothing of the guidance FIELD before filtering
        # (GNFConfig docstring): area x spatial x range weights over the
        # same fixed neighborhood. The query face is its own first kNN
        # neighbor (knn defaults to exclude_self=False: d2=0, r2=0), so
        # the gathered sum already carries the self contribution with
        # weight area_i — no explicit self term.
        _, areas0, _ = mesh.face_data()
        sigma_s0 = _gnf_radius_sigma(mesh, cfg.sigma_s_scale, face_mask)
        w_sp = areas0[nb_idx] * jnp.exp(
            -0.5 * d2 / jnp.maximum(sigma_s0**2, 1e-30)
        )
        w_sp = jnp.where(in_radius, w_sp, 0.0)
        sg2 = cfg.guidance_smooth_sigma**2
        g = guidance_normals
        for _ in range(cfg.guidance_smooth_iterations):
            gj = g[nb_idx]
            r2 = jnp.sum((g[:, None, :] - gj) ** 2, axis=-1)
            w = w_sp * jnp.exp(-0.5 * r2 / sg2)
            acc = jnp.sum(w[..., None] * gj, axis=1)
            nrm = jnp.linalg.norm(acc, axis=1, keepdims=True)
            g = jnp.where(nrm > 1e-12, acc / jnp.maximum(nrm, 1e-12), g)
        guidance_normals = g

    ff_idx, ff_mask = mesh.face_face_adjacency()
    fm = (
        jnp.ones(f.shape[0], dtype=v.dtype)
        if face_mask is None
        else face_mask.astype(v.dtype)
    )
    g_j = guidance_normals[nb_idx]  # (F, K, 3) — gathered once
    range_dis2 = jnp.sum(
        (guidance_normals[:, None, :] - g_j) ** 2, axis=-1
    )
    range_w = jnp.exp(-0.5 * range_dis2 / (cfg.sigma_r**2))
    cur_v = _filter_iterations(
        v, f, vf_idx, vf_mask, ff_idx, ff_mask, nb_idx, in_radius,
        range_w, g_j, fm, cfg,
    )
    return mesh.with_vertices(cur_v)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _filter_iterations(
    v, f, vf_idx, vf_mask, ff_idx, ff_mask, nb_idx, in_radius,
    range_w, g_j, fm, cfg: GNFConfig,
):
    """The filter's iteration loop as ONE compiled program.

    Each normal iteration + its vertex updates is a `lax.scan` step, so
    the whole `normal_iterations x (filter + vertex_iterations)` run is
    a single dispatch — the eager Python loop paid ~1k tiny dispatches
    per mesh, which dominated wall-clock through a remote-device
    tunnel (bench: the 81,920-face cascade spent most of its 30 s in
    dispatch, not compute)."""

    def body(cur_v, first):
        normals, areas, centroids = face_normals_areas_centroids(cur_v, f)
        # sigma_s = mean adjacent-centroid distance x scale, from the
        # CURRENT geometry (MeshNormalFiltering.cpp:135-170), masked to
        # real faces (either side padded -> pair excluded).
        dd = jnp.linalg.norm(
            centroids[ff_idx] - centroids[:, None, :], axis=-1
        )
        mm = ff_mask.astype(dd.dtype) * fm[:, None] * fm[ff_idx]
        dd = jnp.where(mm > 0, dd, 0.0)
        sigma_s = (
            cfg.sigma_s_scale
            * jnp.sum(dd)
            / jnp.maximum(jnp.sum(mm), 1.0)
        )
        c_j = centroids[nb_idx]
        sp2 = jnp.sum((centroids[:, None, :] - c_j) ** 2, axis=-1)
        spatial_w = jnp.exp(-0.5 * sp2 / jnp.maximum(sigma_s**2, 1e-30))
        w = areas[nb_idx] * spatial_w * range_w
        w = jnp.where(in_radius, w, 0.0)
        # Iteration 0 accumulates guidance normals, later its own
        # previous output (cpp:223-231). `first` is a traced scalar so
        # every iteration shares one compiled body.
        src = jnp.where(first, g_j, normals[nb_idx])
        filt = jnp.sum(w[..., None] * src, axis=1)
        # Zero-weight rescue: a face whose every neighborhood weight
        # underflows (padded sentinel faces under a tight sigma_r)
        # keeps its own current normal — normalizing a
        # flushed-to-zero accumulator against the 1e-30 floor minted
        # ~1e10-magnitude "normals" that blew up the vertex update.
        nrm_f = jnp.linalg.norm(filt, axis=1, keepdims=True)
        filt = jnp.where(
            nrm_f > 1e-12, filt / jnp.maximum(nrm_f, 1e-12), normals
        )
        cur_v = update_vertex_positions(
            cur_v, f, vf_idx, vf_mask, filt, cfg.vertex_iterations
        )
        return cur_v, None

    firsts = jnp.arange(cfg.normal_iterations) == 0
    out, _ = jax.lax.scan(body, v, firsts)
    return out
