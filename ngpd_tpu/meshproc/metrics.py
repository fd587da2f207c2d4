"""Mesh error metrics and error-map export.

The C++ app's evaluation surface (MeshDenoisingBase.cpp:145-303):
  * Ea — mean angular error over corresponding faces, degrees;
  * MSAE — RMS angular error, degrees;
  * Dv — area-weighted RMS point-to-plane distance of denoised vertices
    against the original mesh's face planes;
plus the GL error-map coloring by angle buckets 0-20-40 degrees
(MeshViewer.cpp:1344-1377), exported here as per-vertex OBJ colors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .trimesh import TriMesh


def _face_angles_deg(a: TriMesh, b: TriMesh) -> jnp.ndarray:
    na, _, _ = a.face_data()
    nb, _, _ = b.face_data()
    dot = jnp.clip(jnp.sum(na * nb, axis=1), -1.0, 1.0)
    return jnp.degrees(jnp.arccos(dot))


def mean_angular_error(denoised: TriMesh, original: TriMesh) -> jnp.ndarray:
    """Ea (MeshDenoisingBase.cpp:145-165)."""
    return jnp.mean(_face_angles_deg(denoised, original))


def msae(denoised: TriMesh, original: TriMesh) -> jnp.ndarray:
    """RMS angular error in degrees (MeshDenoisingBase.cpp:191-217)."""
    ang = _face_angles_deg(denoised, original)
    return jnp.sqrt(jnp.mean(ang * ang))


def vertex_distance(denoised: TriMesh, original: TriMesh) -> jnp.ndarray:
    """Dv (MeshDenoisingBase.cpp:219-285): per denoised vertex the MIN
    over original faces of |(q - face_vertex0) . face_normal|, then
    sqrt( sum_v sum_{f incident v} area_f min_dis^2 / (3 total_area) ).
    """
    n_o, _, _ = original.face_data()
    v0_o = original.v[original.f[:, 0]]  # (Fo, 3)
    q = denoised.v  # (V, 3)

    def chunk_min(qc):
        dis = jnp.abs(
            jnp.sum((qc[:, None, :] - v0_o[None, :, :]) * n_o[None], axis=-1)
        )
        return jnp.min(dis, axis=1)

    # Chunk the vertex axis to bound the (Vc, Fo) plane-distance tile.
    vcount = q.shape[0]
    chunk = 1024
    pad = (-vcount) % chunk
    qp = jnp.pad(q, ((0, pad), (0, 0)))
    mins = jax.lax.map(
        chunk_min, qp.reshape(-1, chunk, 3)
    ).reshape(-1)[:vcount]

    _, areas_d, _ = denoised.face_data()
    vf_idx, vf_mask = denoised.vertex_face_adjacency()
    a_incident = jnp.sum(
        jnp.where(vf_mask, areas_d[vf_idx], 0.0), axis=1
    )
    mean_ev = jnp.sum(a_incident * mins * mins)
    total_area = jnp.sum(areas_d)
    return jnp.sqrt(mean_ev / jnp.maximum(3.0 * total_area, 1e-30))


def error_map_colors(denoised: TriMesh, original: TriMesh) -> np.ndarray:
    """Per-vertex RGB from incident-face angular error, bucketed
    0-20-40 degrees like the viewer (MeshViewer.cpp:1344-1377):
    blue->green over [0, 20), green->red over [20, 40), red above."""
    ang = np.asarray(_face_angles_deg(denoised, original))
    vf_idx, vf_mask = denoised.vertex_face_adjacency()
    vf_idx = np.asarray(vf_idx)
    vf_mask = np.asarray(vf_mask)
    vert_ang = np.where(vf_mask, ang[vf_idx], 0.0).sum(1) / np.maximum(
        vf_mask.sum(1), 1
    )
    colors = np.zeros((len(vert_ang), 3), np.float32)
    low = vert_ang < 20.0
    mid = (vert_ang >= 20.0) & (vert_ang < 40.0)
    hi = vert_ang >= 40.0
    t = vert_ang / 20.0
    colors[low] = np.stack(
        [np.zeros_like(t[low]), t[low], 1.0 - t[low]], axis=1
    )
    t2 = (vert_ang - 20.0) / 20.0
    colors[mid] = np.stack(
        [t2[mid], 1.0 - t2[mid], np.zeros_like(t2[mid])], axis=1
    )
    colors[hi] = [1.0, 0.0, 0.0]
    return colors
