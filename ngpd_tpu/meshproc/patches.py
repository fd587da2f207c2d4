"""Mesh patch construction for the legacy DGCNN — PatchData equivalent.

Rebuilds the C++ patch engine (PatchData.cpp) as one batched program
producing the (B, 20, 64) network inputs of DenoisingGCN
(GCNModel.py:114-118, datautils.py:30-85):

  * membership: faces whose centroid lies within
    r = sqrt(center_area * radius_factor) of the center face
    (PatchData.cpp:91), capped at num_nodes=64 nearest — replacing the
    2-ring BFS + FLANN radius query (PatchData.cpp:11-149) with
    centroid-kNN + radius mask;
  * alignment: the paper's reflected-normal voting tensor with weights
    (area / maxArea) * exp(-3 ||dc||) (PatchData.cpp:262-290,
    RotationMatrix.py:9-35), eigenvectors sorted by descending
    eigenvalue as rows of R, first row sign-fixed to the center normal,
    determinant fixed (PatchData.cpp:292-346);
  * 17 node features: centroid (3, as (x+1)/2 in the unit patch frame),
    normal (3, as (n+1)/2), area / r^2, degree feature
    (((deg - 12)/6) + 1)/2 (PatchData.cpp:221,439-470), and the 3x3
    corner coordinates. NOTE a reference drift: PatchData.cpp:461-465
    writes corner 0 three times into the 9 corner slots; here each
    corner's coordinates are written as evidently intended;
  * rows 17:20: up to 3 edge-adjacent neighbor indices local to the
    patch, padded by duplication / self (PatchData.cpp:171-214).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import PatchConfig
from ..ops.eigh3 import eigh3x3
from ..ops.knn import knn
from ..ops.neighbors import normalize
from .trimesh import TriMesh


class MeshPatchBatch(NamedTuple):
    inputs: jnp.ndarray  # (F, 20, P) the DGCNN input layout
    rotations: jnp.ndarray  # (F, 3, 3) patch frame R (world -> patch)
    y: jnp.ndarray  # (F, 3) rotated GT center normal
    node_mask: jnp.ndarray  # (F, P)


def _alignment_rotation(dv, nj, areas_j, mask, center_normal):
    """Reflected-normal voting rotation per patch.

    dv: (F, P, 3) scaled centroid offsets; nj: (F, P, 3) face normals;
    areas_j: (F, P); mask: (F, P); center_normal: (F, 3).
    """
    w = normalize(jnp.cross(jnp.cross(dv, nj), dv))
    n_ref = 2.0 * jnp.sum(nj * w, axis=-1, keepdims=True) * w - nj
    max_area = jnp.max(jnp.where(mask, areas_j, 0.0), axis=1)
    mu = (areas_j / jnp.maximum(max_area, 1e-30)[:, None]) * jnp.exp(
        -3.0 * jnp.linalg.norm(dv, axis=-1)
    )
    mu = jnp.where(mask, mu, 0.0)
    t = jnp.einsum("fpi,fp,fpj->fij", n_ref, mu, n_ref)
    _, eigvec = eigh3x3(t)
    # Rows of R = eigenvectors by DESCENDING eigenvalue.
    rows = jnp.flip(jnp.swapaxes(eigvec, 1, 2), axis=1)
    sign0 = jnp.where(
        jnp.sum(rows[:, 0, :] * center_normal, axis=1) < 0, -1.0, 1.0
    )
    rows = rows * sign0[:, None, None]
    det = jnp.linalg.det(rows)
    rows = rows.at[:, 2, :].multiply(jnp.where(det < 0, -1.0, 1.0)[:, None])
    return rows  # (F, 3, 3)


def _extract_rows(
    member, mask, centroids_q, radius_q, normals_q, gt_q,
    v, f, normals, areas, centroids, deg, ff_idx, ff_mask, p,
):
    """Per-query-face patch assembly.

    Query-axis args (first group) are (C, ...) for a chunk of C center
    faces; the mesh-global arrays (second group) stay unchunked so
    gathers reach every face. Splitting the query axis bounds the
    (C, P, 3) intermediates — on TPU a trailing dim of 3 pads to 128
    lanes (42.7x), which OOMs HBM when C is the full face count of a
    100k-face mesh."""
    nf = member.shape[0]

    c_j = centroids[member]  # (F, P, 3)
    n_j = normals[member]
    a_j = areas[member]
    dv = (c_j - centroids_q[:, None, :]) / radius_q[:, None, None]

    r = _alignment_rotation(dv, n_j, a_j, mask, normals_q)

    # Aligned geometry in the unit patch frame.
    corners = v[f[member]]  # (F, P, 3corners, 3)
    rel = (corners - centroids_q[:, None, None, :]) / radius_q[
        :, None, None, None
    ]
    corners_al = jnp.einsum("fij,fpcj->fpci", r, rel)
    normals_al = jnp.einsum("fij,fpj->fpi", r, n_j)
    centers_al = jnp.mean(corners_al, axis=2)  # (F, P, 3)

    deg_j = deg[member]
    deg_feat = (((deg_j - 12.0) / 6.0) + 1.0) / 2.0  # PatchData.cpp:221

    feats = jnp.concatenate(
        [
            (centers_al + 1.0) / 2.0,  # 0:3
            (normals_al + 1.0) / 2.0,  # 3:6
            (a_j / jnp.maximum(radius_q**2, 1e-30)[:, None])[..., None],  # 6
            deg_feat[..., None],  # 7
            (corners_al.reshape(nf, p, 9) + 1.0) / 2.0,  # 8:17
        ],
        axis=-1,
    )  # (F, P, 17)
    feats = jnp.where(mask[..., None], feats, 0.0)

    # Neighbor rows 17:20 — local indices of up to 3 edge-adjacent faces.
    adj = ff_idx[member]  # (F, P, 3) global
    adj_ok = ff_mask[member]
    # Local position of each adjacent face within the patch member list.
    eq = adj[..., None] == member[:, None, None, :]  # (F, P, 3, P)
    present = jnp.any(eq & mask[:, None, None, :], axis=-1)
    local = jnp.argmax(eq, axis=-1).astype(jnp.float32)  # (F, P, 3)
    ok = adj_ok & present
    self_idx = jnp.broadcast_to(
        jnp.arange(p, dtype=jnp.float32)[None, :, None], local.shape
    )
    local = jnp.where(ok, local, jnp.nan)
    # Padding rules (PatchData.cpp:199-214): shift valid entries first,
    # then duplicate the last valid one; all-missing -> self.
    order = jnp.argsort(jnp.where(ok, 0, 1), axis=-1)
    local_sorted = jnp.take_along_axis(local, order, axis=-1)
    n_ok = jnp.sum(ok, axis=-1)  # (F, P)
    fill0 = jnp.where(n_ok >= 1, local_sorted[..., 0], self_idx[..., 0])
    fill1 = jnp.where(n_ok >= 2, local_sorted[..., 1], fill0)
    fill2 = jnp.where(n_ok >= 3, local_sorted[..., 2], fill1)
    nbr_rows = jnp.stack([fill0, fill1, fill2], axis=-1)  # (F, P, 3)

    inputs = jnp.concatenate([feats, nbr_rows], axis=-1)  # (F, P, 20)
    inputs = jnp.swapaxes(inputs, 1, 2)  # (F, 20, P) — torch layout

    y = jnp.einsum("fij,fj->fi", r, gt_q)
    return MeshPatchBatch(inputs=inputs, rotations=r, y=y, node_mask=mask)


# Query faces per lax.map step in the chunked path. Worst intermediate
# is ~3 stacked (C, P, 3) f32 buffers lane-padded 42.7x: C=16384, P=64
# -> ~1.6 GB of HLO temp, comfortably inside one v5e chip's HBM.
_CHUNK = 16 * 1024


@functools.partial(jax.jit, static_argnames=("cfg",))
def _extract(v, f, ff_idx, ff_mask, gt_normals, cfg: PatchConfig,
             pre_nbh=None):
    from .trimesh import face_normals_areas_centroids

    normals, areas, centroids = face_normals_areas_centroids(v, f)
    nf = f.shape[0]
    p = cfg.num_nodes

    radius = jnp.sqrt(areas * cfg.radius_factor)  # (F,)
    if pre_nbh is None:
        # The centroid kNN is the single most expensive op of the mesh
        # pipeline (~4.8 s at 82k faces on-chip); callers that also run
        # the guided filter share one build per pass via ``pre_nbh``.
        nbh, d2 = knn(centroids, p)
        nb_idx, nb_mask = nbh.idx, nbh.mask
    else:
        nb_idx, nb_mask, d2 = pre_nbh
    mask = nb_mask & (d2 <= (radius**2)[:, None])  # (F, P)
    member = nb_idx  # (F, P) global face ids; column 0 is the center.
    deg = jnp.sum(mask, axis=1).astype(jnp.float32)  # radius-nbr count
    gt_n = normals if gt_normals is None else gt_normals

    if nf <= _CHUNK:
        return _extract_rows(
            member, mask, centroids, radius, normals, gt_n,
            v, f, normals, areas, centroids, deg, ff_idx, ff_mask, p,
        )

    # Big mesh: bound HLO temps by mapping over query-face chunks.
    # Gathers still reach the whole mesh; only the query axis is split.
    pad = (-nf) % _CHUNK
    n_chunks = (nf + pad) // _CHUNK

    def _chunked(x):
        x = jnp.concatenate([x, x[:pad]], axis=0) if pad else x
        return x.reshape((n_chunks, _CHUNK) + x.shape[1:])

    chunked = jax.tree.map(
        _chunked, (member, mask, centroids, radius, normals, gt_n)
    )
    out = jax.lax.map(
        lambda args: _extract_rows(
            *args, v, f, normals, areas, centroids, deg, ff_idx, ff_mask, p
        ),
        chunked,
    )
    return jax.tree.map(
        lambda x: x.reshape((n_chunks * _CHUNK,) + x.shape[2:])[:nf], out
    )


def extract_mesh_patches(
    mesh: TriMesh,
    gt_normals: Optional[jnp.ndarray] = None,
    cfg: PatchConfig = PatchConfig(),
    pre_nbh=None,
) -> MeshPatchBatch:
    """One 64-face patch per face of the mesh, DGCNN-ready.

    ``pre_nbh``: optional precomputed ``(idx, mask, sqdist)`` centroid
    kNN (k = cfg.num_nodes) to share the build with the guided filter.
    """
    ff_idx, ff_mask = mesh.face_face_adjacency()
    return _extract(mesh.v, mesh.f, ff_idx, ff_mask, gt_normals, cfg,
                    pre_nbh)


def unrotate_predictions(
    pred: jnp.ndarray, rotations: jnp.ndarray
) -> jnp.ndarray:
    """Patch-frame normals back to world: n = R^T y (the einsum at
    NetworkController.py:257 / MeshViewer.cpp:893-911)."""
    out = jnp.einsum("fji,fj->fi", rotations, pred)
    return out / jnp.maximum(jnp.linalg.norm(out, axis=1, keepdims=True), 1e-12)
