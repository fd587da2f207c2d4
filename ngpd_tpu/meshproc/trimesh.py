"""Triangle-mesh container and core mesh ops.

Rebuilds the mesh layer the reference spreads across
PatchGeneration/Modules/Mesh.py (igl/numpy) and the C++ app's OpenMesh
usage (MeshDenoisingBase.cpp:13-105): face normals/areas/centroids from
cross products, vertex normals as area-weighted incident-face sums,
dense vertex->face and face->face adjacency (replacing OpenMesh
circulators with fixed-width masked index arrays — the TPU shape for
"iterate my incident faces"), average edge length, and the
translate/resize/rotate transforms (Mesh.py:344-371).

Adjacency is built host-side in numpy once per mesh (meshes are loaded
on host anyway); all per-element math is jittable on device arrays.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np


def face_normals_areas_centroids(v: jnp.ndarray, f: jnp.ndarray):
    """(F,3) unit normals, (F,) areas, (F,3) centroids
    (MeshDenoisingBase.cpp:24-65; Mesh.py:110-150)."""
    p0, p1, p2 = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    cr = jnp.cross(p1 - p0, p2 - p0)
    nrm = jnp.linalg.norm(cr, axis=1)
    normals = cr / jnp.maximum(nrm, 1e-30)[:, None]
    areas = 0.5 * nrm
    centroids = (p0 + p1 + p2) / 3.0
    return normals, areas, centroids


def vertex_normals(v: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """Area-weighted vertex normals (igl.per_vertex_normals default used
    at Object.py:232; degenerate rows -> 0 like the nan_to_num there)."""
    p0, p1, p2 = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    cr = jnp.cross(p1 - p0, p2 - p0)  # area-weighted normal
    vn = jnp.zeros_like(v)
    for c in range(3):
        vn = vn.at[f[:, c]].add(cr)
    nrm = jnp.linalg.norm(vn, axis=1, keepdims=True)
    return jnp.where(nrm > 1e-30, vn / jnp.maximum(nrm, 1e-30), 0.0)


def _build_vertex_face_adjacency(f: np.ndarray, nv: int):
    """Dense (V, max_deg) incident-face indices + mask (the vta of
    Object.py:211 / OpenMesh vf_iter). Fully vectorized — the Python
    loop version took ~20 s on a 100k-face mesh and dominated the cold
    mesh-pipeline latency."""
    nf = len(f)
    if nf == 0:
        return np.zeros((nv, 1), np.int32), np.zeros((nv, 1), bool)
    vi = f.ravel().astype(np.int64)  # (3F,) vertex of each corner
    fi = np.repeat(np.arange(nf, dtype=np.int64), 3)
    order = np.argsort(vi, kind="stable")  # stable: faces stay in order
    vi_s, fi_s = vi[order], fi[order]
    counts = np.bincount(vi_s, minlength=nv)
    deg = int(counts.max()) if counts.size else 1
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos = np.arange(len(vi_s)) - starts[vi_s]  # rank within each vertex
    idx = np.zeros((nv, deg), np.int32)
    mask = np.zeros((nv, deg), bool)
    idx[vi_s, pos] = fi_s
    mask[vi_s, pos] = True
    return idx, mask


def _build_face_face_adjacency(f: np.ndarray):
    """(F, 3) edge-adjacent faces (igl.triangle_triangle_adjacency as in
    Object.py:335); boundary edge -> self with mask False. Vectorized:
    each face edge gets a canonical integer key, equal keys are grouped
    by a stable sort, and every edge takes the FIRST other face of its
    group (insertion order, matching the loop version's others[0] on
    non-manifold edges)."""
    nf = len(f)
    if nf == 0:
        return np.zeros((0, 3), np.int32), np.zeros((0, 3), bool)
    a = f.astype(np.int64)
    b = a[:, [1, 2, 0]]
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    key = lo * (int(f.max()) + 1) + hi  # unique per undirected edge
    flat_key = key.ravel()  # slot order = fi*3 + e
    order = np.argsort(flat_key, kind="stable").astype(np.int64)
    sk = flat_key[order]
    new_group = np.concatenate([[True], sk[1:] != sk[:-1]])
    group_id = np.cumsum(new_group) - 1
    group_start = np.flatnonzero(new_group)
    gsize = np.diff(np.concatenate([group_start, [len(sk)]]))
    first = order[group_start]  # first slot of each edge group
    second = order[np.minimum(group_start + 1, len(sk) - 1)]
    g_first = first[group_id]
    g_second = second[group_id]
    valid = gsize[group_id] >= 2
    partner = np.where(order == g_first, g_second, g_first)
    idx = np.empty(nf * 3, np.int32)
    mask = np.zeros(nf * 3, bool)
    own_face = (order // 3).astype(np.int32)
    idx[order] = np.where(valid, (partner // 3).astype(np.int32), own_face)
    mask[order] = valid
    return idx.reshape(nf, 3), mask.reshape(nf, 3)


@dataclasses.dataclass
class TriMesh:
    """Vertices + faces with lazily-built dense adjacency."""

    v: jnp.ndarray  # (V, 3) float32
    f: jnp.ndarray  # (F, 3) int32
    _vf: Optional[tuple] = None
    _ff: Optional[tuple] = None

    @classmethod
    def from_numpy(cls, v: np.ndarray, f: np.ndarray) -> "TriMesh":
        return cls(
            v=jnp.asarray(v, jnp.float32), f=jnp.asarray(f, jnp.int32)
        )

    @property
    def num_vertices(self) -> int:
        return self.v.shape[0]

    @property
    def num_faces(self) -> int:
        return self.f.shape[0]

    def face_data(self):
        return face_normals_areas_centroids(self.v, self.f)

    def vertex_normals(self) -> jnp.ndarray:
        return vertex_normals(self.v, self.f)

    def vertex_face_adjacency(self):
        if self._vf is None:
            idx, mask = _build_vertex_face_adjacency(
                np.asarray(self.f), self.num_vertices
            )
            self._vf = (jnp.asarray(idx), jnp.asarray(mask))
        return self._vf

    def face_face_adjacency(self):
        if self._ff is None:
            idx, mask = _build_face_face_adjacency(np.asarray(self.f))
            self._ff = (jnp.asarray(idx), jnp.asarray(mask))
        return self._ff

    def average_edge_length(self) -> jnp.ndarray:
        """Mean length over the three edges of every face
        (MeshDenoisingBase.cpp:13-22 averages halfedges)."""
        p0, p1, p2 = (self.v[self.f[:, c]] for c in range(3))
        e = (
            jnp.linalg.norm(p1 - p0, axis=1)
            + jnp.linalg.norm(p2 - p1, axis=1)
            + jnp.linalg.norm(p0 - p2, axis=1)
        )
        return jnp.mean(e) / 3.0

    def with_vertices(self, v: jnp.ndarray) -> "TriMesh":
        return TriMesh(v=v, f=self.f, _vf=self._vf, _ff=self._ff)

    # --- transforms (Mesh.py:344-371) ---------------------------------
    def translated(self, offset: jnp.ndarray) -> "TriMesh":
        return self.with_vertices(self.v + jnp.asarray(offset))

    def resized(self, factor: float) -> "TriMesh":
        center = jnp.mean(self.v, axis=0)
        return self.with_vertices(center + (self.v - center) * factor)

    def rotated(self, r: jnp.ndarray) -> "TriMesh":
        return self.with_vertices(self.v @ jnp.asarray(r).T)

    def centered_unit(self) -> "TriMesh":
        """Center to origin and scale to unit box — the C++ app's load
        normalization (MeshViewer.cpp:101-131)."""
        mn = jnp.min(self.v, axis=0)
        mx = jnp.max(self.v, axis=0)
        center = (mn + mx) / 2.0
        scale = jnp.max(mx - mn)
        return self.with_vertices((self.v - center) / jnp.maximum(scale, 1e-30))


def add_mesh_noise(
    mesh: TriMesh,
    key,
    level: float,
    noise_type: int = 0,
    direction: int = 0,
) -> TriMesh:
    """Gaussian/impulsive vertex noise, stdev = level x avg edge length —
    the mesh-noise generators (Mesh.py:322-333, Noise.cpp:22-187,
    PatchCollector.NoiseGenerator)."""
    from ..core import noise as noise_mod

    mel = mesh.average_edge_length()
    vn = mesh.vertex_normals()
    noisy = noise_mod.generate_noise(
        key, mesh.v, vn, level, mel, noise_type=noise_type,
        direction=direction,
    )
    return mesh.with_vertices(noisy)
