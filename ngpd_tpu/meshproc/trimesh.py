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
    Object.py:211 / OpenMesh vf_iter)."""
    lists: list[list[int]] = [[] for _ in range(nv)]
    for fi, tri in enumerate(f):
        for c in tri:
            lists[int(c)].append(fi)
    deg = max((len(l) for l in lists), default=1)
    idx = np.zeros((nv, deg), np.int32)
    mask = np.zeros((nv, deg), bool)
    for vi, l in enumerate(lists):
        idx[vi, : len(l)] = l
        mask[vi, : len(l)] = True
    return idx, mask


def _build_face_face_adjacency(f: np.ndarray):
    """(F, 3) edge-adjacent faces (igl.triangle_triangle_adjacency as in
    Object.py:335); -1 -> self with mask False."""
    edge_map: dict[tuple[int, int], list[int]] = {}
    for fi, tri in enumerate(f):
        for a, b in ((0, 1), (1, 2), (2, 0)):
            key = tuple(sorted((int(tri[a]), int(tri[b]))))
            edge_map.setdefault(key, []).append(fi)
    nf = len(f)
    idx = np.zeros((nf, 3), np.int32)
    mask = np.zeros((nf, 3), bool)
    for fi, tri in enumerate(f):
        for e, (a, b) in enumerate(((0, 1), (1, 2), (2, 0))):
            key = tuple(sorted((int(tri[a]), int(tri[b]))))
            others = [x for x in edge_map[key] if x != fi]
            if others:
                idx[fi, e] = others[0]
                mask[fi, e] = True
            else:
                idx[fi, e] = fi
    return idx, mask


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
