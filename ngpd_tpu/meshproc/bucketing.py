"""Shape-bucketed mesh padding — compile-cache reuse across meshes.

Every jitted mesh program (`patches._extract`, the GNF vertex update)
specializes on the exact (V, F) of its input, so a corpus of M distinct
meshes costs M full XLA compiles — minutes each through a remote-device
tunnel. The reference never faces this (torch kernels are shape-
agnostic; the C++ app loops per face, PatchData.cpp:11-149); it is a
pure XLA-semantics problem and gets an XLA-shaped answer: pad every
mesh to power-of-two vertex/face buckets so all meshes in a bucket
share one compiled program.

Padding scheme:

* faces are padded with a zig-zag triangle strip of *sentinel*
  vertices placed ~100 bounding-box diagonals away from the mesh, so
  centroid-kNN neighborhoods (patches.py:84, filtering.py:95) of real
  faces never contain a sentinel and vice versa;
* sentinel triangles are non-degenerate (well-defined normals/areas)
  and edge-connected only to each other, so face-face adjacency rows
  of real faces are untouched;
* vertex->face adjacency is rebuilt on the padded mesh with its degree
  axis padded to a power of two as well (the third shape a program
  specializes on);
* a boolean ``face_mask`` marks real faces; consumers that reduce over
  ALL faces (the GNF radius/sigma estimate, filtering.py:68-75) must
  mask with it — per-face/per-row math needs no masking because real
  rows only ever gather real neighbors.

Outputs are exact on real rows up to float-reduction reordering; the
parity test (tests/test_bucketing.py) pins both extraction and the
full GCN+GNF flow against the unpadded programs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .trimesh import (
    TriMesh,
    _build_face_face_adjacency,
    _build_vertex_face_adjacency,
)


def bucket_size(n: int, minimum: int = 256) -> int:
    """Smallest power of two >= max(n, minimum)."""
    return max(minimum, 1 << (int(n) - 1).bit_length())


class PaddedMesh(NamedTuple):
    mesh: TriMesh  # padded mesh, adjacency pre-built & degree-bucketed
    num_faces: int  # real face count
    num_vertices: int  # real vertex count
    face_mask: jnp.ndarray  # (F_pad,) True on real faces


def pad_mesh(
    mesh: TriMesh,
    min_faces: int = 256,
    min_vertices: int = 256,
    min_degree: int = 8,
) -> PaddedMesh:
    """Pad a mesh to power-of-two (V, F, vertex-degree) buckets."""
    v = np.asarray(mesh.v, np.float32)
    f = np.asarray(mesh.f, np.int64)
    nv, nf = len(v), len(f)

    nf_pad = bucket_size(nf, min_faces)
    extra_f = nf_pad - nf
    n_strip = extra_f + 2 if extra_f else 0  # strip vertices

    mn, mx = v.min(axis=0), v.max(axis=0)
    diag = float(np.linalg.norm(mx - mn)) or 1.0
    # Strip spacing ~ a typical edge so sentinel areas/normals are in a
    # sane numeric range; offset 100 diagonals keeps every sentinel
    # centroid farther from any real centroid than any real kNN radius.
    spacing = diag * 1e-3
    off = mx + 100.0 * diag

    strip_v = np.zeros((n_strip, 3), np.float32)
    if n_strip:
        j = np.arange(n_strip, dtype=np.float32)
        strip_v[:, 0] = off[0] + 0.5 * spacing * j
        strip_v[:, 1] = off[1] + spacing * (j % 2)
        strip_v[:, 2] = off[2]

    nv_pad = bucket_size(nv + n_strip, min_vertices)
    spare = np.zeros((nv_pad - nv - n_strip, 3), np.float32)
    if len(spare):  # isolated filler vertices, also far away
        spare[:] = off + np.array(
            [0.0, 4.0 * spacing, 4.0 * spacing], np.float32
        )
        spare[:, 0] += spacing * np.arange(len(spare), dtype=np.float32)
    v_pad = np.concatenate([v, strip_v, spare], axis=0)

    if extra_f:
        base = nv + np.arange(extra_f, dtype=np.int64)
        f_extra = np.stack([base, base + 1, base + 2], axis=1)
        f_pad = np.concatenate([f, f_extra], axis=0)
    else:
        f_pad = f

    vf_idx, vf_mask = _build_vertex_face_adjacency(f_pad, nv_pad)
    deg = vf_idx.shape[1]
    deg_pad = bucket_size(deg, min_degree)
    if deg_pad > deg:
        vf_idx = np.pad(vf_idx, ((0, 0), (0, deg_pad - deg)))
        vf_mask = np.pad(vf_mask, ((0, 0), (0, deg_pad - deg)))
    ff_idx, ff_mask = _build_face_face_adjacency(f_pad)

    padded = TriMesh(
        v=jnp.asarray(v_pad),
        f=jnp.asarray(f_pad, jnp.int32),
        _vf=(jnp.asarray(vf_idx), jnp.asarray(vf_mask)),
        _ff=(jnp.asarray(ff_idx), jnp.asarray(ff_mask)),
    )
    face_mask = jnp.arange(nf_pad) < nf
    return PaddedMesh(
        mesh=padded, num_faces=nf, num_vertices=nv, face_mask=face_mask
    )


def crop_vertices(padded: PaddedMesh, original: TriMesh) -> TriMesh:
    """Original mesh with the padded mesh's (updated) real vertices."""
    return original.with_vertices(padded.mesh.v[: padded.num_vertices])
