"""Mesh patch builder (PatchData semantics) + DGCNN integration."""

import numpy as np
import jax
import jax.numpy as jnp

from ngpd_tpu.config import PatchConfig
from ngpd_tpu.meshproc.patches import (
    extract_mesh_patches,
    unrotate_predictions,
)
from ngpd_tpu.meshproc.trimesh import TriMesh
from ngpd_tpu.models.dgcnn import DGCNN

from fixtures import OCTA_F, OCTA_V

CFG = PatchConfig(num_nodes=8, radius_factor=16.0)


def _octa():
    return TriMesh.from_numpy(OCTA_V, OCTA_F)


def test_patch_shapes_and_layout():
    batch = extract_mesh_patches(_octa(), cfg=CFG)
    assert batch.inputs.shape == (8, 20, 8)
    x = np.asarray(batch.inputs)
    # Feature rows 0:17 are (val+1)/2-normalized or area/deg — bounded.
    assert np.isfinite(x).all()
    # Neighbor rows 17:20 hold valid local indices.
    nbrs = x[:, 17:20, :]
    assert (nbrs >= 0).all() and (nbrs < 8).all()
    # Center face is member 0 of its own patch with centered coords 0.5.
    np.testing.assert_allclose(x[:, 0:3, 0], 0.5, atol=1e-5)


def test_rotation_invariants():
    """Alignment idempotence flavor (test_Mesh.py:262-317): R is a
    rotation and the center normal maps into the +first-axis halfspace."""
    batch = extract_mesh_patches(_octa(), cfg=CFG)
    r = np.asarray(batch.rotations)
    gram = np.einsum("fij,fkj->fik", r, r)
    np.testing.assert_allclose(gram, np.tile(np.eye(3), (8, 1, 1)), atol=1e-4)
    np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-4)
    m = _octa()
    normals, _, _ = m.face_data()
    rotated = np.einsum("fij,fj->fi", r, np.asarray(normals))
    assert (rotated[:, 0] >= -1e-5).all()


def test_unrotate_roundtrip():
    m = _octa()
    normals, _, _ = m.face_data()
    batch = extract_mesh_patches(m, cfg=CFG)
    back = unrotate_predictions(batch.y, batch.rotations)
    np.testing.assert_allclose(np.asarray(back), np.asarray(normals), atol=1e-4)


def test_dgcnn_consumes_patches():
    batch = extract_mesh_patches(_octa(), cfg=CFG)
    model = DGCNN(k=4)
    vs = model.init(jax.random.PRNGKey(0), batch.inputs, train=False)
    out = model.apply(vs, batch.inputs, train=False)
    assert out.shape == (8, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_patch_on_finer_mesh():
    """A subdivided octahedron: patches carry real neighborhoods."""
    # One subdivision: split each face at edge midpoints.
    v = OCTA_V.tolist()
    cache = {}
    faces = []

    def mid(a, b):
        key = tuple(sorted((a, b)))
        if key not in cache:
            m = (np.asarray(v[a]) + np.asarray(v[b])) / 2
            m = m / np.linalg.norm(m)
            cache[key] = len(v)
            v.append(m.tolist())
        return cache[key]

    for f in OCTA_F:
        a, b, c = int(f[0]), int(f[1]), int(f[2])
        ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
        faces += [[a, ab, ca], [ab, b, bc], [ca, bc, c], [ab, bc, ca]]
    mesh = TriMesh.from_numpy(
        np.asarray(v, np.float32), np.asarray(faces, np.int32)
    )
    cfg = PatchConfig(num_nodes=16)
    batch = extract_mesh_patches(mesh, cfg=cfg)
    assert batch.inputs.shape == (32, 20, 16)
    # Most patches should have several valid members.
    assert float(np.asarray(batch.node_mask).mean()) > 0.4
