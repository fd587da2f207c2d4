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


def test_chunked_extraction_matches_unchunked(monkeypatch):
    """Big meshes route through the lax.map query-chunked path (the
    full-width program OOMs HBM at ~100k faces from 42.7x lane
    padding of (F, P, 3) temps). Chunking must be invisible: force a
    tiny chunk so the box mesh spans several padded chunks and compare
    against the one-shot program."""
    from ngpd_tpu.meshproc import patches as P
    from ngpd_tpu.meshproc.synthetic import torus

    # On TPU the two programs are bitwise identical. On the CPU test
    # platform XLA's reduction blocking differs by batch size, which
    # perturbs the voting tensor in the last ulp — and the *tangent*
    # eigenbasis is intrinsically degenerate on smooth patches (the
    # tensor is built from reflected normals, so lambda2 ~ lambda3 ~ 0
    # away from sharp features). The cross-platform contract is
    # therefore: masks and rotation-invariant features exact, the
    # normal axis tight, and the tangent frames equal up to an
    # in-plane rotation.
    mesh = torus(n_major=16, n_minor=8)  # 256 faces -> 2 full chunks
    rng = np.random.default_rng(0)
    v = np.asarray(mesh.v) * np.array([1.0, 1.3, 1.7])
    v = v + rng.normal(0, 0.003, v.shape)
    mesh = TriMesh.from_numpy(v, np.asarray(mesh.f))
    want = extract_mesh_patches(mesh, cfg=CFG)

    monkeypatch.setattr(P, "_CHUNK", 128)
    P._extract.clear_cache()
    try:
        got = extract_mesh_patches(mesh, cfg=CFG)
    finally:
        P._extract.clear_cache()

    assert got.inputs.shape == want.inputs.shape
    np.testing.assert_array_equal(
        np.asarray(got.node_mask), np.asarray(want.node_mask)
    )

    rw = np.asarray(want.rotations)
    rg = np.asarray(got.rotations)
    # Normal axis (row 0, the dominant eigenvector) is stable.
    np.testing.assert_allclose(rg[:, 0, :], rw[:, 0, :], atol=1e-4)
    # Frames agree up to a rotation about the normal: the relative
    # rotation Q = got @ want^T must fix e0.
    q = np.einsum("fij,fkj->fik", rg, rw)
    np.testing.assert_allclose(q[:, 0, 0], 1.0, atol=1e-4)
    np.testing.assert_allclose(q[:, 0, 1:], 0.0, atol=1e-2)
    np.testing.assert_allclose(q[:, 1:, 0], 0.0, atol=1e-2)

    # y = R @ gt: the normal component and the tangential magnitude
    # are frame-choice invariant.
    yw = np.asarray(want.y)
    yg = np.asarray(got.y)
    np.testing.assert_allclose(yg[:, 0], yw[:, 0], atol=1e-4)
    np.testing.assert_allclose(
        np.linalg.norm(yg[:, 1:], axis=1),
        np.linalg.norm(yw[:, 1:], axis=1),
        atol=1e-4,
    )

    # Rotation-invariant feature rows: area ratio (6), degree (7),
    # patch-local neighbor indices (17:20); and per-node distances of
    # the aligned centroids (rows 0:3 store (x+1)/2).
    iw = np.asarray(want.inputs)
    ig = np.asarray(got.inputs)
    np.testing.assert_allclose(ig[:, 6:8], iw[:, 6:8], atol=1e-6)
    np.testing.assert_array_equal(ig[:, 17:20], iw[:, 17:20])
    cw = np.linalg.norm(2.0 * iw[:, 0:3] - 1.0, axis=1)
    cg = np.linalg.norm(2.0 * ig[:, 0:3] - 1.0, axis=1)
    np.testing.assert_allclose(cg, cw, atol=1e-5)
