"""IO round trips and noise-generation statistics (Noise.py:33-59)."""

import numpy as np
import jax
import jax.numpy as jnp

from ngpd_tpu.core import noise
from ngpd_tpu.io.obj import face2vertex_normals, load_obj, read_obj, save_obj
from ngpd_tpu.io.ply import load_ply, save_ply
from ngpd_tpu.io.sampling import face_areas_normals, sample_mesh
from ngpd_tpu.io.xyz import load_xyz, save_xyz

from fixtures import OCTA_F, OCTA_V, sphere_cloud


def test_obj_roundtrip(tmp_path):
    pts, nrm = sphere_cloud(50)
    p = tmp_path / "c.obj"
    save_obj(p, pts, nrm)
    cloud = load_obj(p)
    np.testing.assert_allclose(cloud.valid_points(), pts, atol=1e-5)
    np.testing.assert_allclose(cloud.valid_normals(), nrm, atol=1e-5)


def test_obj_mesh_face_normals(tmp_path):
    # Write a mesh whose vn are face normals referenced per corner; the
    # loader must map them to vertex normals (Object.py:80-83).
    areas, fn = face_areas_normals(OCTA_V, OCTA_F)
    p = tmp_path / "m.obj"
    lines = ["# t\n"]
    for v in OCTA_V:
        lines.append(f"v {v[0]} {v[1]} {v[2]}\n")
    for n in fn:
        lines.append(f"vn {n[0]} {n[1]} {n[2]}\n")
    for i, f in enumerate(OCTA_F + 1):
        lines.append(f"f {f[0]}//{i+1} {f[1]}//{i+1} {f[2]}//{i+1}\n")
    p.write_text("".join(lines))
    cloud = load_obj(p)
    want = face2vertex_normals(OCTA_V, OCTA_F, fn, np.repeat(np.arange(8)[:, None], 3, 1))
    np.testing.assert_allclose(cloud.valid_normals(), want, atol=1e-5)
    # Octahedron vertex normals point radially outward.
    radial = OCTA_V / np.linalg.norm(OCTA_V, axis=1, keepdims=True)
    np.testing.assert_allclose(cloud.valid_normals(), radial, atol=1e-5)


def test_octahedron_areas():
    areas, _ = face_areas_normals(OCTA_V, OCTA_F)
    np.testing.assert_allclose(areas, np.sqrt(3) / 2, atol=1e-6)  # test_Mesh.py asserts


def test_xyz_roundtrip(tmp_path):
    pts, nrm = sphere_cloud(30)
    p = tmp_path / "c.xyz"
    save_xyz(p, pts, nrm)
    cloud = load_xyz(p)
    np.testing.assert_allclose(cloud.valid_points(), pts, atol=1e-5)
    np.testing.assert_allclose(cloud.valid_normals(), nrm, atol=1e-5)


def test_ply_roundtrip(tmp_path):
    pts, nrm = sphere_cloud(40)
    p = tmp_path / "c.ply"
    save_ply(p, pts, nrm)
    cloud = load_ply(p)
    np.testing.assert_allclose(cloud.valid_points(), pts, atol=1e-6)
    np.testing.assert_allclose(cloud.valid_normals(), nrm, atol=1e-6)


def test_sample_mesh():
    cloud = sample_mesh(OCTA_V, OCTA_F, 500, seed=1)
    pts = cloud.valid_points()
    # Every sample lies on the octahedron surface: |x|+|y|+|z| == 1.
    np.testing.assert_allclose(np.abs(pts).sum(axis=1), 1.0, atol=1e-5)
    # Normals are the face normals (unit, 8 distinct values).
    nrm = cloud.valid_normals()
    np.testing.assert_allclose(np.linalg.norm(nrm, axis=1), 1.0, atol=1e-5)
    assert len(np.unique(nrm.round(4), axis=0)) == 8


def test_gaussian_noise_along_normal():
    pts, nrm = sphere_cloud(4000)
    key = jax.random.PRNGKey(0)
    noisy = np.asarray(
        noise.generate_noise(
            key, jnp.asarray(pts), jnp.asarray(nrm), 0.5, jnp.asarray(2.0)
        )
    )
    off = noisy - pts
    # Offsets are parallel to normals (direction 0, Noise.py:54).
    cross = np.linalg.norm(np.cross(off, nrm), axis=1)
    np.testing.assert_allclose(cross, 0.0, atol=1e-5)
    # Std approx level * mean_edge_length = 1.0.
    signed = np.sum(off * nrm, axis=1)
    assert abs(signed.std() - 1.0) < 0.05
    assert abs(signed.mean()) < 0.05


def test_impulsive_noise_fraction():
    pts, nrm = sphere_cloud(5000)
    key = jax.random.PRNGKey(1)
    noisy = np.asarray(
        noise.generate_noise(
            key, jnp.asarray(pts), jnp.asarray(nrm), 0.2, jnp.asarray(1.0),
            noise_type=noise.IMPULSIVE, direction=noise.RANDOM_DIRECTION,
        )
    )
    moved = (np.abs(noisy - pts).sum(axis=1) > 0).mean()
    # A `level` fraction keeps noise (Noise.py:55-57).
    assert abs(moved - 0.2) < 0.01


def test_mat_patch_roundtrip(tmp_path):
    """Both reference .mat flavors load into (20, N) DGCNN inputs with
    the reference's pad/triplet rules (datautils.py:40-70)."""
    import numpy as np
    from ngpd_tpu.io.matpatch import load_mat_patch, save_mat_patch

    rng = np.random.default_rng(0)
    f = 10
    fea = rng.normal(size=(f, 17)).astype(np.float32)
    gt = np.array([0.0, 0.0, 1.0], np.float32)

    # DenoisingGCN flavor: square adjacency; node 0 isolated, node 1 one
    # neighbor, node 2 two neighbors.
    adj = np.zeros((f, f), np.uint8)
    adj[1, 3] = 1
    adj[2, [4, 5]] = 1
    for i in range(3, f):
        adj[i, [(i + 1) % f, (i + 2) % f, (i + 3) % f]] = 1
    save_mat_patch(tmp_path / "a.mat", adj, fea, gt, center_norm=gt)
    got = load_mat_patch(tmp_path / "a.mat", num_nodes=16)
    assert got["x"].shape == (20, 16)
    np.testing.assert_allclose(got["x"][:17, :f].T, fea, atol=1e-6)
    assert got["x"][17:, 0].tolist() == [15, 15, 15]  # empty -> [N-1]*3
    assert got["x"][17:, 1].tolist() == [3, 3, 3]  # one -> replicated
    assert got["x"][17:, 2].tolist() == [4, 5, 5]  # two -> last dup
    np.testing.assert_allclose(got["center_norm"], gt)

    # PatchGeneration flavor: (F, 3) tri-adjacency with -1 fill + ROT.
    tri = np.full((f, 3), -1, np.int64)
    tri[0] = [1, 2, -1]
    tri[1] = [0, -1, -1]
    rot = np.eye(3, dtype=np.float32)
    save_mat_patch(tmp_path / "b.mat", tri, fea, gt, rotation=rot)
    got2 = load_mat_patch(tmp_path / "b.mat", num_nodes=16)
    assert got2["x"].shape == (20, 16)
    assert got2["x"][17:, 0].tolist() == [1, 2, 2]
    assert got2["x"][17:, 1].tolist() == [0, 0, 0]
    np.testing.assert_allclose(got2["rotation"], rot)

    # The loaded input feeds the DGCNN directly.
    import jax, jax.numpy as jnp
    from ngpd_tpu.models.dgcnn import DGCNN

    m = DGCNN(k=4, emb_dims=64)
    batch = jnp.stack([jnp.asarray(got["x"]), jnp.asarray(got2["x"])])
    vs = m.init(jax.random.PRNGKey(0), batch, train=False)
    out = m.apply(vs, batch, train=False)
    assert out.shape == (2, 3)
    assert np.isfinite(np.asarray(out)).all()
