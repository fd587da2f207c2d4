"""Tensor voting + classification: analytic fixtures and oracle parity."""

import numpy as np
import jax.numpy as jnp

from ngpd_tpu.core import voting
from ngpd_tpu.ops.knn import knn

import oracle
from fixtures import cube_corner, plane_grid, sphere_cloud


def test_classes_on_cube_corner():
    """Face/edge/corner classification against analytic labels
    (the FeatureFix.ipynb ground-truth style)."""
    pts, nrm, labels = cube_corner(n=10)
    nbh, _ = knn(jnp.asarray(pts), 16)
    decomp, f_n = _feature_decomp(pts, nrm, nbh)
    cls = np.asarray(voting.classes(decomp))
    # Interior-of-face points must classify as face, interior edges as
    # edge, and the corner as corner. Points bordering a crease are
    # legitimately ambiguous; check the unambiguous interior.
    interior = _interior_mask(pts)
    acc = (cls[interior] == labels[interior]).mean()
    assert acc > 0.9, acc
    corner_i = np.where(labels == 2)[0]
    assert (cls[corner_i] == 2).all()


def _interior_mask(pts, margin=2.0):
    """Points well away from the cube boundary AND at known-class spots."""
    maxc = pts.max()
    on_face = (pts == 0).sum(axis=1)
    far_from_outer = (pts < maxc - margin).all(axis=1) if False else np.ones(len(pts), bool)
    # Distance from the creases: min coordinate among nonzero-plane coords.
    dist_crease = np.where(on_face == 1, np.sort(pts, axis=1)[:, 1], 0)
    keep_face = (on_face == 1) & (dist_crease > 1.5)
    keep_edge = (on_face == 2) & (pts.max(axis=1) > 1.5)
    keep_corner = on_face == 3
    return (keep_face | keep_edge | keep_corner) & far_from_outer


def _feature_decomp(pts, nrm, nbh, angle=np.pi * 5 / 12):
    nvt1 = voting.better_filtered_nvt(jnp.asarray(pts), nbh, jnp.asarray(nrm), angle)
    f_n = voting.vu_smoothed_normals(nvt1, jnp.asarray(nrm))
    return voting.better_filtered_nvt(jnp.asarray(pts), nbh, f_n, angle), f_n


def test_better_filtered_nvt_oracle_parity():
    pts, nrm = sphere_cloud(160, seed=3)
    k = 12
    idx = oracle.knn_with_self(pts.astype(np.float64), k)
    want_val, _ = oracle.better_filtered_nvt(
        pts.astype(np.float64), idx, nrm.astype(np.float64), 0.9
    )
    nbh, _ = knn(jnp.asarray(pts), k)
    got = voting.better_filtered_nvt(jnp.asarray(pts), nbh, jnp.asarray(nrm), 0.9)
    np.testing.assert_allclose(np.asarray(got.eigval), want_val, atol=2e-3)


def test_vu_smoothed_normals_oracle_parity():
    pts, nrm = sphere_cloud(120, seed=4)
    k = 10
    idx = oracle.knn_with_self(pts.astype(np.float64), k)
    ev, evec = oracle.better_filtered_nvt(
        pts.astype(np.float64), idx, nrm.astype(np.float64), 1.2
    )
    want = oracle.vu_smoothed_normals(ev, evec, nrm.astype(np.float64))
    nbh, _ = knn(jnp.asarray(pts), k)
    d = voting.better_filtered_nvt(jnp.asarray(pts), nbh, jnp.asarray(nrm), 1.2)
    got = np.asarray(voting.vu_smoothed_normals(d, jnp.asarray(nrm)))
    # Compare up to the metric that matters: directions.
    dots = np.abs((got * want).sum(axis=1))
    assert (dots > 1 - 1e-3).mean() > 0.97, dots.min()


def test_vu_smoothed_plane_is_stable():
    """On a flat plane the VU-smoothed normals stay +z."""
    pts, nrm = plane_grid(12)
    nbh, _ = knn(jnp.asarray(pts), 16)
    d = voting.better_filtered_nvt(
        jnp.asarray(pts), nbh, jnp.asarray(nrm), np.pi * 5 / 12
    )
    sm = np.asarray(voting.vu_smoothed_normals(d, jnp.asarray(nrm)))
    np.testing.assert_allclose(np.abs(sm[:, 2]), 1.0, atol=1e-4)


def test_md_features_thresholds():
    eigval = jnp.asarray(
        [
            [0.0005, 0.005, 0.9],  # flat: e1 < .01, e2 < .001
            [0.05, 0.5, 0.9],  # edge: e1 > .01, e2 < .1
            [0.2, 0.5, 0.9],  # corner: e2 > .1
            [0.05, 0.005, 0.9],  # none of the above -> 0? (e1<.01 false..)
        ]
    )
    d = voting.Decomposition(eigval, jnp.zeros((4, 3, 3)))
    got = np.asarray(voting.md_features(d))
    # Row 3: desc = (.9, .05, .005): e1=.05>.01? no wait e1 is second desc
    np.testing.assert_array_equal(got[:3], [1, 2, 3])


def test_r_inv_properties():
    """getRInv invariants (test_RotationMatrix.py style): orthogonal,
    det +1, first row of R aligned with the normal's halfspace."""
    pts, nrm = sphere_cloud(100, seed=5)
    nbh, _ = knn(jnp.asarray(pts), 12)
    d = voting.nvt(nbh, jnp.asarray(nrm))
    rinv = np.asarray(voting.r_inv(d, jnp.asarray(nrm)))
    r = rinv.transpose(0, 2, 1)
    gram = np.einsum("nij,nkj->nik", r, r)
    np.testing.assert_allclose(gram, np.tile(np.eye(3), (100, 1, 1)), atol=1e-3)
    det = np.linalg.det(r)
    np.testing.assert_allclose(det, 1.0, atol=1e-3)
    assert (np.einsum("ni,ni->n", r[:, 0, :], nrm) >= -1e-6).all()


def test_nvt_features_sum():
    pts, nrm = sphere_cloud(64, seed=6)
    nbh, _ = knn(jnp.asarray(pts), 8)
    d = voting.nvt(nbh, jnp.asarray(nrm))
    p, l, s = voting.nvt_features(d)
    np.testing.assert_allclose(
        np.asarray(p) + np.asarray(l) + np.asarray(s), 1.0, atol=1e-3
    )


def test_neighborhood_triangles_octahedron():
    """edge_to_faces intended behavior (GraphBuilder.py:72-75 drift):
    the k=4 kNN graph of the octahedron meshes into exactly its 8 faces."""
    import numpy as np
    import jax.numpy as jnp
    from ngpd_tpu.ops.knn import knn
    from ngpd_tpu.ops.neighbors import neighborhood_triangles

    pts = jnp.asarray(
        np.array(
            [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
            np.float32,
        )
    )
    nbh, _ = knn(pts, 4, exclude_self=True)
    tri, valid = neighborhood_triangles(nbh)
    faces = {tuple(t) for t in np.asarray(tri)[np.asarray(valid)].tolist()}
    want = {
        (0, 2, 4), (0, 2, 5), (0, 3, 4), (0, 3, 5),
        (1, 2, 4), (1, 2, 5), (1, 3, 4), (1, 3, 5),
    }
    assert faces == want, faces


def test_vu_filtered_normals_alias():
    from ngpd_tpu.core import voting

    assert voting.vu_filtered_normals is voting.vu_smoothed_normals
