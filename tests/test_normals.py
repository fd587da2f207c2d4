"""Normal estimation and orientation: PVT quality + propagation vs the
exact MST/DFS (GraphBuilder.py:129-209 semantics)."""

import numpy as np
import jax.numpy as jnp

from ngpd_tpu.core.normals import (
    orient_normals,
    orient_normals_mst,
    pvt_normals,
)
from ngpd_tpu.ops.knn import knn

from fixtures import plane_grid, sphere_cloud


def test_pvt_normals_on_plane():
    pts, _ = plane_grid(12)
    nbh, _ = knn(jnp.asarray(pts), 12, exclude_self=True)
    n = np.asarray(pvt_normals(jnp.asarray(pts), nbh))
    np.testing.assert_allclose(np.abs(n[:, 2]), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-4)


def test_pvt_normals_on_sphere_radial():
    pts, true_n = sphere_cloud(800, seed=2)
    nbh, _ = knn(jnp.asarray(pts), 10, exclude_self=True)
    n = np.asarray(pvt_normals(jnp.asarray(pts), nbh))
    dots = np.abs((n * true_n).sum(axis=1))
    assert dots.mean() > 0.98, dots.mean()


def test_orient_normals_sphere_outward():
    """After orientation, all sphere normals agree with the outward
    radial direction (sign-consistency, seeded from max-z which is
    forced outward)."""
    pts, true_n = sphere_cloud(600, seed=3)
    nbh, _ = knn(jnp.asarray(pts), 10, exclude_self=True)
    n = pvt_normals(jnp.asarray(pts), nbh)
    oriented = np.asarray(orient_normals(jnp.asarray(pts), n, nbh))
    signed = (oriented * true_n).sum(axis=1)
    # Coherent: all one sign, and seed forces outward.
    assert (signed > 0).mean() > 0.99, (signed > 0).mean()


def test_orient_propagation_matches_mst():
    """The parallel wavefront propagation agrees with the exact
    sequential MST+DFS on a well-sampled surface."""
    pts, true_n = sphere_cloud(400, seed=4)
    nbh, _ = knn(jnp.asarray(pts), 10, exclude_self=True)
    n = np.asarray(pvt_normals(jnp.asarray(pts), nbh))
    got = np.asarray(orient_normals(jnp.asarray(pts), jnp.asarray(n), nbh))
    want = orient_normals_mst(pts, n, np.asarray(nbh.idx))
    agree = ((got * want).sum(axis=1) > 0).mean()
    assert agree > 0.98, agree


def test_orient_plane_consistent():
    pts, _ = plane_grid(14)
    nbh, _ = knn(jnp.asarray(pts), 8, exclude_self=True)
    n = pvt_normals(jnp.asarray(pts), nbh)
    # Deliberately scramble signs.
    rng = np.random.default_rng(0)
    flip = np.where(rng.random(len(pts)) < 0.5, -1.0, 1.0).astype(np.float32)
    scrambled = jnp.asarray(np.asarray(n) * flip[:, None])
    oriented = np.asarray(orient_normals(jnp.asarray(pts), scrambled, nbh))
    assert (oriented[:, 2] > 0).all() or (oriented[:, 2] < 0).all()
    # Seed is max-z with n_z forced positive -> +z everywhere.
    assert (oriented[:, 2] > 0).all()


def test_tangent_basis_orthonormal_right_handed():
    from ngpd_tpu.core.normals import tangent_basis

    pts, _ = sphere_cloud(200, seed=7)
    nbh, _ = knn(jnp.asarray(pts), 10, exclude_self=True)
    nrm, t1, t2 = tangent_basis(jnp.asarray(pts), nbh)
    nrm, t1, t2 = map(np.asarray, (nrm, t1, t2))
    for v in (nrm, t1, t2):
        np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-5)
    np.testing.assert_allclose((nrm * t1).sum(1), 0.0, atol=1e-4)
    np.testing.assert_allclose((nrm * t2).sum(1), 0.0, atol=1e-4)
    np.testing.assert_allclose((t1 * t2).sum(1), 0.0, atol=1e-4)
    det = np.linalg.det(np.stack([nrm, t1, t2], axis=2))
    np.testing.assert_allclose(det, 1.0, atol=1e-4)
    # The normal component agrees with pvt_normals up to sign.
    ref = np.asarray(pvt_normals(jnp.asarray(pts), nbh))
    np.testing.assert_allclose(np.abs((nrm * ref).sum(1)), 1.0, atol=1e-5)


def test_laplacian_neighborhood_symmetric():
    """Union-symmetrized kNN graph: every edge is bidirectional,
    contains the plain kNN edges, has no self loops, positive mass."""
    from ngpd_tpu.core.process import laplacian_neighborhood

    pts, _ = sphere_cloud(150, seed=9)
    k = 6
    nbh, mass = laplacian_neighborhood(jnp.asarray(pts), k=k)
    idx, msk = np.asarray(nbh.idx), np.asarray(nbh.mask)
    assert (np.asarray(mass) > 0).all()
    edges = {(i, int(j)) for i in range(len(pts)) for j, m in zip(idx[i], msk[i]) if m}
    assert all(i != j for i, j in edges)
    assert all((j, i) in edges for i, j in edges)
    knn_nbh, _ = knn(jnp.asarray(pts), k, exclude_self=True)
    kidx = np.asarray(knn_nbh.idx)
    assert all(
        (i, int(j)) in edges for i in range(len(pts)) for j in kidx[i]
    )
    # No duplicate slots per row.
    for i in range(len(pts)):
        row = idx[i][msk[i]]
        assert len(row) == len(set(row.tolist()))
