"""kNN engine: brute-force, grid and 1-NN against a numpy oracle."""

import numpy as np
import jax.numpy as jnp

from ngpd_tpu.ops.knn import (
    estimate_cell_size,
    knn,
    knn_grid,
    nn_distances,
    pairwise_sqdist,
)

from fixtures import random_cloud


def _oracle(points, queries, k, exclude_self=False):
    d = ((queries[:, None, :] - points[None, :, :]) ** 2).sum(-1)
    if exclude_self:
        np.fill_diagonal(d, np.inf)
    idx = np.argsort(d, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(d, idx, axis=1), idx


def test_pairwise_sqdist():
    a, b = random_cloud(64, 1), random_cloud(96, 2)
    got = np.asarray(pairwise_sqdist(jnp.asarray(a), jnp.asarray(b)))
    want = ((a[:, None] - b[None]) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_knn_self_includes_self():
    pts = random_cloud(200, 3)
    nbh, d = knn(jnp.asarray(pts), 8)
    assert np.asarray(nbh.mask).all()
    # First neighbor is the point itself at distance 0 (KDTree semantics,
    # Selector.py:235-246).
    np.testing.assert_array_equal(np.asarray(nbh.idx)[:, 0], np.arange(200))
    np.testing.assert_allclose(np.asarray(d)[:, 0], 0.0, atol=1e-6)
    dw, iw = _oracle(pts, pts, 8)
    np.testing.assert_allclose(np.sort(np.asarray(d)), np.sort(dw), atol=1e-4)


def test_knn_exclude_self():
    pts = random_cloud(150, 4)
    nbh, d = knn(jnp.asarray(pts), 5, exclude_self=True)
    idx = np.asarray(nbh.idx)
    assert not (idx == np.arange(150)[:, None]).any()
    dw, _ = _oracle(pts, pts, 5, exclude_self=True)
    np.testing.assert_allclose(np.asarray(d), dw, atol=1e-4)


def test_knn_queries_and_tiling():
    pts = random_cloud(777, 5)  # non-multiple of tiles
    q = random_cloud(123, 6)
    nbh, d = knn(jnp.asarray(pts), 4, jnp.asarray(q), point_tile=128, query_tile=32)
    dw, iw = _oracle(pts, q, 4)
    np.testing.assert_allclose(np.asarray(d), dw, atol=1e-4)


def test_knn_num_valid():
    pts = random_cloud(100, 7)
    pts_padded = np.concatenate([pts, np.zeros((28, 3), np.float32)])
    nbh, d = knn(jnp.asarray(pts_padded), 6, num_valid=100)
    dw, _ = _oracle(pts, pts_padded, 6)
    np.testing.assert_allclose(np.asarray(d)[:100], dw[:100], atol=1e-4)
    assert np.asarray(nbh.idx).max() < 100


def test_nn_distances():
    a, b = random_cloud(80, 8), random_cloud(90, 9)
    d, i = nn_distances(jnp.asarray(a), jnp.asarray(b))
    dw, iw = _oracle(b, a, 1)
    np.testing.assert_allclose(np.asarray(d), dw[:, 0], atol=1e-4)
    np.testing.assert_array_equal(np.asarray(i), iw[:, 0])


def test_knn_grid_matches_bruteforce():
    pts = random_cloud(2000, 10)
    k = 8
    cell = estimate_cell_size(jnp.asarray(pts), k)
    nbh, d = knn_grid(jnp.asarray(pts), k, cell, capacity=96, query_tile=256)
    dw, _ = _oracle(pts, pts, k)
    np.testing.assert_allclose(np.asarray(d), dw, atol=1e-4)


def test_knn_grid_exclude_self():
    pts = random_cloud(500, 11)
    cell = estimate_cell_size(jnp.asarray(pts), 6)
    nbh, d = knn_grid(jnp.asarray(pts), 6, cell, capacity=128, exclude_self=True)
    dw, _ = _oracle(pts, pts, 6, exclude_self=True)
    np.testing.assert_allclose(np.asarray(d), dw, atol=1e-4)
