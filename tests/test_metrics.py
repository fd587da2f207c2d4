"""Metric parity against numpy oracles (Utils.py:253-303 semantics)."""

import numpy as np
import jax.numpy as jnp

from ngpd_tpu.ops import metrics
from ngpd_tpu.ops.knn import knn

from fixtures import random_cloud


def _nn_sq(a, b):
    return (((a[:, None] - b[None]) ** 2).sum(-1)).min(axis=1)


def test_chamfer_vector_shape_and_values():
    a, b = random_cloud(60, 0), random_cloud(80, 1)
    cd = np.asarray(metrics.chamfer_distance(jnp.asarray(a), jnp.asarray(b)))
    assert cd.shape == (140,)
    want = np.concatenate([_nn_sq(a, b), _nn_sq(b, a)])
    np.testing.assert_allclose(cd, want, atol=1e-5)


def test_single_chamfer():
    a, b = random_cloud(50, 2), random_cloud(70, 3)
    got = np.asarray(metrics.single_chamfer_distance(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, _nn_sq(a, b), atol=1e-5)


def test_hausdorff():
    a, b = random_cloud(40, 4), random_cloud(40, 5)
    got = np.asarray(metrics.hausdorff_distance(jnp.asarray(a), jnp.asarray(b)))
    want = np.concatenate([np.sqrt(_nn_sq(a, b)), np.sqrt(_nn_sq(b, a))])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_paper_distance():
    gt, noisy = random_cloud(64, 6), random_cloud(48, 7)
    got = np.asarray(metrics.paper_distance(jnp.asarray(gt), jnp.asarray(noisy)))
    assert got.shape == (48,)  # one value per NOISY point (Utils.py:292-293)
    diag = np.linalg.norm(gt.max(0) - gt.min(0))
    want = np.sqrt(_nn_sq(noisy, gt)) / diag
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_average_edge_length_includes_self_quirk():
    pts = random_cloud(100, 8)
    nbh, d = knn(jnp.asarray(pts), 6)
    got = float(metrics.average_edge_length(jnp.asarray(pts), nbh))
    want = np.sqrt(np.asarray(d)).mean()  # includes the zero self edge
    np.testing.assert_allclose(got, want, rtol=1e-3)


def test_angular_errors():
    rng = np.random.default_rng(9)
    n = rng.normal(size=(100, 3))
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    assert float(metrics.mean_angular_error(jnp.asarray(n), jnp.asarray(n))) < 1e-2
    flipped = -n
    np.testing.assert_allclose(
        float(metrics.mean_angular_error(jnp.asarray(n), jnp.asarray(flipped))),
        180.0,
        atol=1e-2,
    )
    assert float(metrics.msae(jnp.asarray(n), jnp.asarray(n))) < 1e-3
