"""Property tests for the closed-form 3x3 eigensolver.

Style follows test_RotationMatrix.py:42-118 (shape/orthonormality/
eigenstructure asserts on every intermediate)."""

import numpy as np
import jax.numpy as jnp

from ngpd_tpu.ops.eigh3 import eigh3x3


def _random_sym(n, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(n, 3, 3)) * scale
    return ((a + a.transpose(0, 2, 1)) / 2).astype(np.float32)


def _check(a, atol=2e-4):
    w, v = eigh3x3(jnp.asarray(a))
    w, v = np.asarray(w), np.asarray(v)
    # Ascending eigenvalues.
    assert np.all(np.diff(w, axis=1) >= -1e-4 * np.abs(w).max())
    # Eigenvalue parity with LAPACK.
    w_ref = np.linalg.eigvalsh(a.astype(np.float64))
    scale = np.maximum(np.abs(w_ref).max(axis=1, keepdims=True), 1e-6)
    np.testing.assert_allclose(w / scale, w_ref / scale, atol=atol)
    # Columns are unit, orthogonal, and satisfy A v = w v.
    gram = np.einsum("nij,nik->njk", v, v)
    np.testing.assert_allclose(gram, np.tile(np.eye(3), (len(a), 1, 1)), atol=3e-3)
    res = np.einsum("nij,njk->nik", a, v) - w[:, None, :] * v
    assert np.abs(res).max() / scale.max() < 5e-3, np.abs(res).max()


def test_random_matrices():
    _check(_random_sym(512, seed=1))


def test_scaled_matrices():
    _check(_random_sym(128, seed=2, scale=1e-4))
    _check(_random_sym(128, seed=3, scale=1e4))


def test_diagonal_and_degenerate():
    mats = np.stack(
        [
            np.diag([3.0, 2.0, 1.0]),
            np.diag([1.0, 1.0, 1.0]),  # isotropic
            np.diag([2.0, 2.0, 1.0]),  # double eigenvalue hi
            np.diag([2.0, 1.0, 1.0]),  # double eigenvalue lo
            np.zeros((3, 3)),
            np.outer([1.0, 2.0, 3.0], [1.0, 2.0, 3.0]),  # rank 1
        ]
    ).astype(np.float32)
    w, v = eigh3x3(jnp.asarray(mats))
    w, v = np.asarray(w), np.asarray(v)
    w_ref = np.linalg.eigvalsh(mats.astype(np.float64))
    np.testing.assert_allclose(w, w_ref, atol=3e-4)
    res = np.einsum("nij,njk->nik", mats, v) - w[:, None, :] * v
    assert np.abs(res).max() < 1e-3


def test_voting_tensor_structure():
    """NVT of a single normal: lambda_max = 1 with eigenvector = n
    (the property test_RotationMatrix.py:84-102 checks for T_j)."""
    rng = np.random.default_rng(7)
    n = rng.normal(size=(64, 3))
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    t = n[:, :, None] * n[:, None, :]
    w, v = eigh3x3(jnp.asarray(t.astype(np.float32)))
    w, v = np.asarray(w), np.asarray(v)
    np.testing.assert_allclose(w[:, 2], 1.0, atol=1e-4)
    np.testing.assert_allclose(w[:, :2], 0.0, atol=1e-3)
    dots = np.abs(np.sum(v[:, :, 2] * n, axis=1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-4)
