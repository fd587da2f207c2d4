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


def test_eigvals_components_match_full():
    from ngpd_tpu.ops.eigh3 import eigh3x3_components, eigvals3x3_components

    rng = np.random.default_rng(3)
    A = rng.normal(size=(500, 3, 3)).astype(np.float32)
    A = A + np.swapaxes(A, 1, 2)
    t6 = tuple(
        jnp.asarray(A[:, a, b]) for a, b in
        [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
    )
    w_full, _ = eigh3x3_components(*t6)
    w_only = eigvals3x3_components(*t6)
    for a, b in zip(w_full, w_only):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_vu_filter_matches_eigenvector_form():
    from ngpd_tpu.core.pallas_fused import _vu_smooth_c
    from ngpd_tpu.ops.eigh3 import eigh3x3_components, vu_filter_components

    rng = np.random.default_rng(4)
    M = rng.normal(size=(2000, 4, 3))
    M /= np.linalg.norm(M, axis=2, keepdims=True)
    wgt = rng.uniform(0, 1, size=(2000, 4))
    T = np.einsum("nki,nk,nkj->nij", M, wgt, M).astype(np.float32)
    T[0] = np.eye(3)          # all eigenvalues kept
    T[1] = 0                  # none kept
    T[2] = np.outer([1, 0, 0], [1, 0, 0])      # rank 1
    T[3] = np.diag([1.0, 1.0, 0.0])            # rank 2, repeated kept
    T[4] = np.diag([0.5, 0.5 + 1e-7, 1.0])     # near-degenerate
    n = rng.normal(size=(2000, 3))
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    t6 = tuple(
        jnp.asarray(T[:, a, b]) for a, b in
        [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
    )
    nc = tuple(jnp.asarray(n[:, c], jnp.float32) for c in range(3))
    w, v = eigh3x3_components(*t6)
    ref = _vu_smooth_c(w, v, nc, 0.3, 3.0)
    new = vu_filter_components(t6, nc, 0.3, 3.0)
    ref = np.stack([np.asarray(r) for r in ref], 1)
    out = np.stack([np.asarray(r) for r in new], 1)
    # Exclude genuinely ill-posed threshold-boundary tensors.
    lam = np.linalg.eigvalsh(T.astype(np.float64))
    ok = ~np.any(np.abs(lam - 0.3) < 1e-4, axis=1)
    np.testing.assert_allclose(ref[ok], out[ok], atol=1e-4)
