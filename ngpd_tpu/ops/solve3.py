"""Guarded batched 3x3 linear solves.

The denoise steps build one small normal-equation system per point and
solve it with ``torch.linalg.inv_ex``, keeping the old position whenever
the matrix is singular (Denoiser.py:43-46, 80-83, 163-167, 210-214). Here
the solve is the closed-form adjugate/determinant rule — branch-free,
VPU-only — with a relative-determinant guard that reproduces the
``info == 0`` mask semantics.
"""

from __future__ import annotations

import jax.numpy as jnp


def det3(A: jnp.ndarray) -> jnp.ndarray:
    """Determinant of (..., 3, 3)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)


def adjugate3(A: jnp.ndarray) -> jnp.ndarray:
    """Adjugate (transposed cofactor matrix) of (..., 3, 3)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    row0 = jnp.stack([e * i - f * h, c * h - b * i, b * f - c * e], axis=-1)
    row1 = jnp.stack([f * g - d * i, a * i - c * g, c * d - a * f], axis=-1)
    row2 = jnp.stack([d * h - e * g, b * g - a * h, a * e - b * d], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def solve3x3_components(rows, b, fallback, rcond: float = 1e-7):
    """Component form of solve3x3_guarded for Pallas kernels.

    rows: 3 row-tuples of the symmetric matrix's component arrays;
    b, fallback: component triples. Returns (x triple, ok mask).
    """
    (a, bb, c), (d, e, f), (g, h, i) = rows
    det = a * (e * i - f * h) - bb * (d * i - f * g) + c * (d * h - e * g)
    scale = jnp.abs(a)
    for v in (bb, c, d, e, f, g, h, i):
        scale = jnp.maximum(scale, jnp.abs(v))
    ok = jnp.abs(det) > rcond * jnp.maximum(scale, 1e-30) ** 3
    inv_det = 1.0 / jnp.where(ok, det, 1.0)
    adj = (
        (e * i - f * h, c * h - bb * i, bb * f - c * e),
        (f * g - d * i, a * i - c * g, c * d - a * f),
        (d * h - e * g, bb * g - a * h, a * e - bb * d),
    )
    x = tuple(
        (r[0] * b[0] + r[1] * b[1] + r[2] * b[2]) * inv_det for r in adj
    )
    x = tuple(jnp.where(ok, xi, fi) for xi, fi in zip(x, fallback))
    return x, ok


def solve3x3_guarded(
    A: jnp.ndarray,
    b: jnp.ndarray,
    fallback: jnp.ndarray,
    rcond: float = 1e-7,
):
    """Solve A x = b per batch row; rows with (near-)singular A get
    ``fallback`` instead — the inv_ex info-mask semantics of
    Denoiser.py:43-46.

    Args:
      A: (..., 3, 3); b, fallback: (..., 3).
    Returns:
      (x, ok): solution (..., 3) and the (...,) bool solvability mask.
    """
    det = det3(A)
    scale = jnp.max(jnp.abs(A), axis=(-2, -1))
    ok = jnp.abs(det) > rcond * jnp.maximum(scale, 1e-30) ** 3
    ok = ok & jnp.isfinite(det)
    adj = adjugate3(A)
    x = jnp.einsum("...ij,...j->...i", adj, b) / jnp.where(ok, det, 1.0)[..., None]
    x = jnp.where(ok[..., None], x, fallback)
    return x, ok
