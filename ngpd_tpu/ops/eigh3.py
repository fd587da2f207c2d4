"""Closed-form batched symmetric 3x3 eigendecomposition.

Every voting tensor in the pipeline is a 3x3 symmetric matrix per point
(Decompositionor.py:169,210,236,246,258,276,300 all call
``torch.linalg.eigh`` on (N, 3, 3) batches). A general iterative eigh is
overkill for fixed 3x3: the trigonometric characteristic-root formula plus
cross-product / deflation eigenvectors runs entirely on the VPU with no
data-dependent iteration — exactly what XLA wants inside a scanned
denoise body.

Conventions match ``torch.linalg.eigh`` / ``jnp.linalg.eigh``:
eigenvalues ascending, eigenvectors in COLUMNS (``v[..., :, i]`` pairs
with ``w[..., i]``). Consumers that need descending order (getRInv,
Decompositionor.py:108-127 sorts descending) re-sort explicitly.

Algorithm: D. Eberly, "A Robust Eigensolver for 3x3 Symmetric Matrices"
(public geometric-tools note); batched here with `where`-selected
branches so the whole thing stays trace-friendly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_EPS = 1e-12


def _cross(a, b):
    return jnp.cross(a, b)


def _evec_from_cross(B: jnp.ndarray, lam: jnp.ndarray) -> jnp.ndarray:
    """Eigenvector of B for eigenvalue lam via row cross products.

    Rows of (B - lam I) span the orthogonal complement of the eigenspace;
    the largest cross product of row pairs is a robust eigenvector
    whenever lam is a simple eigenvalue.
    """
    C = B - lam[..., None, None] * jnp.eye(3, dtype=B.dtype)
    r0, r1, r2 = C[..., 0, :], C[..., 1, :], C[..., 2, :]
    c01, c02, c12 = _cross(r0, r1), _cross(r0, r2), _cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    best = jnp.stack([n01, n02, n12], axis=-1)
    choice = jnp.argmax(best, axis=-1)
    cand = jnp.stack([c01, c02, c12], axis=-2)  # (..., 3 cands, 3)
    v = jnp.take_along_axis(cand, choice[..., None, None], axis=-2)[..., 0, :]
    n = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
    # Degenerate (repeated eigenvalue picked): fall back to e0; callers
    # only hit this through the `where` branch that is then discarded.
    return jnp.where(
        n > _EPS,
        v / jnp.maximum(n, _EPS),
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], B.dtype), v.shape),
    )


def _orthobasis(w: jnp.ndarray):
    """Two unit vectors spanning the plane orthogonal to unit vector w."""
    swap = jnp.abs(w[..., 0]) > jnp.abs(w[..., 1])
    inv_xz = 1.0 / jnp.sqrt(
        jnp.maximum(w[..., 0] ** 2 + w[..., 2] ** 2, _EPS)
    )
    inv_yz = 1.0 / jnp.sqrt(
        jnp.maximum(w[..., 1] ** 2 + w[..., 2] ** 2, _EPS)
    )
    u_a = jnp.stack(
        [-w[..., 2] * inv_xz, jnp.zeros_like(inv_xz), w[..., 0] * inv_xz], axis=-1
    )
    u_b = jnp.stack(
        [jnp.zeros_like(inv_yz), w[..., 2] * inv_yz, -w[..., 1] * inv_yz], axis=-1
    )
    u = jnp.where(swap[..., None], u_a, u_b)
    v = _cross(w, u)
    return u, v


def _evec_deflated(B: jnp.ndarray, lam: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Eigenvector for lam constrained orthogonal to known eigenvector w."""
    u, v = _orthobasis(w)
    bu = jnp.einsum("...ij,...j->...i", B, u)
    bv = jnp.einsum("...ij,...j->...i", B, v)
    m00 = jnp.sum(u * bu, axis=-1) - lam
    m01 = jnp.sum(u * bv, axis=-1)
    m11 = jnp.sum(v * bv, axis=-1) - lam
    # Null vector of [[m00, m01], [m01, m11]] from its larger row.
    use0 = jnp.abs(m00) >= jnp.abs(m11)
    c0 = jnp.where(use0, m01, m11)
    c1 = jnp.where(use0, -m00, -m01)
    norm = jnp.sqrt(c0 * c0 + c1 * c1)
    ok = norm > _EPS
    c0 = jnp.where(ok, c0 / jnp.maximum(norm, _EPS), 1.0)
    c1 = jnp.where(ok, c1 / jnp.maximum(norm, _EPS), 0.0)
    return c0[..., None] * u + c1[..., None] * v


@functools.partial(jax.jit, static_argnames=())
def eigh3x3(A: jnp.ndarray):
    """Batched eigendecomposition of symmetric (..., 3, 3) matrices.

    Returns ``(w, v)``: eigenvalues (..., 3) ascending and eigenvectors
    (..., 3, 3) as columns, like jnp.linalg.eigh — but closed-form.
    """
    A = 0.5 * (A + jnp.swapaxes(A, -1, -2))  # symmetrize defensively
    dtype = A.dtype
    scale = jnp.max(jnp.abs(A), axis=(-2, -1))
    safe_scale = jnp.maximum(scale, _EPS)
    B = A / safe_scale[..., None, None]

    q = jnp.trace(B, axis1=-2, axis2=-1) / 3.0
    b00 = B[..., 0, 0] - q
    b11 = B[..., 1, 1] - q
    b22 = B[..., 2, 2] - q
    b01, b02, b12 = B[..., 0, 1], B[..., 0, 2], B[..., 1, 2]
    p1 = b01 * b01 + b02 * b02 + b12 * b12
    p2 = b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))
    safe_p = jnp.maximum(p, _EPS)

    Cm = (B - q[..., None, None] * jnp.eye(3, dtype=dtype)) / safe_p[..., None, None]
    detC = jnp.linalg.det(Cm)
    r = jnp.clip(detC / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0

    lam_hi = q + 2.0 * p * jnp.cos(phi)
    lam_lo = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    lam_mid = 3.0 * q - lam_hi - lam_lo
    w = jnp.stack([lam_lo, lam_mid, lam_hi], axis=-1)  # ascending

    # Eigenvectors: start from whichever extreme eigenvalue is better
    # separated from the middle one, deflate for the middle, cross for the
    # remaining one. Both branches are computed and `where`-selected.
    sep_hi = lam_hi - lam_mid
    sep_lo = lam_mid - lam_lo
    from_hi = sep_hi >= sep_lo

    v_hi_first = _evec_from_cross(B, lam_hi)
    v_lo_first = _evec_from_cross(B, lam_lo)
    v_first = jnp.where(from_hi[..., None], v_hi_first, v_lo_first)
    lam_first = jnp.where(from_hi, lam_hi, lam_lo)
    del lam_first  # (documentational; v_first already encodes the choice)

    v_mid = _evec_deflated(B, lam_mid, v_first)
    v_third = _cross(v_first, v_mid)

    v_lo = jnp.where(from_hi[..., None], v_third, v_first)
    v_hi = jnp.where(from_hi[..., None], v_first, v_third)
    v = jnp.stack([v_lo, v_mid, v_hi], axis=-1)  # columns, ascending order

    # Isotropic (p ~ 0) or zero matrices: identity eigenvectors.
    iso = (p < 1e-6)[..., None, None]
    v = jnp.where(iso, jnp.eye(3, dtype=dtype), v)

    w = w * safe_scale[..., None]
    w = jnp.where(scale[..., None] > 0, w, jnp.zeros_like(w))
    return w, v
