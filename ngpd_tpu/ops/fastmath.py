"""Kernel-safe math primitives.

Mosaic (Pallas TPU) does not lower ``acos``/``atan2``; the voting
eigenvalue formula needs arccos once per point. ``acos_poly`` is the
Hastings 7-term approximation (Abramowitz & Stegun 4.4.45),
|error| <= 2e-8 over [-1, 1] — below float32 resolution, verified
against jnp.arccos in tests.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_COEFFS = (
    -0.0012624911,
    0.0066700901,
    -0.0170881256,
    0.0308918810,
    -0.0501743046,
    0.0889789874,
    -0.2145988016,
    1.5707963050,
)


def acos_poly(x: jnp.ndarray) -> jnp.ndarray:
    """Polynomial arccos, elementwise, Pallas-lowerable."""
    xc = jnp.clip(x, -1.0, 1.0)
    ax = jnp.abs(xc)
    p = jnp.full_like(ax, _COEFFS[0])
    for c in _COEFFS[1:]:
        p = p * ax + jnp.float32(c)
    r = p * jnp.sqrt(jnp.maximum(1.0 - ax, 0.0))
    return jnp.where(xc < 0, jnp.float32(np.pi) - r, r)
