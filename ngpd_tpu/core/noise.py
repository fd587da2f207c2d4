"""Synthetic corruption — the domain's fault injection.

Port of the semantics of Noise.generateNoise (Noise.py:33-59), rebuilt on
jax.random (stateless, reproducible across hosts):

  * stdev = mean_edge_length * noise_level (Noise.py:52).
  * direction 0 ("along normal"): only the FIRST column of the (N, 3)
    Gaussian draw scales the normal (Noise.py:54) — preserved exactly so
    noise statistics match.
  * direction 1: the full (N, 3) draw is the offset.
  * impulsive (type 1): a random (1 - level) fraction of offsets is
    zeroed (Noise.py:55-57).

Resolved reference drift: FileDataset.process calls
``generateNoise(level, 0, 0)`` where the second positional is
mean_edge_length, silently producing zero-stdev noise
(FileDataset.py:262-267 vs Noise.py:33). Here mean_edge_length is a
required keyword so the bug cannot be re-created.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

GAUSSIAN = 0
IMPULSIVE = 1
ALONG_NORMAL = 0
RANDOM_DIRECTION = 1


@functools.partial(jax.jit, static_argnames=("noise_type", "direction"))
def generate_noise(
    key: jax.Array,
    points: jnp.ndarray,
    normals: jnp.ndarray,
    noise_level: float,
    mean_edge_length: jnp.ndarray,
    noise_type: int = GAUSSIAN,
    direction: int = ALONG_NORMAL,
) -> jnp.ndarray:
    """Return noisy positions; ground truth is whatever the caller keeps.

    Args:
      key: PRNG key.
      points: (N, 3) clean positions.
      normals: (N, 3) unit normals (used when direction == ALONG_NORMAL).
      noise_level: relative intensity in [0, 1].
      mean_edge_length: scalar scale (typically the mean 6/12-NN edge
        length, Processor.py:197).
    """
    n = points.shape[0]
    k_gauss, k_perm = jax.random.split(key)
    std = mean_edge_length * noise_level
    draws = jax.random.normal(k_gauss, (n, 3), dtype=points.dtype) * std
    if direction == RANDOM_DIRECTION:
        offset = draws
    else:
        offset = normals * draws[:, 0:1]
    if noise_type == IMPULSIVE:
        # Keep only a `noise_level` fraction of offsets (Noise.py:55-57
        # zeroes a random (1 - level) fraction).
        perm = jax.random.permutation(k_perm, n)
        keep_count = n - jnp.floor(n * (1.0 - noise_level)).astype(jnp.int32)
        rank = jnp.zeros(n, dtype=jnp.int32).at[perm].set(jnp.arange(n, dtype=jnp.int32))
        offset = jnp.where((rank < keep_count)[:, None], offset, 0.0)
    return points + offset


def save_noise(noise_dir, points, noise_level, noise_type=GAUSSIAN,
               direction=ALONG_NORMAL):
    """Persist noisy positions (Noise.saveNoise, Noise.py:90-102): one
    .npz per realization, named {type}_{direction}_{level}_{id}."""
    from pathlib import Path

    import numpy as np

    d = Path(noise_dir)
    d.mkdir(parents=True, exist_ok=True)
    noise_id = len(list(d.iterdir()))
    name = f"{noise_type}_{direction}_{noise_level}_{noise_id}.npz"
    np.savez_compressed(d / name, v=np.asarray(points))
    return name


def load_noise(file_path):
    """Load persisted noisy positions (Noise.loadNoise, Noise.py:104-108)."""
    from pathlib import Path

    import numpy as np

    p = Path(file_path)
    assert p.suffix == ".npz" and p.is_file(), p
    return jnp.asarray(np.load(p)["v"])
