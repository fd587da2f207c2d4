"""Dense fixed-k neighborhoods — the TPU replacement for CSR `Selection`.

The reference models neighborhoods as a ragged CSR triple
``Selection(i, j, slices)`` expanded to COO for gathers and reduced with
torch_scatter (Selector.py:41-134). Ragged, data-dependent shapes defeat
XLA tiling, so here a neighborhood is a dense ``(Q, K)`` int32 index array
plus a ``(Q, K)`` bool validity mask:

  * ``Selection.getEdgeIndex()`` (Selector.py:107-118) -> plain gather
    ``values[idx]`` with shape ``(Q, K, ...)``.
  * ``Selection.scatter(src, "add"/"max"/"mean")`` (Selector.py:127-134)
    -> masked reductions over axis 1 (`sum`, `max`, `mean`).
  * ``Selection.filter(indices)`` (Selector.py:85-92) -> row gather
    ``Neighborhood(idx[rows], mask[rows])`` — but the hot denoise path
    never filters: every class step runs for all points and the result is
    selected with ``jnp.where`` (classes are data, not control flow).

Radius queries (Selector.py:214-233) become kNN-with-distance-mask so
shapes stay static.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Neighborhood(NamedTuple):
    """A dense k-neighborhood of Q query points.

    Attributes:
      idx: (Q, K) int32 — neighbor indices into the source point array.
           Invalid slots carry an arbitrary in-range index (typically the
           query itself) and must be ignored via ``mask``.
      mask: (Q, K) bool — True where the slot holds a real neighbor.
    """

    idx: jnp.ndarray
    mask: jnp.ndarray

    @property
    def num_queries(self) -> int:
        return self.idx.shape[0]

    @property
    def k(self) -> int:
        return self.idx.shape[1]

    def gather(self, values: jnp.ndarray) -> jnp.ndarray:
        """values: (N, ...) -> (Q, K, ...). Replaces COO expansion."""
        return values[self.idx]

    def degree(self) -> jnp.ndarray:
        """(Q,) float32 — number of valid neighbors per query."""
        return jnp.sum(self.mask, axis=1).astype(jnp.float32)

    def _blank(self, values: jnp.ndarray) -> jnp.ndarray:
        """Broadcast mask against values of shape (Q, K, ...)."""
        m = self.mask
        return m.reshape(m.shape + (1,) * (values.ndim - 2))

    def sum(self, values: jnp.ndarray) -> jnp.ndarray:
        """Masked sum over the neighbor axis: (Q, K, ...) -> (Q, ...)."""
        return jnp.sum(jnp.where(self._blank(values), values, 0.0), axis=1)

    def mean(self, values: jnp.ndarray) -> jnp.ndarray:
        """Masked mean over the neighbor axis (0 where degree == 0)."""
        deg = self.degree()
        deg = deg.reshape(deg.shape + (1,) * (values.ndim - 2))
        return self.sum(values) / jnp.maximum(deg, 1.0)

    def max(self, values: jnp.ndarray) -> jnp.ndarray:
        """Masked max over the neighbor axis (-inf slots replaced by min)."""
        neg = jnp.asarray(-jnp.inf, dtype=values.dtype)
        return jnp.max(jnp.where(self._blank(values), values, neg), axis=1)

    def weighted_sum(self, weights: jnp.ndarray, values: jnp.ndarray) -> jnp.ndarray:
        """sum_j w_ij * v_j with mask applied to the weights.

        weights: (Q, K); values: (Q, K, ...).
        """
        w = jnp.where(self.mask, weights, 0.0)
        w = w.reshape(w.shape + (1,) * (values.ndim - 2))
        return jnp.sum(w * values, axis=1)

    def and_mask(self, extra: jnp.ndarray) -> "Neighborhood":
        """Refine validity with an additional (Q, K) boolean mask."""
        return Neighborhood(self.idx, self.mask & extra)

    def filter_rows(self, rows: jnp.ndarray) -> "Neighborhood":
        """Subselect query rows — parity with Selection.filter
        (Selector.py:85-92). Only used off the hot path."""
        return Neighborhood(self.idx[rows], self.mask[rows])


def outer3(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched outer product a b^T for trailing dim 3: (..., 3) -> (..., 3, 3).

    The voting tensors and denoise steps are built from sums of these
    (Decompositionor.py:165, Denoiser.py:39).
    """
    return a[..., :, None] * b[..., None, :]


def matvec3(m: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Batched (..., 3, 3) @ (..., 3) -> (..., 3).

    Equivalent of torch.einsum("nij,nj->ni", ...) (Denoiser.py:41).
    """
    return jnp.sum(m * v[..., None, :], axis=-1)


def normalize(v: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """Safe L2 normalization (torch.nn.functional.normalize semantics)."""
    n = jnp.linalg.norm(v, axis=axis, keepdims=True)
    return v / jnp.maximum(n, eps)


def neighborhood_triangles(nbh: "Neighborhood"):
    """Triangles (i, a, b) whose three edges all exist in the graph.

    The reference's GraphBuilder.getRobustLaplacianFaces calls a
    TorchUtils.edge_to_faces that does not exist (GraphBuilder.py:72-75,
    drift); the evidently intended behavior — meshing a symmetric edge
    graph into triangle faces — is implemented here densely: for every
    point i and every pair (a, b) of its neighbors, (i, a, b) is a face
    iff b is also a neighbor of a. Each face is kept once (i < a < b).

    Returns (tri (N*k*k, 3) int32, valid (N*k*k,) bool), padded; compact
    with tri[valid] on the host.
    """
    idx = nbh.idx.astype(jnp.int32)
    n, k = idx.shape
    safe = jnp.where(nbh.mask, idx, n)
    # b in neighbors(a): compare neighbors-of-neighbors against own slots.
    non = jnp.where(
        nbh.mask[idx] & nbh.mask[:, :, None], safe[idx], n + 1
    )  # (N, k, k): neighbors of a_p
    mutual = jnp.any(
        non[:, :, None, :] == safe[:, None, :, None], axis=-1
    )  # (N, k_p, k_q)
    i = jnp.arange(n, dtype=jnp.int32)[:, None, None]
    ordered = (i < safe[:, :, None]) & (safe[:, :, None] < safe[:, None, :])
    ok = mutual & ordered & nbh.mask[:, :, None] & nbh.mask[:, None, :]
    tri = jnp.stack(
        [
            jnp.broadcast_to(i, (n, k, k)),
            jnp.broadcast_to(idx[:, :, None], (n, k, k)),
            jnp.broadcast_to(idx[:, None, :], (n, k, k)),
        ],
        axis=-1,
    ).reshape(-1, 3)
    return tri, ok.reshape(-1)
