"""Masked EdgeConv / DynamicEdgeConv over fixed-size patches.

The reference uses PyG ``EdgeConv`` on ragged per-patch graphs batched
into one big sparse graph (Model.py:59-90). TPU-first the patch is a
dense fixed block: features (B, P, F), intra-patch neighbor indices
(B, P, K) with a validity mask — gathers + masked reductions, every
shape static, everything batchable on the MXU.

EdgeConv semantics (Wang et al., DGCNN; as instantiated at
Model.py:63-74): h_i = aggr_j MLP([x_i, x_j - x_i]) with
MLP = Linear(2F -> F', no bias) + BatchNorm + LeakyReLU(0.2),
aggr = mean for the static convs, max for the dynamic ones
(Model.py:75-90).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over valid nodes only.

    PyG batches ragged patches so BN sees exactly the real nodes; with
    dense padding the statistics must ignore masked slots or the zeros
    skew mean/var.
    """

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        # x: (..., F); mask: (...,) boolean over the leading dims.
        feat = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(feat, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(feat, jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (feat,))
        bias = self.param("bias", nn.initializers.zeros, (feat,))

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            m = mask.astype(x.dtype)[..., None]
            cnt = jnp.maximum(jnp.sum(m), 1.0)
            mean = jnp.sum(x * m, axis=tuple(range(x.ndim - 1))) / cnt
            var = (
                jnp.sum((x - mean) ** 2 * m, axis=tuple(range(x.ndim - 1))) / cnt
            )
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * var
                )
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale + bias


class EdgeConv(nn.Module):
    """Static-graph EdgeConv with masked mean aggregation."""

    features: int
    negative_slope: float = 0.2
    train: bool = True

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, P, F)
        nbr_idx: jnp.ndarray,  # (B, P, K) local indices
        nbr_mask: jnp.ndarray,  # (B, P, K)
        node_mask: jnp.ndarray,  # (B, P)
    ) -> jnp.ndarray:
        # Gather neighbor features per node: (B, P, K, F).
        xj = x[jnp.arange(x.shape[0])[:, None, None], nbr_idx]
        edge_feat = jnp.concatenate(
            [jnp.broadcast_to(x[:, :, None, :], xj.shape), xj - x[:, :, None, :]],
            axis=-1,
        )  # (B, P, K, 2F)
        h = nn.Dense(self.features, use_bias=False, name="lin")(edge_feat)
        m = (nbr_mask & node_mask[:, :, None]).astype(h.dtype)[..., None]
        agg = jnp.sum(h * m, axis=2) / jnp.maximum(jnp.sum(m, axis=2), 1.0)
        agg = MaskedBatchNorm(use_running_average=not self.train, name="bn")(
            agg, node_mask
        )
        return nn.leaky_relu(agg, self.negative_slope)


class DynamicEdgeConv(nn.Module):
    """EdgeConv over a feature-space kNN graph rebuilt per layer
    (Model.py:75-90), masked max aggregation, k static."""

    features: int
    k: int = 8
    negative_slope: float = 0.2
    train: bool = True

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, node_mask: jnp.ndarray
    ) -> jnp.ndarray:
        # Pairwise feature distances within each patch (P <= ~128).
        d = jnp.sum(
            (x[:, :, None, :] - x[:, None, :, :]) ** 2, axis=-1
        )  # (B, P, P)
        big = jnp.asarray(jnp.inf, x.dtype)
        valid = node_mask[:, None, :] & node_mask[:, :, None]
        d = jnp.where(valid, d, big)
        # Exclude self.
        p = x.shape[1]
        d = d + jnp.where(jnp.eye(p, dtype=bool)[None], big, 0.0)
        neg, idx = jax.lax.top_k(-d, self.k)  # (B, P, K)
        nbr_mask = jnp.isfinite(-neg)
        idx = jnp.where(nbr_mask, idx, 0)
        xj = x[jnp.arange(x.shape[0])[:, None, None], idx]
        edge_feat = jnp.concatenate(
            [jnp.broadcast_to(x[:, :, None, :], xj.shape), xj - x[:, :, None, :]],
            axis=-1,
        )
        h = nn.Dense(self.features, use_bias=False, name="lin")(edge_feat)
        m = (nbr_mask & node_mask[:, :, None])[..., None]
        h = jnp.where(m, h, -jnp.inf)
        agg = jnp.max(h, axis=2)
        agg = jnp.where(jnp.isfinite(agg), agg, 0.0)
        agg = MaskedBatchNorm(use_running_average=not self.train, name="bn")(
            agg, node_mask
        )
        return nn.leaky_relu(agg, self.negative_slope)


def masked_global_pool(
    x: jnp.ndarray, node_mask: jnp.ndarray
) -> jnp.ndarray:
    """Concat of masked global max pool and mean pool
    (Model.py:141-145)."""
    m = node_mask[..., None]
    neg = jnp.where(m, x, -jnp.inf)
    mx = jnp.max(neg, axis=1)
    mx = jnp.where(jnp.isfinite(mx), mx, 0.0)
    s = jnp.sum(jnp.where(m, x, 0.0), axis=1)
    cnt = jnp.maximum(jnp.sum(node_mask, axis=1, keepdims=True), 1.0)
    return jnp.concatenate([mx, s / cnt], axis=-1)
