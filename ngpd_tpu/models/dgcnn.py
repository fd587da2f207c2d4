"""Legacy DGCNN — the GCN-Denoiser patch network, Flax rebuild.

Architecture of DenoisingGCN/GCNModel.py:69-158 (also duplicated at
PatchGeneration/Modules/Network/GCNModel.py:121-215):

  * input (B, 20, 64): 17 per-node features + 3 fixed neighbor indices
    (GCNModel.py:114-118);
  * three fixed-graph edge convs (64, 64, 128) over those 3 neighbors,
    edge feature ordered (x_j - x_i, x_i) (GCNModel.py:40,65), max-pooled
    over neighbors;
  * three dynamic feature-space kNN convs, k=8, self-inclusive
    (GCNModel.py:10-16 ranks by negative squared distance, so the top
    hit is the node itself), channels (256, 256, 256);
  * concat (1024) -> 1x1 conv to emb_dims + BN + LeakyReLU;
  * adaptive max+avg pool concat -> MLP 2048 -> 512 -> 256 -> 64 -> 3
    with BN + Dropout (GCNModel.py:104-112,152-157).

The torch version hard-codes CUDA in get_graph_feature_idx
(GCNModel.py:49) — device placement is JAX's job here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def _gather_nodes(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """x: (B, P, F); idx: (B, P, K) -> (B, P, K, F)."""
    return x[jnp.arange(x.shape[0])[:, None, None], idx]


def _edge_features(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """cat(x_j - x_i, x_i): (B, P, K, 2F) (GCNModel.py:40)."""
    xj = _gather_nodes(x, idx)
    xi = jnp.broadcast_to(x[:, :, None, :], xj.shape)
    return jnp.concatenate([xj - xi, xi], axis=-1)


def feature_knn(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Self-inclusive feature-space kNN (GCNModel.py:10-16)."""
    d = jnp.sum((x[:, :, None, :] - x[:, None, :, :]) ** 2, axis=-1)
    _, idx = jax.lax.top_k(-d, k)
    return idx


class _ConvBlock(nn.Module):
    features: int
    train: bool = False

    @nn.compact
    def __call__(self, e: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.features, use_bias=False)(e)  # 1x1 conv == dense
        h = nn.BatchNorm(use_running_average=not self.train, momentum=0.9)(h)
        h = nn.leaky_relu(h, 0.2)
        return jnp.max(h, axis=2)  # max over neighbors


class DGCNN(nn.Module):
    k: int = 8
    init_dims: int = 17
    emb_dims: int = 1024
    dropout: float = 0.5
    output_channels: int = 3

    @nn.compact
    def __call__(self, inputs: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """inputs: (B, 20, P) channel-first like the torch model
        (17 features + 3 int neighbor rows, GCNModel.py:114-118)."""
        x = jnp.swapaxes(inputs[:, 0:17, :], 1, 2)  # (B, P, 17)
        idx = inputs[:, 17:20, :].astype(jnp.int32)
        idx = jnp.swapaxes(idx, 1, 2)  # (B, P, 3)

        x1 = _ConvBlock(64, train, name="conv1")(_edge_features(x, idx))
        x2 = _ConvBlock(64, train, name="conv2")(_edge_features(x1, idx))
        x3 = _ConvBlock(128, train, name="conv3")(_edge_features(x2, idx))
        x4 = _ConvBlock(256, train, name="conv4")(
            _edge_features(x3, feature_knn(x3, self.k))
        )
        x5 = _ConvBlock(256, train, name="conv5")(
            _edge_features(x4, feature_knn(x4, self.k))
        )
        x6 = _ConvBlock(256, train, name="conv6")(
            _edge_features(x5, feature_knn(x5, self.k))
        )

        h = jnp.concatenate([x1, x2, x3, x4, x5, x6], axis=-1)  # (B, P, 1024)
        h = nn.Dense(self.emb_dims, use_bias=False, name="conv7")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn7")(h)
        h = nn.leaky_relu(h, 0.2)

        pooled = jnp.concatenate([jnp.max(h, axis=1), jnp.mean(h, axis=1)], axis=-1)

        h = nn.Dense(512, use_bias=False, name="linear1")(pooled)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn8")(h)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(256, name="linear2")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn9")(h)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(64, name="linear3")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn10")(h)
        h = nn.leaky_relu(h, 0.2)
        return nn.Dense(self.output_channels, name="linear4")(h)


def dgcnn_from_variables(variables) -> DGCNN:
    """Construct the DGCNN whose hyperparameters match a loaded
    variables tree (emb_dims from conv7's kernel, output width from
    linear4) — so checkpoints of any size drive the right model."""
    params = variables["params"]
    emb_dims = int(params["conv7"]["kernel"].shape[-1])
    out = int(params["linear4"]["kernel"].shape[-1])
    return DGCNN(emb_dims=emb_dims, output_channels=out)


class BetterDGCNN(nn.Module):
    """Parameterized DGCNN generalization — the reference's BetterDGCNN
    (PatchGeneration/Modules/Network/GCNModel.py:217-297): configurable
    counts of fixed-graph edge convs, dynamic kNN convs and head linears
    with an explicit channel list.

    channels: per-conv output widths, length num_edge_convs +
    num_dynamic_convs; head_channels: the post-pool MLP widths.
    """

    channels: tuple = (64, 64, 128, 256, 256, 256)
    num_edge_convs: int = 3
    num_dynamic_convs: int = 3
    head_channels: tuple = (512, 256, 64)
    k: int = 8
    emb_dims: int = 1024
    dropout: float = 0.5
    output_channels: int = 3

    @nn.compact
    def __call__(self, inputs: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        assert len(self.channels) == self.num_edge_convs + self.num_dynamic_convs
        x = jnp.swapaxes(inputs[:, 0:17, :], 1, 2)
        idx = jnp.swapaxes(inputs[:, 17:20, :].astype(jnp.int32), 1, 2)

        outs = []
        h = x
        for i in range(self.num_edge_convs):
            h = _ConvBlock(self.channels[i], train, name=f"conv{i}")(
                _edge_features(h, idx)
            )
            outs.append(h)
        for j in range(self.num_dynamic_convs):
            i = self.num_edge_convs + j
            h = _ConvBlock(self.channels[i], train, name=f"conv{i}")(
                _edge_features(h, feature_knn(h, self.k))
            )
            outs.append(h)

        h = jnp.concatenate(outs, axis=-1)
        h = nn.Dense(self.emb_dims, use_bias=False, name="emb")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="emb_bn")(h)
        h = nn.leaky_relu(h, 0.2)
        h = jnp.concatenate([jnp.max(h, axis=1), jnp.mean(h, axis=1)], axis=-1)
        for li, width in enumerate(self.head_channels):
            h = nn.Dense(width, use_bias=li > 0, name=f"head{li}")(h)
            h = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, name=f"head{li}_bn"
            )(h)
            h = nn.leaky_relu(h, 0.2)
            if li < 2:
                h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return nn.Dense(self.output_channels, name="out")(h)
