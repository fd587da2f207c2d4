"""Patch2Normal — the thesis-final patch -> center-normal regressor.

Flax rebuild of Pointcloud/Modules/Model.py:53-148 with the exact
config-driven stack (Config.py:6-17):

  * NUM_EDGECONV static EdgeConvs, hidden (64, 64, 128, 256, 256, 256);
  * optional DynamicEdgeConvs (NUM_DYNAMIC_EDGECONV, default 0);
  * all conv outputs concatenated (Model.py:124-139) -> NUM_PREPOOL
    no-bias Linear+BN+LeakyReLU (1024 -> 512);
  * masked global max+mean pool concat (Model.py:141-145);
  * NUM_POSTPOOL Linear+BN+Dropout(0.5) blocks (1024->256->64);
  * head Linear -> 3 (Model.py:116-119).

Input is a dense patch batch: x (B, P, 8) node features
[c(3), n(3), a(1), deg(1)] (Processor.getMDPatch, Processor.py:50-81),
intra-patch neighbor indices (B, P, K) + masks instead of a PyG
edge_index.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..config import ModelConfig
from .edgeconv import (
    DynamicEdgeConv,
    EdgeConv,
    MaskedBatchNorm,
    masked_global_pool,
)


class Patch2NormalModel(nn.Module):
    cfg: ModelConfig = ModelConfig()

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, P, input_size)
        nbr_idx: jnp.ndarray,  # (B, P, K)
        nbr_mask: jnp.ndarray,  # (B, P, K)
        node_mask: jnp.ndarray,  # (B, P)
        train: bool = False,
    ) -> jnp.ndarray:
        cfg = self.cfg
        num_convs = cfg.num_edgeconv + cfg.num_dynamic_edgeconv
        conv_outputs = []
        h = x
        for i in range(cfg.num_edgeconv):
            h = EdgeConv(cfg.hidden[i], train=train, name=f"layer{i}")(
                h, nbr_idx, nbr_mask, node_mask
            )
            conv_outputs.append(h)
        for j in range(cfg.num_dynamic_edgeconv):
            i = cfg.num_edgeconv + j
            h = DynamicEdgeConv(
                cfg.hidden[i], k=cfg.dynamic_edgeconv_k, train=train,
                name=f"layer{i}",
            )(h, node_mask)
            conv_outputs.append(h)

        h = jnp.concatenate(conv_outputs, axis=-1)  # (B, P, sum(hidden[:convs]))
        for p in range(cfg.num_prepool):
            i = num_convs + p
            h = nn.Dense(cfg.hidden[i], use_bias=False, name=f"layer{i}_lin")(h)
            h = MaskedBatchNorm(
                use_running_average=not train, name=f"layer{i}_bn"
            )(h, node_mask)
            h = nn.leaky_relu(h, cfg.leaky_slope)

        h = masked_global_pool(h, node_mask)  # (B, 2*hidden[prepool_end])
        # Postpool depth is DERIVED from hidden length: the reference's
        # NUM_POSTPOOL=3 (Config.py:12) disagrees with its own layer loop,
        # which builds len(HIDDEN) layers total and therefore only 2
        # postpool blocks (Model.py:59,126 iterate over HIDDEN).
        num_postpool = len(cfg.hidden) - num_convs - cfg.num_prepool
        for q in range(num_postpool):
            i = num_convs + cfg.num_prepool + q
            h = nn.Dense(cfg.hidden[i], name=f"layer{i}_lin")(h)
            # Per-patch vectors are all "valid" rows for BN.
            h = MaskedBatchNorm(
                use_running_average=not train, name=f"layer{i}_bn"
            )(h, jnp.ones(h.shape[:-1], bool))
            h = nn.Dropout(cfg.dropout_rate, deterministic=not train)(h)
        return nn.Dense(cfg.output_size, name="lastLayer")(h)

    def predict(self, variables, x, nbr_idx, nbr_mask, node_mask):
        """L2-normalized prediction (predict_step, Model.py:217-223)."""
        out = self.apply(variables, x, nbr_idx, nbr_mask, node_mask, train=False)
        return out / jnp.maximum(
            jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12
        )
