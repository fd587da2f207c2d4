"""Training losses (Model.py:44-51 and legacy NetworkController.py:96-97).

The sign-invariant "custom" losses reflect that a patch normal is only
defined up to orientation:
  custom_val_loss  = mean(min((x+y)^2, (x-y)^2))      (Model.py:44-47)
  custom_cos_loss  = mean(min(1-cos, 1+cos))          (Model.py:49-51)
The legacy DGCNN track trains alpha*cosine_embedding + beta*mse with
alpha=0, beta=1 (DenoisingGCN/train.py:96-97,124).
"""

from __future__ import annotations

import jax.numpy as jnp


def mse_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def cosine_similarity(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    num = jnp.sum(pred * target, axis=-1)
    den = jnp.maximum(
        jnp.linalg.norm(pred, axis=-1) * jnp.linalg.norm(target, axis=-1), 1e-8
    )
    return num / den


def cos_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean cosine similarity — the reference LOGS this raw value
    (Model.py:212), higher is better."""
    return jnp.mean(cosine_similarity(pred, target))


def custom_val_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    loss1 = jnp.mean((pred + target) ** 2, axis=-1)
    loss2 = jnp.mean((pred - target) ** 2, axis=-1)
    return jnp.mean(jnp.minimum(loss1, loss2))


def custom_cos_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    sim = cosine_similarity(pred, target)
    return jnp.mean(jnp.minimum(1.0 - sim, 1.0 + sim))


def all_losses(pred: jnp.ndarray, target: jnp.ndarray) -> dict[str, jnp.ndarray]:
    """The four metrics the reference logs per split (Model.py:150-215)."""
    return {
        "val_loss": mse_loss(pred, target),
        "cos_loss": cos_loss(pred, target),
        "custom_val_loss": custom_val_loss(pred, target),
        "custom_cos_loss": custom_cos_loss(pred, target),
    }
