"""Patch2Normal model: shapes, masking invariance, losses, training step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ngpd_tpu.config import ModelConfig, TrainConfig
from ngpd_tpu.learn import losses
from ngpd_tpu.learn.train import (
    init_model,
    make_eval_step,
    make_predict_step,
    make_train_step,
)

SMALL = ModelConfig(hidden=(16, 16, 32, 64, 64, 64, 48, 24, 16), patch_size=24, patch_k=6)


def _batch(rng, cfg, b=4, valid=None):
    p, k = cfg.patch_size, cfg.patch_k
    x = rng.normal(size=(b, p, cfg.input_size)).astype(np.float32)
    idx = rng.integers(0, p, size=(b, p, k)).astype(np.int32)
    nbr_mask = np.ones((b, p, k), bool)
    node_mask = np.ones((b, p), bool)
    if valid is not None:
        node_mask[:, valid:] = False
        nbr_mask &= node_mask[:, :, None]
        nbr_mask &= node_mask[rng.integers(0, 1, size=(b,))[:, None, None] * 0, idx]
    y = rng.normal(size=(b, 3)).astype(np.float32)
    y /= np.linalg.norm(y, axis=1, keepdims=True)
    return {
        "x": jnp.asarray(x),
        "nbr_idx": jnp.asarray(idx),
        "nbr_mask": jnp.asarray(nbr_mask),
        "node_mask": jnp.asarray(node_mask),
        "y": jnp.asarray(y),
    }


def test_forward_shapes():
    rng = np.random.default_rng(0)
    model, state, tx = init_model(SMALL, TrainConfig(), jax.random.PRNGKey(0))
    batch = _batch(rng, SMALL)
    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["x"], batch["nbr_idx"], batch["nbr_mask"], batch["node_mask"],
        train=False,
    )
    assert out.shape == (4, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_padding_invariance():
    """Masked nodes must not influence the prediction: same valid data
    with different padding garbage -> same output."""
    rng = np.random.default_rng(1)
    model, state, tx = init_model(SMALL, TrainConfig(), jax.random.PRNGKey(1))
    batch = _batch(rng, SMALL, valid=16)
    # Corrupt padding slots.
    x2 = np.asarray(batch["x"]).copy()
    x2[:, 16:, :] = 999.0
    out1 = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["x"], batch["nbr_idx"], batch["nbr_mask"], batch["node_mask"],
        train=False,
    )
    out2 = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(x2), batch["nbr_idx"], batch["nbr_mask"], batch["node_mask"],
        train=False,
    )
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-4)


def test_losses_sign_invariance():
    rng = np.random.default_rng(2)
    y = rng.normal(size=(16, 3)).astype(np.float32)
    x = rng.normal(size=(16, 3)).astype(np.float32)
    a = float(losses.custom_val_loss(jnp.asarray(x), jnp.asarray(y)))
    b = float(losses.custom_val_loss(jnp.asarray(-x), jnp.asarray(y)))
    np.testing.assert_allclose(a, b, rtol=1e-6)
    a = float(losses.custom_cos_loss(jnp.asarray(x), jnp.asarray(y)))
    b = float(losses.custom_cos_loss(jnp.asarray(-x), jnp.asarray(y)))
    np.testing.assert_allclose(a, b, rtol=1e-5)
    # Perfect (anti-)alignment gives zero custom cos loss.
    z = float(losses.custom_cos_loss(jnp.asarray(y * -2.0), jnp.asarray(y)))
    assert z < 1e-6


def test_training_step_reduces_loss():
    rng = np.random.default_rng(3)
    model, state, tx = init_model(SMALL, TrainConfig(learning_rate=3e-3), jax.random.PRNGKey(3))
    step = jax.jit(make_train_step(model, tx))
    batch = _batch(rng, SMALL, valid=20)
    history = []
    for _ in range(30):
        state, metrics = step(state, batch)
        history.append(float(metrics["custom_val_loss"]))
    # Dropout keeps single-step losses noisy; the best and the recent
    # average must both clearly improve on the start.
    assert min(history) < history[0] * 0.6, history[:3] + history[-3:]
    assert np.mean(history[-10:]) < history[0] * 0.8


def test_predict_normalized():
    rng = np.random.default_rng(4)
    model, state, tx = init_model(SMALL, TrainConfig(), jax.random.PRNGKey(4))
    pred = make_predict_step(model)(state, _batch(rng, SMALL))
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(pred), axis=1), 1.0, atol=1e-5
    )


def test_eval_step_metrics():
    rng = np.random.default_rng(5)
    model, state, tx = init_model(SMALL, TrainConfig(), jax.random.PRNGKey(5))
    m = make_eval_step(model)(state, _batch(rng, SMALL))
    assert set(m) == {"val_loss", "cos_loss", "custom_val_loss", "custom_cos_loss"}


def test_better_dgcnn():
    """BetterDGCNN (the reference's parameterized DGCNN) lowers and runs."""
    from ngpd_tpu.models.dgcnn import BetterDGCNN

    rng = np.random.default_rng(7)
    m = BetterDGCNN(
        channels=(16, 16, 32, 32), num_edge_convs=2, num_dynamic_convs=2,
        head_channels=(32, 16, 8), k=4, emb_dims=64,
    )
    inp = np.concatenate(
        [rng.normal(size=(3, 17, 16)).astype(np.float32),
         rng.integers(0, 16, size=(3, 3, 16)).astype(np.float32)],
        axis=1,
    )
    vs = m.init(jax.random.PRNGKey(0), jnp.asarray(inp), train=False)
    out = m.apply(vs, jnp.asarray(inp), train=False)
    assert out.shape == (3, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_noise_persistence(tmp_path):
    from ngpd_tpu.core.noise import load_noise, save_noise

    pts = np.random.default_rng(0).random((20, 3)).astype(np.float32)
    name = save_noise(tmp_path, pts, 0.3)
    assert name.startswith("0_0_0.3_")
    back = np.asarray(load_noise(tmp_path / name))
    np.testing.assert_allclose(back, pts, atol=1e-7)


def test_export_roundtrip(tmp_path):
    """jax.export blob reproduces the live predict step (the TorchScript
    freeze/compare of modelTrans.py, TPU-native)."""
    from ngpd_tpu.learn.export import export_predict, load_exported, save_exported

    rng = np.random.default_rng(6)
    model, state, _ = init_model(SMALL, TrainConfig(), jax.random.PRNGKey(6))
    batch = _batch(rng, SMALL, valid=20)
    blob = export_predict(model, state, batch)
    save_exported(tmp_path / "model.shlo", blob)
    frozen = load_exported(tmp_path / "model.shlo")
    got = frozen(batch["x"], batch["nbr_idx"], batch["nbr_mask"], batch["node_mask"])
    want = make_predict_step(model)(state, batch)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
