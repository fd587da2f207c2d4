"""Sharded paths vs single-device ground truth on the 8-device CPU mesh —
the fake-cluster layer the reference never had (SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ngpd_tpu.core.pipeline import denoise
from ngpd_tpu.ops import metrics
from ngpd_tpu.ops.knn import knn
from ngpd_tpu.parallel import (
    chamfer_distance_sharded,
    denoise_sharded,
    knn_sharded,
)
from ngpd_tpu.parallel.mesh import make_mesh, shard_points

from fixtures import sphere_cloud

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_knn_sharded_matches_single():
    pts, _ = sphere_cloud(512, seed=0)
    mesh = make_mesh(8)
    sp, n = shard_points(jnp.asarray(pts), mesh)
    nbh_s, d_s = knn_sharded(sp, 8, mesh)
    nbh, d = knn(jnp.asarray(pts), 8)
    np.testing.assert_allclose(np.asarray(d_s)[:n], np.asarray(d), atol=1e-5)


def test_knn_sharded_exclude_self():
    pts, _ = sphere_cloud(256, seed=1)
    mesh = make_mesh(8)
    sp, n = shard_points(jnp.asarray(pts), mesh)
    nbh_s, d_s = knn_sharded(sp, 6, mesh, exclude_self=True)
    nbh, d = knn(jnp.asarray(pts), 6, exclude_self=True)
    np.testing.assert_allclose(np.asarray(d_s)[:n], np.asarray(d), atol=1e-5)
    assert not (
        np.asarray(nbh_s.idx)[:n] == np.arange(n)[:, None]
    ).any()


def test_chamfer_sharded_matches_single():
    a, _ = sphere_cloud(300, seed=2)
    b, _ = sphere_cloud(260, seed=3)
    mesh = make_mesh(8)
    sa, na = shard_points(jnp.asarray(a), mesh)
    sb, nb = shard_points(jnp.asarray(b), mesh)
    # Padding rows would pollute the sharded sum; pad-free comparison:
    a8 = a[:296]  # multiple of 8
    b8 = b[:256]
    sa, _ = shard_points(jnp.asarray(a8), mesh)
    sb, _ = shard_points(jnp.asarray(b8), mesh)
    got = float(chamfer_distance_sharded(sa, sb, mesh))
    want = float(jnp.mean(metrics.chamfer_distance(jnp.asarray(a8), jnp.asarray(b8))))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_denoise_sharded_matches_single():
    """The multi-chip denoise reproduces the single-device result."""
    pts, nrm = sphere_cloud(256, seed=4)
    rng = np.random.default_rng(5)
    noisy = (pts + rng.normal(scale=0.03, size=pts.shape)).astype(np.float32)

    want, _, _ = denoise(jnp.asarray(noisy), jnp.asarray(nrm), iterations=2)

    mesh = make_mesh(8)
    sp, n = shard_points(jnp.asarray(noisy), mesh)
    sn, _ = shard_points(jnp.asarray(nrm), mesh, pad_value=0.0)
    got, _ = denoise_sharded(sp, sn, mesh, iterations=2)
    np.testing.assert_allclose(
        np.asarray(got)[:n], np.asarray(want), atol=5e-4
    )


def test_fused_denoise_sharded_matches_single():
    """The sharded Morton-window engine reproduces the single-device
    fused result across an 8-device mesh."""
    import jax.numpy as jnp
    from ngpd_tpu.core.fused import fused_denoise
    from ngpd_tpu.parallel.fused_sharded import fused_denoise_sharded

    pts, nrm = sphere_cloud(2048, seed=9)
    rng = np.random.default_rng(10)
    noisy = (pts + rng.normal(scale=0.03, size=pts.shape)).astype(np.float32)

    want, _, wc = fused_denoise(
        jnp.asarray(noisy), jnp.asarray(nrm), iterations=2,
        tile=128, window=128, group=1,
        threshold_method="exact", threshold_refresh=0,
    )

    mesh = make_mesh(8)
    sp, n = shard_points(jnp.asarray(noisy), mesh)
    sn, _ = shard_points(jnp.asarray(nrm), mesh, pad_value=0.0)
    got, _, gc = fused_denoise_sharded(
        sp, sn, mesh, iterations=2, tile=128, window=128, num_valid=n,
    )
    np.testing.assert_allclose(
        np.asarray(got)[:n], np.asarray(want), atol=2e-4
    )
    assert (np.asarray(gc)[:n] == np.asarray(wc)).mean() > 0.99


def test_sharded_fit_patch2normal_step_parity(tmp_path):
    """fit(..., mesh=) — the dp-sharded Patch2Normal training loop
    (the layer the reference leaves single-GPU, Config.py:43-44): one
    dp-sharded step matches the single-device step, and a mesh-driven
    fit epoch runs end to end."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ngpd_tpu.config import ModelConfig, TrainConfig
    from ngpd_tpu.learn.train import (
        _patch_batch_sharding,
        fit,
        init_model,
        make_train_step,
    )

    cfg = ModelConfig(
        hidden=(8, 8, 16, 16, 16, 16, 16, 8, 8), patch_size=16, patch_k=4
    )
    tcfg = TrainConfig(num_epochs=1, min_epochs=1, batch_size=16)
    model, state, tx = init_model(cfg, tcfg, jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    def make_batch(seed):
        r = np.random.default_rng(seed)
        p, k = cfg.patch_size, cfg.patch_k
        return {
            "x": jnp.asarray(r.normal(size=(16, p, cfg.input_size)).astype(np.float32)),
            "nbr_idx": jnp.asarray(r.integers(0, p, size=(16, p, k)).astype(np.int32)),
            "nbr_mask": jnp.ones((16, p, k), bool),
            "node_mask": jnp.ones((16, p), bool),
            "y": jnp.asarray(r.normal(size=(16, 3)).astype(np.float32)),
        }

    batch = make_batch(1)

    # Gradient parity is the meaningful check (a first Adam step maps
    # near-zero gradients to +-lr by sign, so params are sign-unstable).
    from ngpd_tpu.learn import losses as loss_mod

    @jax.jit
    def loss_and_grad(params, batch):
        def loss_fn(p):
            out = model.apply(
                {"params": p, "batch_stats": state.batch_stats},
                batch["x"], batch["nbr_idx"], batch["nbr_mask"],
                batch["node_mask"], train=False,
            )
            return loss_mod.all_losses(out, batch["y"])["custom_val_loss"]

        return jax.value_and_grad(loss_fn)(params)

    l_single, g_single = loss_and_grad(state.params, batch)

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("dp",))
    bshard = _patch_batch_sharding(mesh)
    params_r = jax.device_put(state.params, NamedSharding(mesh, P()))
    batch_s = {k: jax.device_put(v, bshard[k]) for k, v in batch.items()}
    l_mesh, g_mesh = loss_and_grad(params_r, batch_s)

    np.testing.assert_allclose(float(l_single), float(l_mesh), rtol=1e-5)
    for x, y in zip(
        jax.tree_util.tree_leaves(jax.device_get(g_single)),
        jax.tree_util.tree_leaves(jax.device_get(g_mesh)),
    ):
        np.testing.assert_allclose(x, y, rtol=1e-3, atol=1e-5)

    # A dp-sharded train step executes.
    step = jax.jit(make_train_step(model, tx))
    state_r = jax.device_put(state, NamedSharding(mesh, P()))
    _, m_mesh = step(state_r, batch_s)
    assert np.isfinite(float(m_mesh["custom_val_loss"]))

    # Mesh-driven fit executes end to end.
    fit(
        model, state, tx,
        lambda: iter([make_batch(2), make_batch(3)]),
        lambda: iter([make_batch(4)]),
        tcfg, log_dir=tmp_path / "logs", mesh=mesh,
    )
