"""DGCNN trainer: shard-store streaming, loss drop, npz weight
roundtrip, and dp-sharded fit parity on the 8-device CPU mesh
(the training loop the reference leaves single-GPU,
DenoisingGCN/train.py:85-168)."""

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from ngpd_tpu.config import PatchConfig
from ngpd_tpu.io.obj import save_obj
from ngpd_tpu.learn.train_dgcnn import (
    ShardStore,
    dgcnn_losses,
    dgcnn_variables,
    fit_dgcnn,
    init_dgcnn,
    make_dgcnn_eval_step,
    make_dgcnn_train_step,
)
from ngpd_tpu.learn.weights import load_dgcnn_npz, save_variables_npz
from ngpd_tpu.meshproc.collector import build_mesh_dataset

pytestmark = pytest.mark.slow  # tier-2: heavy engine/e2e (pytest.ini)

CFG = PatchConfig(num_nodes=16)


@pytest.fixture(scope="module")
def shards(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("dgcnn_ds")
    rng = np.random.default_rng(0)
    n = 9
    xs, ys = np.meshgrid(
        np.arange(n, dtype=np.float32), np.arange(n, dtype=np.float32)
    )
    z = 0.1 * rng.normal(size=(n, n)).astype(np.float32)
    v = np.stack([xs.ravel(), ys.ravel(), z.ravel()], axis=1)
    f = []
    for i in range(n - 1):
        for j in range(n - 1):
            a, b, c, d = (
                i * n + j,
                i * n + j + 1,
                (i + 1) * n + j,
                (i + 1) * n + j + 1,
            )
            f.extend([[a, b, c], [b, d, c]])
    clean = tmp / "plane.obj"
    save_obj(str(clean), v, faces=np.asarray(f, np.int32))
    return build_mesh_dataset(
        [clean], tmp / "shards", levels=[0.1, 0.3], cfg=CFG
    )


def test_shard_store_batches(shards):
    store = ShardStore(shards, val_fraction=0.25, seed=0)
    total = len(store.train["x"]) + len(store.val["x"])
    assert total == 2 * 128  # both shards, every face
    batches = list(store.batches("train", 32))
    assert all(b["x"].shape == (32, 20, CFG.num_nodes) for b in batches)
    assert all(b["y"].shape == (32, 3) for b in batches)


@pytest.fixture(scope="module")
def compiled():
    """One jitted train/eval step shared by every test in this module —
    per-test step closures each get their own jit cache and recompile
    the full DGCNN fwd+bwd, which dominated this file's runtime."""
    model, state, tx = init_dgcnn(
        jax.random.PRNGKey(0), emb_dims=32, num_nodes=CFG.num_nodes
    )
    step = jax.jit(make_dgcnn_train_step(model, tx))
    eval_step = jax.jit(make_dgcnn_eval_step(model))
    return model, state, tx, step, eval_step


def test_train_step_reduces_loss(shards, compiled):
    store = ShardStore(shards, val_fraction=0.25, seed=0)
    model, state, tx, step, _ = compiled
    batch = next(store.batches("train", 32, shuffle=False))
    _, m0 = step(state, batch)
    best = float("inf")
    for _ in range(20):
        state, m = step(state, batch)
        best = min(best, float(m["mse_loss"]))
    assert best < float(m0["mse_loss"])
    assert np.isfinite(float(m["angular_deg"]))


def test_fit_and_npz_roundtrip(shards, compiled, tmp_path):
    store = ShardStore(shards, val_fraction=0.25, seed=0)
    model, _, tx, step, eval_step = compiled
    _, state, _ = init_dgcnn(
        jax.random.PRNGKey(1), emb_dims=32, num_nodes=CFG.num_nodes
    )
    state = fit_dgcnn(
        model, state, tx, store, batch_size=32, num_epochs=1,
        log_dir=tmp_path / "logs",
        train_step=step, eval_step=eval_step,
    )
    variables = jax.device_get(dgcnn_variables(state))
    p = tmp_path / "w.npz"
    save_variables_npz(p, variables)
    loaded = load_dgcnn_npz(p)

    batch = next(store.batches("val", 16, shuffle=False))
    a = model.apply(variables, batch["x"], train=False)
    b = model.apply(loaded, batch["x"], train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_sharded_step_parity_and_mesh_fit(shards, compiled, tmp_path):
    """One dp-sharded train step over the 8-device mesh matches the
    single-device step (the mesh changes placement, not math), and a
    mesh-driven fit epoch runs end to end."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    devs = np.asarray(jax.devices()[:8])
    mesh = Mesh(devs, ("dp",))
    store = ShardStore(shards, val_fraction=0.25, seed=0)
    batch = next(store.batches("train", 32, shuffle=False))

    model, _, tx, step, eval_step = compiled
    _, state, _ = init_dgcnn(
        jax.random.PRNGKey(2), emb_dims=32, num_nodes=CFG.num_nodes
    )

    s_single, m_single = step(state, batch)

    state_r = jax.device_put(state, NamedSharding(mesh, P()))
    batch_s = {
        "x": jax.device_put(
            batch["x"], NamedSharding(mesh, P("dp", None, None))
        ),
        "y": jax.device_put(batch["y"], NamedSharding(mesh, P("dp", None))),
    }
    s_mesh, m_mesh = step(state_r, batch_s)

    np.testing.assert_allclose(
        float(m_single["mse_loss"]), float(m_mesh["mse_loss"]), rtol=1e-5
    )
    a = jax.device_get(s_single.params)
    b = jax.device_get(s_mesh.params)
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    # Adam divides by sqrt(v): cross-shard reduction-order noise in the
    # gradients is amplified to ~1e-4 absolute in the updated params.
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(x, y, rtol=2e-3, atol=5e-4)

    # Mesh-driven fit executes a full epoch.
    fit_dgcnn(
        model, state, tx, store, batch_size=32, num_epochs=1,
        log_dir=tmp_path / "logs_mesh", mesh=mesh,
        train_step=step, eval_step=eval_step,
    )


def test_scan_superstep_fit_parity(shards, compiled, tmp_path):
    """fit_dgcnn(scan_steps=2) — the lax.scan superstep path that
    amortizes remote-tunnel dispatch — walks the identical batch
    sequence as the per-step path: same permutations (same store
    seed), same optimizer-step count, matching final params."""
    model, _, tx, step, eval_step = compiled
    _, state0, _ = init_dgcnn(
        jax.random.PRNGKey(3), emb_dims=32, num_nodes=CFG.num_nodes
    )

    s_step = fit_dgcnn(
        model, state0, tx,
        ShardStore(shards, val_fraction=0.25, seed=0),
        batch_size=32, num_epochs=1, log_dir=tmp_path / "l1",
        train_step=step, eval_step=eval_step,
    )
    s_scan = fit_dgcnn(
        model, state0, tx,
        ShardStore(shards, val_fraction=0.25, seed=0),
        batch_size=32, num_epochs=1, log_dir=tmp_path / "l2",
        scan_steps=2,
    )
    flat_a = jax.tree_util.tree_leaves(jax.device_get(s_step.params))
    flat_b = jax.tree_util.tree_leaves(jax.device_get(s_scan.params))
    for x, y in zip(flat_a, flat_b):
        # Adam's sqrt(v) amplifies scan-vs-loop reduction-order noise.
        np.testing.assert_allclose(x, y, rtol=2e-3, atol=5e-4)

    with pytest.raises(ValueError, match="scan_steps"):
        fit_dgcnn(
            model, state0, tx,
            ShardStore(shards, val_fraction=0.25, seed=0),
            batch_size=32, num_epochs=1, log_dir=tmp_path / "l3",
            scan_steps=2, mesh=Mesh(np.asarray(jax.devices()[:8]), ("dp",)),
        )


def test_dgcnn_losses_perfect_prediction():
    y = np.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]], np.float32)
    m = dgcnn_losses(y, y)
    assert float(m["cos_loss"]) < 1e-6
    assert float(m["mse_loss"]) < 1e-12
    assert float(m["angular_deg"]) < 0.1
