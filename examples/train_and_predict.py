"""Train + predict on a synthetic cloud — the TrainerV1000.ipynb /
PredictorSUPERVERSION.ipynb workflow, end to end in one script.

Generates a patch dataset from a sampled shape, trains Patch2Normal for
a few epochs, then predicts normals on a fresh noisy cloud and reports
angular error against ground truth vs the raw PVT estimate.

Usage: python examples/train_and_predict.py [--epochs 5]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import tempfile
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--points", type=int, default=1500)
    args = ap.parse_args()

    from ngpd_tpu.config import ModelConfig, PatchConfig, TrainConfig
    from ngpd_tpu.core import noise as noise_mod
    from ngpd_tpu.core.normals import orient_normals, pvt_normals
    from ngpd_tpu.io.obj import save_obj
    from ngpd_tpu.learn.dataset import PatchDataset, generate_dataset
    from ngpd_tpu.learn.predict import predict_cloud_normals
    from ngpd_tpu.learn.train import fit, init_model
    from ngpd_tpu.ops import metrics
    from ngpd_tpu.ops.knn import knn

    rng = np.random.default_rng(0)
    v = rng.normal(size=(args.points, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pts = v.astype(np.float32)
    gt_n = v.astype(np.float32)

    work = Path(tempfile.mkdtemp(prefix="ngpd_train_"))
    save_obj(work / "sphere.obj", pts, gt_n)

    cfg = TrainConfig(
        gaussian_noise_levels=(0.02, 0.03), impulsive_noise_levels=(0.02,),
        split=(0.7, 0.3, 0.0), num_epochs=args.epochs, min_epochs=1,
        batch_size=64,
    )
    pcfg = PatchConfig(num_nodes=32, patch_k=8)
    generate_dataset([work / "sphere.obj"], work / "ds", cfg, pcfg)
    train_ds = PatchDataset(work / "ds", "train")
    val_ds = PatchDataset(work / "ds", "val")
    print(f"dataset: {len(train_ds)} train / {len(val_ds)} val patches")

    mcfg = ModelConfig(
        hidden=(16, 16, 32, 64, 64, 64, 64, 32, 16),
        patch_size=pcfg.num_nodes, patch_k=pcfg.patch_k,
    )
    model, state, tx = init_model(mcfg, cfg, jax.random.PRNGKey(0))
    state = fit(
        model, state, tx,
        lambda: train_ds.batches(cfg.batch_size, seed=1),
        lambda: val_ds.batches(cfg.batch_size, seed=2),
        cfg, log_dir=work / "logs", checkpoint_dir=work / "ckpts",
    )

    # Fresh noisy cloud, predict normals, compare vs PVT estimate.
    key = jax.random.PRNGKey(7)
    nbh, d = knn(jnp.asarray(pts), 6)
    mel = metrics.average_edge_length(jnp.asarray(pts), nbh)
    noisy = noise_mod.generate_noise(
        key, jnp.asarray(pts), jnp.asarray(gt_n), 0.02, mel
    )
    nbh12, _ = knn(noisy, 12, exclude_self=True)
    pvt_est = orient_normals(noisy, pvt_normals(noisy, nbh12), nbh12)
    pred = predict_cloud_normals(model, state, noisy, pvt_est, pcfg)

    def sign_invariant_deg(a, b):
        dots = jnp.abs(jnp.clip(jnp.sum(a * b, axis=1), -1, 1))
        return float(jnp.degrees(jnp.mean(jnp.arccos(dots))))

    print(f"angular error vs GT — PVT estimate: "
          f"{sign_invariant_deg(pvt_est, jnp.asarray(gt_n)):.2f} deg, "
          f"learned: {sign_invariant_deg(pred, jnp.asarray(gt_n)):.2f} deg")
    print(f"artifacts under {work}")


if __name__ == "__main__":
    main()
