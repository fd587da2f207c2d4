"""Point-track experiment: beat the PVT/PCA normal estimator on
held-out fandisk with a CAD + organic training mix.

Round-1 finding (docs/TRAINING.md): four organic shapes tie the
classical estimator on fandisk (10.40 vs 9.46 deg) and overfit with more
epochs; the diagnosis was missing shape DIVERSITY. This experiment
executes that diagnosis: the training mix pairs CAD-style shapes
(teapot, rocker-arm, beetle, trim-star) with organic ones
(stanford-bunny, cow, homer, spot), fandisk strictly held out, and the
eval reports angular error overall AND on feature regions (edge/corner
points by MD classification of the clean cloud) where PCA normals
smear.

  python examples/train_point_track.py [--epochs 20] [--points 6000]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

REF = Path("/root/reference")
WORK = Path("/tmp/ngpd_pointtrack")

TRAIN_SHAPES = [
    # CAD-style: creases, flats, corners.
    REF / "common-3d-test-models-master/teapot.obj",
    REF / "common-3d-test-models-master/rocker-arm.obj",
    REF / "common-3d-test-models-master/beetle.obj",
    REF / "models/trim-star.obj",
    # Organic: smooth curvature.
    REF / "common-3d-test-models-master/stanford-bunny.obj",
    REF / "common-3d-test-models-master/cow.obj",
    REF / "common-3d-test-models-master/homer.obj",
    REF / "common-3d-test-models-master/spot.obj",
]
HELD_OUT = REF / "common-3d-test-models-master/fandisk.obj"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--points", type=int, default=6000)
    ap.add_argument("--noise", type=float, default=0.02)
    ap.add_argument("--skip-dataset", action="store_true")
    ap.add_argument(
        "--data-only", action="store_true",
        help="generate the patch dataset and exit (run this stage with "
        "JAX_PLATFORMS=cpu: per-shape sampling compiles are much faster "
        "on the host than through the remote TPU compiler)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ngpd_tpu.config import ModelConfig, PatchConfig, TrainConfig
    from ngpd_tpu.core import noise as noise_mod
    from ngpd_tpu.core.normals import orient_normals, pvt_normals
    from ngpd_tpu.core.process import md_features
    from ngpd_tpu.io.obj import read_obj
    from ngpd_tpu.io.sampling import sample_mesh
    from ngpd_tpu.learn.dataset import PatchDataset, generate_dataset
    from ngpd_tpu.learn.predict import predict_cloud_normals
    from ngpd_tpu.learn.train import fit, init_model
    from ngpd_tpu.ops import metrics
    from ngpd_tpu.ops.knn import knn

    WORK.mkdir(parents=True, exist_ok=True)
    tcfg = TrainConfig(
        gaussian_noise_levels=(0.01, 0.02, 0.03),
        impulsive_noise_levels=(0.02,),
        split=(0.75, 0.25, 0.0),
        num_epochs=args.epochs,
        min_epochs=3,
        batch_size=64,
        early_stopping_patience=5,
    )
    pcfg = PatchConfig(num_nodes=48, patch_k=8)

    if not args.skip_dataset or not (WORK / "ds").exists():
        from ngpd_tpu.io.obj import save_obj
        from ngpd_tpu.meshproc.synthetic import cad_suite

        raws = []
        syn = cad_suite()
        sources = [(p.stem, None) for p in TRAIN_SHAPES]
        sources += [(name, mesh) for name, mesh in syn.items()]
        for i, (stem, mesh) in enumerate(sources):
            if mesh is None:
                data = read_obj(str(TRAIN_SHAPES[i]))
                v, fv = data.v, data.fv
            else:
                v, fv = np.asarray(mesh.v), np.asarray(mesh.f)
            cloud = sample_mesh(v, fv, args.points, seed=1)
            dst = WORK / "raw" / f"{stem}.obj"
            dst.parent.mkdir(parents=True, exist_ok=True)
            save_obj(
                str(dst), np.asarray(cloud.points), np.asarray(cloud.normals)
            )
            raws.append(dst)
        manifest = generate_dataset(raws, WORK / "ds", tcfg, pcfg)
        total = sum(s["count"] for s in manifest["shards"])
        print(f"dataset: {total} patches over {len(raws)} shapes")
    if args.data_only:
        return

    train_ds = PatchDataset(WORK / "ds", "train")
    val_ds = PatchDataset(WORK / "ds", "val")
    print(f"{len(train_ds)} train / {len(val_ds)} val patches")

    mcfg = ModelConfig(patch_size=pcfg.num_nodes, patch_k=pcfg.patch_k)
    model, state, tx = init_model(mcfg, tcfg, jax.random.PRNGKey(0))
    state = fit(
        model, state, tx,
        lambda: train_ds.batches(tcfg.batch_size, seed=1),
        lambda: val_ds.batches(tcfg.batch_size, seed=2),
        tcfg, log_dir=WORK / "logs", checkpoint_dir=WORK / "ckpts",
    )

    # ---- held-out fandisk eval --------------------------------------
    data = read_obj(str(HELD_OUT))
    cloud = sample_mesh(data.v, data.fv, args.points, seed=7)
    pts = jnp.asarray(cloud.points)
    gt_n = jnp.asarray(cloud.normals)
    nbh6, _ = knn(pts, 6)
    mel = metrics.average_edge_length(pts, nbh6)
    noisy = noise_mod.generate_noise(
        jax.random.PRNGKey(11), pts, gt_n, args.noise, mel
    )
    nbh12, _ = knn(noisy, 12, exclude_self=True)
    pvt_est = orient_normals(noisy, pvt_normals(noisy, nbh12), nbh12)
    pred = predict_cloud_normals(model, state, noisy, pvt_est, pcfg)

    # Feature regions from the CLEAN cloud's MD classification.
    md_classes = np.asarray(md_features(pts, gt_n))
    feature_mask = md_classes >= 2  # edge/corner

    def ang_deg(a, b, mask=None):
        dots = jnp.abs(jnp.clip(jnp.sum(a * b, axis=1), -1, 1))
        deg = jnp.degrees(jnp.arccos(dots))
        if mask is not None:
            deg = deg[np.asarray(mask)]
        return float(jnp.mean(deg))

    rows = {
        "pvt_all": ang_deg(pvt_est, gt_n),
        "learned_all": ang_deg(pred, gt_n),
        "pvt_feature": ang_deg(pvt_est, gt_n, feature_mask),
        "learned_feature": ang_deg(pred, gt_n, feature_mask),
        "num_feature_points": int(feature_mask.sum()),
    }
    print(json.dumps(rows, indent=1))
    (WORK / "eval.json").write_text(json.dumps(rows, indent=2))


if __name__ == "__main__":
    main()
