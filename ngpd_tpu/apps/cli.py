"""Command-line interface.

The reference's "CLI" is a pile of notebooks (PostProcessing.ipynb,
TrainerV1000.ipynb, PredictorSUPERVERSION.ipynb, ...) plus the Qt app's
buttons (GCNDenoiser.cpp:11-33). Here every workflow is a subcommand:

  python -m ngpd_tpu.apps.cli denoise noisy.obj -o out.obj
  python -m ngpd_tpu.apps.cli denoise noisy.obj --gt clean.obj --until-min
  python -m ngpd_tpu.apps.cli eval clean.obj denoised.obj
  python -m ngpd_tpu.apps.cli make-dataset raw/*.obj -o patchds/
  python -m ngpd_tpu.apps.cli train patchds/ -o ckpts/
  python -m ngpd_tpu.apps.cli predict-normals noisy.obj --ckpt ckpts/ -o n.xyz
  python -m ngpd_tpu.apps.cli denoise-mesh noisy.obj -o out.obj [--gt clean.obj]
"""

from __future__ import annotations

import argparse
import json
import os
from pathlib import Path

import numpy as np


def _load_cloud(path):
    from ..io.obj import load_obj
    from ..io.ply import load_ply
    from ..io.xyz import load_xyz

    suffix = Path(path).suffix
    if suffix == ".obj":
        return load_obj(path)
    if suffix in (".xyz", ".clean_xyz"):
        return load_xyz(path)
    if suffix == ".ply":
        return load_ply(path)
    raise SystemExit(f"unsupported input format: {suffix}")


def _estimated_normals(points, k=12):
    from ..core.normals import orient_normals, pvt_normals
    from ..ops.knn import knn

    nbh, _ = knn(points, k, exclude_self=True)
    return orient_normals(points, pvt_normals(points, nbh), nbh)


def cmd_denoise(args):
    import jax.numpy as jnp

    from ..config import DenoiseConfig
    from ..core.fused import fused_denoise
    from ..core.pipeline import denoise, denoise_until_minimum_error
    from ..io.obj import save_obj

    cloud = _load_cloud(args.input)
    pts = cloud.points
    nrm = cloud.normals if cloud.has_normals() else _estimated_normals(pts)
    cfg = DenoiseConfig(feature_k=args.feature_k, step_k=args.step_k)
    strategy = tuple(args.strategy.split(","))
    if args.until_min:
        if not args.gt:
            raise SystemExit("--until-min requires --gt")
        gt = _load_cloud(args.gt).points
        out, nrm_out, err, iters = denoise_until_minimum_error(
            pts, nrm, gt, cfg, strategy=strategy,
            max_iterations=args.iterations or 64,
        )
        print(f"stopped after {int(iters)} iterations, error {float(err):.4e}")
    elif args.fused or len(cloud) >= 100_000:
        import jax

        if jax.devices()[0].platform not in ("cpu",):
            from ..core.pallas_fused import pallas_denoise_hybrid

            out, nrm_out, _ = pallas_denoise_hybrid(
                pts, nrm, cfg, strategy=strategy,
                iterations=args.iterations or 2, window=args.window,
                lagged_nvt1=args.lagged_nvt1,
            )
        else:
            out, nrm_out, _ = fused_denoise(
                pts, nrm, cfg, strategy=strategy,
                iterations=args.iterations or 2, window=args.window,
            )
    else:
        out, nrm_out, _ = denoise(
            pts, nrm, cfg, strategy=strategy, iterations=args.iterations or 2
        )
    save_obj(args.output, np.asarray(out), np.asarray(nrm_out))
    print(f"wrote {args.output}")


def cmd_eval(args):
    import jax.numpy as jnp

    from ..ops import metrics

    gt = _load_cloud(args.gt).points
    test = _load_cloud(args.input).points
    out = {
        "cd": float(jnp.mean(metrics.chamfer_distance(test, gt))),
        "scd": float(jnp.mean(metrics.single_chamfer_distance(test, gt))),
        "hausdorff_max": float(jnp.max(metrics.hausdorff_distance(test, gt))),
        "paper": float(jnp.mean(metrics.paper_distance(gt, test))),
    }
    print(json.dumps(out, indent=1))


def cmd_make_dataset(args):
    from ..config import TrainConfig
    from ..learn.dataset import generate_dataset

    cfg = TrainConfig()
    manifest = generate_dataset(
        args.inputs, args.output, train_cfg=cfg,
        sample_points=args.sample_points, balance=not args.no_balance,
    )
    total = sum(s["count"] for s in manifest["shards"])
    print(f"wrote {len(manifest['shards'])} shards, {total} patches")


def cmd_train(args):
    import jax

    from ..config import ModelConfig, TrainConfig
    from ..learn.dataset import PatchDataset
    from ..learn.train import fit, init_model

    train_cfg = TrainConfig(
        num_epochs=args.epochs, batch_size=args.batch_size
    )
    model, state, tx = init_model(
        ModelConfig(), train_cfg, jax.random.PRNGKey(train_cfg.seed)
    )
    train_ds = PatchDataset(args.dataset, "train")
    val_ds = PatchDataset(args.dataset, "val")
    print(f"train {len(train_ds)} patches, val {len(val_ds)}")
    state = fit(
        model, state, tx,
        lambda: train_ds.batches(train_cfg.batch_size, seed=0),
        lambda: val_ds.batches(train_cfg.batch_size, seed=1),
        train_cfg,
        log_dir=Path(args.output) / "logs",
        checkpoint_dir=Path(args.output) / "ckpts",
    )
    print(f"done; checkpoints under {args.output}/ckpts")


def cmd_predict_normals(args):
    import jax

    from ..config import ModelConfig, TrainConfig
    from ..io.xyz import save_xyz
    from ..learn.checkpoints import CheckpointManager
    from ..learn.predict import predict_cloud_normals
    from ..learn.train import init_model

    cloud = _load_cloud(args.input)
    model, state, _ = init_model(
        ModelConfig(), TrainConfig(), jax.random.PRNGKey(0)
    )
    if args.ckpt:
        state = CheckpointManager(args.ckpt).restore(state)
    normals = predict_cloud_normals(model, state, cloud.points)
    save_xyz(args.output, cloud.valid_points(), np.asarray(normals))
    print(f"wrote {args.output}")


def _load_dgcnn_ckpt(path: str):
    """Checkpoint file of either lineage -> Flax DGCNN variables:
    ``.npz`` (ngpd_tpu weight archives) or ``.t7``/``.pt`` (reference
    torch state dicts / TorchScript exports)."""
    if path.endswith(".npz"):
        from ..learn.weights import load_dgcnn_npz

        return load_dgcnn_npz(path)
    from ..learn.torch_interop import load_dgcnn_from_torch

    return load_dgcnn_from_torch(path)


def cmd_denoise_mesh(args):
    from ..config import GNFConfig
    from ..io.obj import read_obj, save_obj
    from ..meshproc import metrics as mesh_metrics
    from ..meshproc.filtering import guided_normal_filter
    from ..meshproc.trimesh import TriMesh

    data = read_obj(args.input)
    if data.fv.shape[0] == 0:
        raise SystemExit("denoise-mesh needs a triangle mesh input")
    mesh = TriMesh.from_numpy(data.v, data.fv)
    cfg = GNFConfig(
        radius_scale=args.radius_scale,
        sigma_s_scale=args.sigma_s_scale,
        normal_iterations=args.normal_iterations,
        vertex_iterations=args.vertex_iterations,
        sigma_r=args.sigma_r,
        guidance_smooth_iterations=args.guidance_smooth,
        guidance_smooth_sigma=args.guidance_smooth_sigma,
    )
    gt_mesh = None
    if args.gt:
        gt_data = read_obj(args.gt)
        gt_mesh = TriMesh.from_numpy(gt_data.v, gt_data.fv)
        print(
            "Ea before: "
            f"{float(mesh_metrics.mean_angular_error(mesh, gt_mesh)):.3f} deg"
        )

    if args.ckpt:
        # The app's flagship flow (MeshViewer.cpp:769-1416): GCN patch
        # normals guide the filter, optionally a second pass with
        # rebuilt neighborhoods (--gcns, the box_gcns knob).
        from ..meshproc.gcn_denoiser import gcn_denoise_mesh
        from ..models.dgcnn import dgcnn_from_variables

        variables = _load_dgcnn_ckpt(args.ckpt)
        variables2 = _load_dgcnn_ckpt(args.ckpt2) if args.ckpt2 else None
        passes = args.gcns
        cfg2 = None
        if args.pass2:
            ni2, sr2, vi2 = args.pass2.split(":")
            cfg2 = GNFConfig(
                radius_scale=args.radius_scale,
                sigma_s_scale=args.sigma_s_scale,
                normal_iterations=int(ni2),
                sigma_r=float(sr2),
                vertex_iterations=int(vi2),
            )
        if args.auto:
            # Estimate the noise/feature regime from the input itself
            # and pick the per-regime knobs (meshproc.autorecipe) —
            # overrides --gcns/--pass2 and the kernel flags.
            from ..meshproc.autorecipe import pick_recipe

            recipe = pick_recipe(mesh)
            passes, cfg, cfg2 = recipe.passes, recipe.gnf_cfg, recipe.gnf_cfg2
            print(
                f"auto recipe: {recipe.label} "
                f"(noise {recipe.stats.noise_deg:.1f} deg, "
                f"crease density {recipe.stats.crease_density:.2f})"
            )
        out = gcn_denoise_mesh(
            mesh,
            dgcnn_from_variables(variables),
            variables,
            passes=passes,
            gnf_cfg=cfg,
            batch_size=args.batch_size,
            variables2=variables2,
            bucketed=args.bucketed,
            gnf_cfg2=cfg2,
        )
    else:
        # Guidance: GT normals when given (the prediction-slot oracle),
        # else the mesh's own normals.
        if gt_mesh is not None:
            guidance, _, _ = gt_mesh.face_data()
        else:
            guidance, _, _ = mesh.face_data()
        out = guided_normal_filter(mesh, guidance, cfg)
        for _ in range(args.gcns - 1):
            guidance, _, _ = (
                gt_mesh.face_data() if gt_mesh is not None else out.face_data()
            )
            out = guided_normal_filter(out, guidance, cfg)
    colors = None
    if gt_mesh is not None:
        ea = float(mesh_metrics.mean_angular_error(out, gt_mesh))
        print(f"Ea after: {ea:.3f} deg")
        if args.error_map:
            colors = mesh_metrics.error_map_colors(out, gt_mesh)
    save_obj(
        args.output, np.asarray(out.v), colors=colors,
        faces=np.asarray(out.f),
    )
    print(f"wrote {args.output}")
    if args.html:
        from .htmlviewer import export_html

        export_html(
            args.html, np.asarray(out.v), faces=np.asarray(out.f),
            colors=colors, title=Path(args.output).name,
        )
        print(f"wrote {args.html}")


def cmd_add_noise(args):
    """Corrupt a mesh or point cloud — the Qt app's noise buttons
    (slotGenNoise/slotLoadNoise, GCNDenoiser.cpp:25-33; Noise.cpp:22-187;
    Pointcloud/Modules/Noise.py:90-108) as a subcommand, completing the
    end-to-end corrupt -> denoise -> score loop without Python."""
    import jax
    import jax.numpy as jnp

    from ..core import noise as noise_mod
    from ..io.obj import read_obj, save_obj

    noise_type = {"gaussian": noise_mod.GAUSSIAN,
                  "impulse": noise_mod.IMPULSIVE}[args.type]
    direction = {"normal": noise_mod.ALONG_NORMAL,
                 "random": noise_mod.RANDOM_DIRECTION}[args.direction]

    def _save_cloud(path, points, normals=None):
        if str(path).endswith(".ply"):
            from ..io.ply import save_ply

            save_ply(path, np.asarray(points), normals)
        elif str(path).endswith((".xyz", ".clean_xyz")):
            from ..io.xyz import save_xyz

            save_xyz(path, np.asarray(points), normals)
        else:
            save_obj(path, np.asarray(points), normals)

    faces = None
    if args.input.endswith(".obj"):
        data = read_obj(args.input)
        if data.fv is not None and data.fv.shape[0] > 0:
            faces = np.asarray(data.fv)
    if args.load_noise:
        # slotLoadNoise: re-apply persisted noisy positions.
        noisy = noise_mod.load_noise(args.load_noise)
        if faces is not None:
            save_obj(args.output, np.asarray(noisy), faces=faces)
        else:
            _save_cloud(args.output, noisy)
        print(f"wrote {args.output} (positions from {args.load_noise})")
        return

    key = jax.random.PRNGKey(args.seed)
    if faces is not None:
        from ..meshproc.trimesh import TriMesh, add_mesh_noise

        mesh = TriMesh.from_numpy(data.v, faces)
        noisy_mesh = add_mesh_noise(
            mesh, key, args.level, noise_type=noise_type,
            direction=direction,
        )
        noisy = noisy_mesh.v
        save_obj(args.output, np.asarray(noisy), faces=faces)
    else:
        from ..ops import metrics
        from ..ops.knn import knn

        cloud = _load_cloud(args.input)
        pts = cloud.points
        nrm = (
            cloud.normals if cloud.has_normals()
            else _estimated_normals(pts)
        )
        nbh, _ = knn(pts, 12, exclude_self=True)
        mel = metrics.average_edge_length(pts, nbh)
        noisy = noise_mod.generate_noise(
            key, pts, nrm, args.level, mel, noise_type=noise_type,
            direction=direction,
        )
        _save_cloud(args.output, noisy, np.asarray(nrm))
    print(f"wrote {args.output}")
    if args.save_noise:
        name = noise_mod.save_noise(
            args.save_noise, noisy, args.level, noise_type=noise_type,
            direction=direction,
        )
        print(f"saved noise realization {args.save_noise}/{name}")


def main(argv=None):
    # Persistent XLA compilation cache BEFORE the first backend use:
    # CLI runs are compile-bound on new mesh shapes. Done here, not at
    # import time, so merely importing this module mutates nothing.
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser(prog="ngpd_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("denoise", help="classical point-cloud denoise")
    d.add_argument("input")
    d.add_argument("-o", "--output", required=True)
    d.add_argument("--iterations", type=int, default=None)
    d.add_argument("--feature-k", type=int, default=16)
    d.add_argument("--step-k", type=int, default=8)
    d.add_argument("--strategy", default="flat,edge,feature")
    d.add_argument("--until-min", action="store_true")
    d.add_argument("--gt", default=None)
    d.add_argument("--fused", action="store_true")
    d.add_argument("--window", type=int, default=512)
    d.add_argument("--lagged-nvt1", action="store_true",
                   help="big-cloud TPU path: reuse K2's filtered-NVT "
                        "rows as the next iteration's NVT1 (~25%% "
                        "faster; weight masks one half-step stale)")
    d.set_defaults(fn=cmd_denoise)

    e = sub.add_parser("eval", help="CD/sCD/Hausdorff/Paper metrics")
    e.add_argument("gt")
    e.add_argument("input")
    e.set_defaults(fn=cmd_eval)

    m = sub.add_parser("make-dataset", help="generate patch shards")
    m.add_argument("inputs", nargs="+")
    m.add_argument("-o", "--output", required=True)
    m.add_argument("--sample-points", type=int, default=None)
    m.add_argument("--no-balance", action="store_true")
    m.set_defaults(fn=cmd_make_dataset)

    t = sub.add_parser("train", help="train Patch2Normal")
    t.add_argument("dataset")
    t.add_argument("-o", "--output", required=True)
    t.add_argument("--epochs", type=int, default=100)
    t.add_argument("--batch-size", type=int, default=64)
    t.set_defaults(fn=cmd_train)

    pr = sub.add_parser("predict-normals", help="learned normal regression")
    pr.add_argument("input")
    pr.add_argument("-o", "--output", required=True)
    pr.add_argument("--ckpt", default=None)
    pr.set_defaults(fn=cmd_predict_normals)

    an = sub.add_parser(
        "add-noise", help="corrupt a mesh/cloud (the app's noise buttons)"
    )
    an.add_argument("input")
    an.add_argument("-o", "--output", required=True)
    an.add_argument("--level", type=float, default=0.3,
                    help="stdev = level x mean edge length")
    an.add_argument("--type", choices=["gaussian", "impulse"],
                    default="gaussian")
    an.add_argument("--direction", choices=["normal", "random"],
                    default="normal")
    an.add_argument("--seed", type=int, default=0)
    an.add_argument("--save-noise", default=None, metavar="DIR",
                    help="persist the noisy positions (Noise.saveNoise)")
    an.add_argument("--load-noise", default=None, metavar="FILE",
                    help="re-apply a persisted realization "
                    "(Noise.loadNoise) instead of generating")
    an.set_defaults(fn=cmd_add_noise)

    dm = sub.add_parser("denoise-mesh", help="GCN + guided normal filtering")
    dm.add_argument("input")
    dm.add_argument("-o", "--output", required=True)
    dm.add_argument("--gt", default=None)
    dm.add_argument(
        "--ckpt",
        default=None,
        help="DGCNN weights (.npz archive, or reference .t7/.pt)",
    )
    dm.add_argument(
        "--ckpt2",
        default=None,
        help="second-stage weights for passes >= 2 (the cascade's "
        "script_model_2, MeshViewer.cpp:787-798); defaults to --ckpt",
    )
    dm.add_argument(
        "--gcns", type=int, default=1,
        help="number of GCN+GNF passes (the app's box_gcns knob)",
    )
    dm.add_argument(
        "--pass2", default=None, metavar="NI:SR:VI",
        help="filter knobs for passes >= 2 (e.g. 8:0.12:4) — a gentler "
        "second pass preserves what pass 1 converged; defaults to the "
        "pass-1 knobs like the reference app",
    )
    dm.add_argument(
        "--auto", action="store_true",
        help="estimate the noise/crease regime from the input and pick "
        "passes + filter knobs automatically (meshproc.autorecipe); "
        "overrides --gcns/--pass2 and the kernel knobs",
    )
    dm.add_argument(
        "--bucketed", action="store_true",
        help="pad the mesh to power-of-two shape buckets so same-bucket "
        "meshes share one compiled program",
    )
    dm.add_argument("--batch-size", type=int, default=720)
    # Defaults are the tuned operating point for THIS repo's guidance
    # network (docs/GOLDEN.md round-4 pick, held-out validated); the
    # reference app's own constants are 12 / 0.3 / 16.
    dm.add_argument("--normal-iterations", type=int, default=20)
    dm.add_argument("--sigma-r", type=float, default=0.12,
                    help="guidance-range bandwidth (the app's sigma_r "
                    "slider, MeshNormalFiltering.cpp:37)")
    dm.add_argument("--vertex-iterations", type=int, default=8)
    dm.add_argument("--radius-scale", type=float, default=2.0,
                    help="face-neighborhood radius multiple "
                    "(MeshNormalFiltering.cpp:31; widen for heavy noise)")
    dm.add_argument("--sigma-s-scale", type=float, default=1.0,
                    help="spatial bandwidth multiple of the mean "
                    "centroid spacing (MeshNormalFiltering.cpp:33)")
    dm.add_argument("--guidance-smooth", type=int, default=0,
                    help="bilateral smoothing rounds applied to the "
                    "GCN guidance field before filtering (organic "
                    "meshes; no reference counterpart)")
    dm.add_argument("--guidance-smooth-sigma", type=float, default=0.5,
                    help="range bandwidth of --guidance-smooth in "
                    "unit-normal distance")
    dm.add_argument("--error-map", action="store_true")
    dm.add_argument(
        "--html", default=None, metavar="FILE",
        help="also write a standalone orbit-viewer .html (error-map "
        "colored when --error-map is on)",
    )
    dm.set_defaults(fn=cmd_denoise_mesh)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
