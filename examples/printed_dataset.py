"""Real-scan denoising on the PrintedDataset — BASELINE config 5's
real-scan workload, reproducing PostProcessing.ipynb cells 8-11.

The reference's protocol (PostProcessing.ipynb cell 8-10):
  1. load each real scan (PrintedDataset/noisy/*.obj) with a gt twin;
  2. ``preprocessPointcloud(k=12, noise_level=0.3)`` — estimate
     normals on the kNN(12) graph, ADD Gaussian noise of
     0.3 x mean-edge-length ALONG the normals, re-estimate + orient
     (Processor.py:187-199);
  3. ground truth = the gt mesh sampled at 4 x N points;
  4. "Ours" = 2 iterations of classify-and-update with strategy
     (flat, feature, feature), alphas (1, 0.2, 1), step clamp disabled
     (threshold d*20000) and a global accept mask: a point only moves
     if its TOTAL displacement from the pre-denoise position stays
     under d = 2 x mean kNN(6) edge length (cell 9, j == 3);
  5. score SingleChamferDistance and ChamferDistance against the
     sampled gt (cell 10).

The reference notebook's saved outputs (cell 10, its own RNG draw)
for the scans with gt twins in the snapshot:
  Stitch_guitar: noisy sCD 7.5834E-06 / CD 2.0093E-05,
                 ours  sCD 5.4605E-06 / CD 1.9884E-05
  Tp:            noisy sCD 1.1668E-05 / CD 3.9939E-05,
                 ours  sCD 9.4993E-06 / CD 4.3659E-05
(noise draws differ, so compare improvement ratios, not digits).

Usage:
  NGPD_CPU=1 python examples/printed_dataset.py [--models Nut ...]
      [--json /tmp/printed.json]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import json
import os
import time

if os.environ.get("NGPD_CPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp

REF = Path("/root/reference/PrintedDataset")


def paired_models():
    """All scans with a gt twin (PostProcessing.ipynb cells 8-11 score
    exactly the noisy/gt intersection)."""
    return sorted(
        p.stem
        for p in (REF / "noisy").glob("*.obj")
        if (REF / "gt" / p.name).exists()
    )


def run_scan(name: str, seed: int = 0, iterations: int = 2):
    from ngpd_tpu.config import DenoiseConfig
    from ngpd_tpu.core.noise import ALONG_NORMAL, GAUSSIAN, generate_noise
    from ngpd_tpu.core.normals import orient_normals, pvt_normals
    from ngpd_tpu.core.pipeline import denoise_iteration, step_threshold
    from ngpd_tpu.io.obj import load_obj, read_obj
    from ngpd_tpu.io.sampling import sample_mesh
    from ngpd_tpu.ops import metrics
    from ngpd_tpu.ops.knn import knn

    scan = load_obj(REF / "noisy" / f"{name}.obj").points
    gt_mesh = read_obj(REF / "gt" / f"{name}.obj")
    n = scan.shape[0]

    # preprocessPointcloud(k=12, noise_level=0.3): unoriented normals,
    # noise along them, then oriented re-estimate (Processor.py:187-199).
    nbh12, _ = knn(scan, 12, exclude_self=True)
    nrm0 = pvt_normals(scan, nbh12)
    l12 = metrics.average_edge_length(scan, nbh12)
    noisy = generate_noise(
        jax.random.PRNGKey(seed), scan, nrm0, 0.3, l12,
        noise_type=GAUSSIAN, direction=ALONG_NORMAL,
    )
    nbh12n, _ = knn(noisy, 12, exclude_self=True)
    nrm = orient_normals(noisy, pvt_normals(noisy, nbh12n), nbh12n)

    # 4x-sampled ground truth (cell 8: sampleObj(gt, N*4)).
    gt = jnp.asarray(sample_mesh(gt_mesh.v, gt_mesh.fv, 4 * n).points)

    cfg = DenoiseConfig()
    d = step_threshold(noisy)  # 2 x mean kNN(6) edges, self-edge quirk
    original = noisy
    pos = noisy
    t0 = time.time()
    for _ in range(iterations):
        nbh_feat, _ = knn(pos, cfg.feature_k)
        nbh_step, _ = knn(pos, cfg.step_k)
        new_pos, f_n, _cls = denoise_iteration(
            pos, nrm, nbh_feat, nbh_step,
            d * 20000.0,  # step clamp disabled (cell 9: d*20000)
            alphas=(1.0, 0.2, 1.0),
            angle=cfg.angle,
            class_scale=cfg.class_scale,
            strategy=("flat", "feature", "feature"),
        )
        accept = (
            jnp.linalg.norm(new_pos - original, axis=1) < d
        )  # cell 9: mask vs the PRE-denoise positions
        pos = jnp.where(accept[:, None], new_pos, pos)
        nrm = f_n
    dt = time.time() - t0

    scd = lambda a: float(  # noqa: E731
        jnp.mean(metrics.single_chamfer_distance(a, gt))
    )
    cd = lambda a: float(  # noqa: E731
        jnp.mean(metrics.chamfer_distance(a, gt))
    )
    return {
        "model": name, "n_points": int(n),
        "sCD_noisy": scd(noisy), "sCD_denoised": scd(pos),
        "CD_noisy": cd(noisy), "CD_denoised": cd(pos),
        "seconds": round(dt, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", nargs="*", default=None,
                    help="default: every noisy scan with a gt twin")
    ap.add_argument("--iterations", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--json", default=None,
                    help="also write rows to this JSON file")
    args = ap.parse_args()
    models = args.models if args.models else paired_models()

    rows = []
    for name in models:
        if not (REF / "noisy" / f"{name}.obj").exists():
            print(f"[{name}] missing assets, skipping")
            continue
        row = run_scan(name, seed=args.seed, iterations=args.iterations)
        rows.append(row)
        imp = row["sCD_noisy"] / max(row["sCD_denoised"], 1e-30)
        print(
            f"[{row['model']}] {row['n_points']} pts: "
            f"sCD {row['sCD_noisy']:.4E} -> {row['sCD_denoised']:.4E} "
            f"(x{imp:.2f}), CD {row['CD_noisy']:.4E} -> "
            f"{row['CD_denoised']:.4E} ({row['seconds']}s)",
            flush=True,
        )
    if args.json:
        Path(args.json).write_text(json.dumps(rows, indent=2))
        print("wrote", args.json)


if __name__ == "__main__":
    main()
