"""Real-scan denoising on the PrintedDataset — the Printed_Dataset
notebook workflow (BASELINE.json config 5's real-scan half).

The reference ships real 3D-printed-object scans as noisy/gt OBJ pairs
(PrintedDataset/{noisy,gt}); PostProcessing.ipynb scores them by CD
against 4x-sampled ground truth. This script denoises each scan with
the hybrid engine and prints before/after CD.

Usage: python examples/printed_dataset.py [--models Nut ...] [--iterations 4]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse

import jax
import jax.numpy as jnp

REF = Path("/root/reference/PrintedDataset")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", nargs="*", default=["Nut", "Snoopy"])
    ap.add_argument("--iterations", type=int, default=8)
    ap.add_argument("--alphas", type=float, nargs=3, default=(0.1, 0.1, 0.1),
                    help="conservative speeds: scan noise is small and the "
                    "sCD floor is set by GT sampling density")
    ap.add_argument("--gt-samples", type=int, default=2**16)
    args = ap.parse_args()

    from ngpd_tpu.config import DenoiseConfig
    from ngpd_tpu.core.normals import orient_normals, pvt_normals
    from ngpd_tpu.io.obj import load_obj, read_obj
    from ngpd_tpu.io.sampling import sample_mesh
    from ngpd_tpu.ops import metrics
    from ngpd_tpu.ops.knn import knn

    on_tpu = jax.devices()[0].platform not in ("cpu",)

    for name in args.models:
        noisy_p = REF / "noisy" / f"{name}.obj"
        gt_p = REF / "gt" / f"{name}.obj"
        if not noisy_p.exists() or not gt_p.exists():
            print(f"[{name}] missing assets, skipping")
            continue
        noisy = load_obj(noisy_p).points
        gt_mesh = read_obj(gt_p)
        # Score against a dense surface sampling of the GT mesh, like
        # PostProcessing.ipynb's 4x sampled ground truth.
        gt = jnp.asarray(
            sample_mesh(gt_mesh.v, gt_mesh.fv, args.gt_samples).points
        )
        nbh, _ = knn(noisy, 12, exclude_self=True)
        nrm = orient_normals(noisy, pvt_normals(noisy, nbh), nbh)
        cfg = DenoiseConfig(alphas=tuple(args.alphas))
        # The reference scores these scans through
        # denoiseUntilMinimumError (Processor.py:141): iterate while the
        # GT error improves, return the best iterate — real scans carry
        # little noise, so a fixed iteration count over-smooths.
        from ngpd_tpu.core.pipeline import denoise_until_minimum_error

        out, _, _, iters = denoise_until_minimum_error(
            noisy, nrm, gt, cfg=cfg,
            alphas=tuple(args.alphas),
            max_iterations=args.iterations,
            error_fn=metrics.single_chamfer_distance,
        )
        cd0 = float(jnp.mean(metrics.single_chamfer_distance(noisy, gt)))
        cd1 = float(jnp.mean(metrics.single_chamfer_distance(out, gt)))
        print(f"[{name}] {len(noisy)} pts: sCD {cd0:.4E} -> {cd1:.4E} "
              f"({int(iters)} iters, "
              f"{'improved' if cd1 < cd0 else 'kept input'})")


if __name__ == "__main__":
    main()
