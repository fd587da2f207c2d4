"""Method comparison by CD/sCD — the PostProcessing.ipynb workflow.

The reference notebook compares Noisy / CPSD / CTD-QEM / Ours per model
by Chamfer and single-sided Chamfer distance (cells 2, 7-11). This
script runs the classical pipeline on the reference's shipped noisy
assets and prints the same table; pre-denoised golden files are scored
when present.

Usage: python examples/post_processing.py [--models fandisk ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
from pathlib import Path

import jax.numpy as jnp

REF = Path("/root/reference/models")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", nargs="*", default=["fandisk"])
    ap.add_argument("--iterations", type=int, default=4)
    args = ap.parse_args()

    from ngpd_tpu.core.normals import orient_normals, pvt_normals
    from ngpd_tpu.core.pipeline import denoise
    from ngpd_tpu.io.obj import load_obj
    from ngpd_tpu.ops import metrics
    from ngpd_tpu.ops.knn import knn

    for name in args.models:
        gt_path = REF / f"{name}.obj"
        noisy_path = next(REF.glob(f"{name}*noisy*.obj"), None)
        if not gt_path.exists() or noisy_path is None:
            print(f"[{name}] assets not found under {REF}, skipping")
            continue
        gt = load_obj(gt_path).points
        noisy = load_obj(noisy_path).points

        def score(tag, pos):
            cd = float(jnp.mean(metrics.chamfer_distance(pos, gt)))
            scd = float(jnp.mean(metrics.single_chamfer_distance(pos, gt)))
            print(f"[{name}] {tag:<12} CD {cd:.4E}  sCD {scd:.4E}")

        score("Noisy", noisy)
        nbh, _ = knn(noisy, 12, exclude_self=True)
        nrm = orient_normals(noisy, pvt_normals(noisy, nbh), nbh)
        out, _, _ = denoise(noisy, nrm, iterations=args.iterations)
        score("Ours", out)
        golden = next(REF.glob(f"{name}*denoised*.obj"), None)
        if golden is not None:
            score("RefDenoised", load_obj(golden).points)


if __name__ == "__main__":
    main()
