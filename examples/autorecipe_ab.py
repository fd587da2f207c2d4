"""A/B the two deployment recipes on every held-out case.

The auto-recipe classifier (meshproc.autorecipe) must route each input
to the recipe that actually wins there. The golden table (docs/
GOLDEN.md) establishes the winners on the four goldens; this driver
measures both recipes on the seven held-out cases so the thresholds are
fixed by measurement, not by guessing which shapes "look CAD":

  python examples/autorecipe_ab.py --ckpt assets/dgcnn_mesh.npz \
      --ckpt2 assets/dgcnn_mesh_2.npz
"""

from __future__ import annotations

import argparse
import json
import os
from pathlib import Path

if os.environ.get("NGPD_CPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import numpy as np

from ngpd_tpu.learn.weights import load_dgcnn_npz
from ngpd_tpu.meshproc.autorecipe import (
    DEFAULT_RECIPE,
    HEAVY_CAD_RECIPE,
    mesh_statistics,
)
from ngpd_tpu.meshproc.gcn_denoiser import gcn_denoise_mesh
from ngpd_tpu.meshproc.metrics import mean_angular_error
from ngpd_tpu.meshproc.trimesh import add_mesh_noise
from ngpd_tpu.models.dgcnn import dgcnn_from_variables
from ngpd_tpu.ops import metrics as pm


def main():
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from examples.validate_heldout import heldout_cases

    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="assets/dgcnn_mesh.npz")
    ap.add_argument("--ckpt2", default="assets/dgcnn_mesh_2.npz")
    ap.add_argument("--seed", type=int, default=20260818)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    variables = load_dgcnn_npz(args.ckpt)
    variables2 = load_dgcnn_npz(args.ckpt2)
    model = dgcnn_from_variables(variables)

    rows = []
    for i, (label, clean, ntype, level) in enumerate(heldout_cases()):
        key = jax.random.PRNGKey(args.seed + i)
        noisy = add_mesh_noise(clean, key, level, noise_type=ntype)
        s = mesh_statistics(noisy)
        for recipe in (DEFAULT_RECIPE, HEAVY_CAD_RECIPE):
            out = gcn_denoise_mesh(
                noisy, model, variables, passes=recipe["passes"],
                gnf_cfg=recipe["gnf_cfg"], variables2=variables2,
                gnf_cfg2=recipe["gnf_cfg2"], bucketed=True,
            )
            row = {
                "mesh": label,
                "recipe": recipe["label"],
                "noise_deg": round(s.noise_deg, 2),
                "crease_frac": round(s.crease_frac, 4),
                "Ea": round(float(mean_angular_error(out, clean)), 3),
                "CD": float(np.mean(pm.chamfer_distance(
                    np.asarray(clean.v), np.asarray(out.v)))),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
    if args.out:
        Path(args.out).write_text(
            "\n".join(json.dumps(r) for r in rows) + "\n")
    # Per-case winner summary.
    for label in dict.fromkeys(r["mesh"] for r in rows):
        sub = {r["recipe"]: r for r in rows if r["mesh"] == label}
        d, h = sub["default"], sub["heavy-cad"]
        win = "heavy-cad" if h["Ea"] < d["Ea"] else "default"
        print(f"# {label}: default Ea {d['Ea']} CD {d['CD']:.3e} | "
              f"heavy-cad Ea {h['Ea']} CD {h['CD']:.3e} -> {win}")


if __name__ == "__main__":
    main()
