"""A/B the organic recipe vs the default on held-out organic meshes.

The organic recipe (meshproc.autorecipe.ORGANIC_RECIPE: one bilateral
guidance-smoothing round + an early-stopped filter) was picked on
fertility and nicolo — golden meshes. This driver measures default vs
organic on organic-regime cases the sweep never saw:

* stanford-bunny — NOT in the training corpus at all (excluded unless
  NGPD_BIG_MESHES=1, examples/train_mesh_gcn.py:47-55): fresh geometry
  AND fresh noise;
* spot / homer — training shapes with FRESH noise draws (guidance
  quality inflated equally for both recipes, so the knob comparison
  stays apples-to-apples — same protocol as validate_heldout.py);
* homer_i6 exercises the ORGANIC_HEAVY branch (impulsive n6 pushes
  noise_deg past the 38-deg gate on organics).

Routing accuracy is scored alongside: for each case the probe stats
are printed so the crease-density gate (<= 1.25) can be checked
against what actually wins.

  python examples/organic_ab.py [--skip-bunny]
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
    ORGANIC_HEAVY_RECIPE,
    ORGANIC_RECIPE,
    HEAVY_NOISE_DEG,
    mesh_statistics,
    pick_recipe,
)
from ngpd_tpu.meshproc.collector import load_mesh
from ngpd_tpu.meshproc.gcn_denoiser import gcn_denoise_mesh
from ngpd_tpu.meshproc.metrics import mean_angular_error
from ngpd_tpu.meshproc.trimesh import add_mesh_noise
from ngpd_tpu.models.dgcnn import dgcnn_from_variables
from ngpd_tpu.ops import metrics as pm

REF = Path("/root/reference/common-3d-test-models-master")


def cases(skip_bunny: bool):
    out = [
        ("spot_g3", load_mesh(REF / "spot.obj"), 0, 0.3),
        ("homer_g3", load_mesh(REF / "homer.obj"), 0, 0.3),
        ("homer_i6", load_mesh(REF / "homer.obj"), 1, 0.6),
    ]
    if not skip_bunny:
        out.append(
            ("bunny_g3", load_mesh(REF / "stanford-bunny.obj"), 0, 0.3)
        )
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="assets/dgcnn_mesh.npz")
    ap.add_argument("--ckpt2", default="assets/dgcnn_mesh_2.npz")
    ap.add_argument("--seed", type=int, default=20260820)
    ap.add_argument("--out", default=None)
    ap.add_argument("--skip-bunny", action="store_true")
    args = ap.parse_args()

    variables = load_dgcnn_npz(args.ckpt)
    variables2 = load_dgcnn_npz(args.ckpt2)
    model = dgcnn_from_variables(variables)

    rows = []
    for i, (label, clean, ntype, level) in enumerate(cases(args.skip_bunny)):
        key = jax.random.PRNGKey(args.seed + i)
        noisy = add_mesh_noise(clean, key, level, noise_type=ntype)
        s = mesh_statistics(noisy)
        organic = (
            ORGANIC_HEAVY_RECIPE
            if s.noise_deg >= HEAVY_NOISE_DEG
            else ORGANIC_RECIPE
        )
        routed = pick_recipe(noisy, s).label
        for recipe in (DEFAULT_RECIPE, organic):
            out = gcn_denoise_mesh(
                noisy, model, variables, passes=recipe["passes"],
                gnf_cfg=recipe["gnf_cfg"], variables2=variables2,
                gnf_cfg2=recipe["gnf_cfg2"], bucketed=True,
            )
            row = {
                "mesh": label,
                "recipe": recipe["label"],
                "routed": routed,
                "noise_deg": round(s.noise_deg, 2),
                "crease_density": round(s.crease_density, 2),
                "Ea": round(float(mean_angular_error(out, clean)), 3),
                "CD": float(np.mean(pm.chamfer_distance(
                    np.asarray(clean.v), np.asarray(out.v)))),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
    if args.out:
        Path(args.out).write_text(
            "\n".join(json.dumps(r) for r in rows) + "\n")
    # Per-case winner vs routing decision.
    for label in dict.fromkeys(r["mesh"] for r in rows):
        sub = [r for r in rows if r["mesh"] == label]
        best = min(sub, key=lambda r: r["Ea"])
        routed = sub[0]["routed"]
        if routed not in {r["recipe"] for r in sub}:
            ok = "UNTESTED"  # router picked a recipe outside the A/B pair
        elif best["recipe"] == routed:
            ok = "OK"
        else:
            ok = "MISROUTE"
        parts = " | ".join(
            f"{r['recipe']} Ea {r['Ea']} CD {r['CD']:.3e}" for r in sub
        )
        print(f"# {label} (routed {routed}): {parts} -> best "
              f"{best['recipe']} [{ok}]")


if __name__ == "__main__":
    main()
