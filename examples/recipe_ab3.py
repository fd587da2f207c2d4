"""Three-arm recipe A/B: default vs heavy-cad vs organic, everywhere.

The round-5 organic A/B (`organic_ab.py`) found the organic recipe
(guidance-smoothing pre-pass + early-stopped filter) winning on every
held-out ORGANIC case — including ones whose crease density sits far
above the 1.25 organic routing gate (homer_i6 at 7.84). That means the
gate, fixed from two golden datapoints, under-routes the organic
branch. Before widening it, this driver measures where the organic
recipe LOSES: all three deployment recipes on the full held-out suite
(validate_heldout.py's cases, same seeds for comparability with the
recorded tables) plus the CAD goldens (trim-star, fandisk — shipped
noise, no generation), full two-stage cascade.

The organic arm is noise-gated like `pick_recipe`: ORGANIC_HEAVY when
noise_deg >= 38, ORGANIC otherwise.

  python examples/recipe_ab3.py [--only substr] [--out f.jsonl]
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
    HEAVY_NOISE_DEG,
    ORGANIC_HEAVY_RECIPE,
    ORGANIC_RECIPE,
    mesh_statistics,
    pick_recipe,
)
from ngpd_tpu.meshproc.collector import load_mesh
from ngpd_tpu.meshproc.gcn_denoiser import gcn_denoise_mesh
from ngpd_tpu.meshproc.metrics import mean_angular_error
from ngpd_tpu.meshproc.synthetic import cylinder, stairs, wedge
from ngpd_tpu.meshproc.trimesh import add_mesh_noise
from ngpd_tpu.models.dgcnn import dgcnn_from_variables
from ngpd_tpu.ops import metrics as pm

REF = Path("/root/reference/common-3d-test-models-master")
MODELS = Path("/root/reference/models")

# (label, clean, ntype, level) — validate_heldout.heldout_cases() with
# ITS seed convention (20260818 + index) so rows line up with the
# recorded held-out tables.
HELD_OUT = [
    ("syn_wedge50_g3", lambda: wedge(angle_deg=50.0, length=1.0), 0, 0.3),
    ("syn_stairs6_g6", lambda: stairs(steps=6, n=4), 0, 0.6),
    ("syn_cyl_tall_i6",
     lambda: cylinder(radius=0.3, height=1.4, segments=20, rings=8), 1, 0.6),
    ("teapot_g3", lambda: load_mesh(REF / "teapot.obj"), 0, 0.3),
    ("teapot_g6", lambda: load_mesh(REF / "teapot.obj"), 0, 0.6),
    ("cow_g3", lambda: load_mesh(REF / "cow.obj"), 0, 0.3),
    ("cow_i6", lambda: load_mesh(REF / "cow.obj"), 1, 0.6),
]

# CAD goldens with their SHIPPED noisy meshes (the organic arm has
# never been measured on true-CAD inputs).
GOLDEN_CAD = [
    ("trimstar_golden", "trim-star_gaus_n3.obj", "trim-star.obj"),
    ("fandisk_golden", "fandisk_gaus_n6_noisy.obj", "fandisk.obj"),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="assets/dgcnn_mesh.npz")
    ap.add_argument("--ckpt2", default="assets/dgcnn_mesh_2.npz")
    ap.add_argument("--seed", type=int, default=20260818)
    ap.add_argument("--only", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    variables = load_dgcnn_npz(args.ckpt)
    variables2 = load_dgcnn_npz(args.ckpt2)
    model = dgcnn_from_variables(variables)

    cases = []
    for i, (label, mk, ntype, level) in enumerate(HELD_OUT):
        if args.only and args.only not in label:
            continue
        clean = mk()
        key = jax.random.PRNGKey(args.seed + i)
        cases.append((label, clean, add_mesh_noise(clean, key, level,
                                                   noise_type=ntype)))
    for label, noisy_rel, clean_rel in GOLDEN_CAD:
        if args.only and args.only not in label:
            continue
        cases.append((label, load_mesh(MODELS / clean_rel),
                      load_mesh(MODELS / noisy_rel)))

    rows = []
    for label, clean, noisy in cases:
        s = mesh_statistics(noisy)
        organic = (
            ORGANIC_HEAVY_RECIPE
            if s.noise_deg >= HEAVY_NOISE_DEG
            else ORGANIC_RECIPE
        )
        routed = pick_recipe(noisy, s).label
        for recipe in (DEFAULT_RECIPE, HEAVY_CAD_RECIPE, organic):
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
    for label in dict.fromkeys(r["mesh"] for r in rows):
        sub = [r for r in rows if r["mesh"] == label]
        best = min(sub, key=lambda r: r["Ea"])
        routed = sub[0]["routed"]
        ok = "OK" if best["recipe"] == routed else "MISROUTE"
        parts = " | ".join(
            f"{r['recipe']} {r['Ea']}/{r['CD']:.2e}" for r in sub
        )
        print(f"# {label} nd={sub[0]['noise_deg']} "
              f"cd={sub[0]['crease_density']} (routed {routed}): {parts}"
              f" -> best {best['recipe']} [{ok}]")


if __name__ == "__main__":
    main()
