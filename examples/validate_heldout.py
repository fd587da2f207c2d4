"""Held-out validation of the tuned GNF operating point.

docs/GOLDEN.md's tuned setting (16 normal iterations, sigma_r 0.12)
was chosen by sweeping on the four golden meshes themselves — the same
meshes the reference's own constants (MeshNormalFiltering.cpp:29-40)
were published against, but still an in-sample pick. This script scores
tuned-vs-reference-default knobs on meshes the sweep never saw:

* fresh SYNTHETIC shapes whose generator parameters are NOT in the
  training ``cad_suite`` (unseen geometry for the network too), and
* scan meshes with FRESH noise draws at the golden noise regimes
  (gaussian 0.3 / 0.6, impulse 0.6 x mean edge length). The network
  trained on these shapes' clean geometry, which inflates guidance
  quality equally for every knob setting — the knob comparison stays
  apples-to-apples because the guidance normals are computed once and
  shared across settings.

Usage:
  python examples/validate_heldout.py [--ckpt assets/dgcnn_mesh.npz]
      [--settings 12:0.3:16,16:0.12:16]   # ni:sr:vi triples
      [--out /tmp/heldout.jsonl]

Cascade mode (``--cascade assets/dgcnn_mesh_2.npz --pass2 4:0.12:2``)
scores the full deployment flow instead — single pass vs the
two-stage cascade with the gentle second-pass knobs — on the same
held-out cases, validating the docs/GOLDEN.md cascade recipe off the
goldens it was picked on.

The ORGANIC half of the held-out protocol lives in
``examples/organic_ab.py``: the cases above are CAD/scan shapes whose
crease density routes them to the default or heavy-cad recipes, so
they cannot validate the organic branches. organic_ab.py A/Bs
default-vs-organic recipes on crease-free shapes with fresh noise
(spot/homer, plus stanford-bunny which is absent from the training
corpus entirely) and scores the crease-density routing alongside —
run both drivers for the full off-golden validation record
(docs/GOLDEN.md "held-out" tables).
"""

from __future__ import annotations

import argparse
import json
import os
from pathlib import Path

import numpy as np

if os.environ.get("NGPD_CPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp

from ngpd_tpu.config import GNFConfig
from ngpd_tpu.learn.weights import load_dgcnn_npz
from ngpd_tpu.meshproc.collector import load_mesh
from ngpd_tpu.meshproc.filtering import guided_normal_filter
from ngpd_tpu.meshproc.gcn_denoiser import predict_face_normals
from ngpd_tpu.meshproc.metrics import mean_angular_error
from ngpd_tpu.meshproc.synthetic import cylinder, stairs, wedge
from ngpd_tpu.meshproc.trimesh import add_mesh_noise
from ngpd_tpu.models.dgcnn import dgcnn_from_variables
from ngpd_tpu.ops import metrics as pm

REF = Path("/root/reference/common-3d-test-models-master")

# (label, clean mesh, noise_type, level): the golden regimes.
# Synthetic params deliberately differ from every cad_suite entry.
def heldout_cases():
    return [
        ("syn_wedge50_g3", wedge(angle_deg=50.0, length=1.0), 0, 0.3),
        ("syn_stairs6_g6", stairs(steps=6, n=4), 0, 0.6),
        ("syn_cyl_tall_i6",
         cylinder(radius=0.3, height=1.4, segments=20, rings=8), 1, 0.6),
        ("teapot_g3", load_mesh(REF / "teapot.obj"), 0, 0.3),
        ("teapot_g6", load_mesh(REF / "teapot.obj"), 0, 0.6),
        ("cow_g3", load_mesh(REF / "cow.obj"), 0, 0.3),
        ("cow_i6", load_mesh(REF / "cow.obj"), 1, 0.6),
    ]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="assets/dgcnn_mesh.npz")
    ap.add_argument("--settings", default="12:0.3:16,16:0.12:16",
                    help="comma list of ni:sr:vi knob triples")
    ap.add_argument("--out", default=None)
    ap.add_argument("--seed", type=int, default=20260818)
    ap.add_argument("--cascade", default=None,
                    help="stage-2 weights: score 1-pass vs 2-pass "
                    "deployment flow instead of filter-knob settings")
    ap.add_argument("--pass2", default="4:0.12:2",
                    help="ni:sr:vi for the cascade's second pass")
    args = ap.parse_args()

    variables = load_dgcnn_npz(args.ckpt)
    model = dgcnn_from_variables(variables)
    if args.cascade:
        return run_cascade(args, model, variables)
    settings = []
    for trip in args.settings.split(","):
        ni, sr, vi = trip.split(":")
        settings.append((int(ni), float(sr), int(vi)))

    rows = []
    for i, (label, clean, ntype, level) in enumerate(heldout_cases()):
        key = jax.random.PRNGKey(args.seed + i)
        noisy = add_mesh_noise(clean, key, level, noise_type=ntype)
        guidance = predict_face_normals(noisy, model, variables)
        ea_noisy = float(mean_angular_error(noisy, clean))
        for ni, sr, vi in settings:
            cfg = GNFConfig(normal_iterations=ni, sigma_r=sr,
                            vertex_iterations=vi)
            out = guided_normal_filter(noisy, guidance, cfg)
            row = {
                "mesh": label, "ni": ni, "sr": sr, "vi": vi,
                "Ea_noisy": round(ea_noisy, 3),
                "Ea": round(float(mean_angular_error(out, clean)), 3),
                "CD": float(jnp.mean(pm.chamfer_distance(
                    np.asarray(clean.v), np.asarray(out.v)))),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
    if args.out:
        Path(args.out).write_text(
            "\n".join(json.dumps(r) for r in rows) + "\n")

    # Per-setting aggregate: mean Ea and geometric-mean CD across cases.
    for ni, sr, vi in settings:
        sub = [r for r in rows if (r["ni"], r["sr"], r["vi"]) == (ni, sr, vi)]
        mean_ea = sum(r["Ea"] for r in sub) / len(sub)
        gmean_cd = float(np.exp(np.mean([np.log(r["CD"]) for r in sub])))
        print(f"# setting ni={ni} sr={sr} vi={vi}: "
              f"mean Ea {mean_ea:.3f}, gmean CD {gmean_cd:.3e}")


def run_cascade(args, model, variables):
    """Single-pass vs two-stage cascade on the held-out cases, full
    deployment flow (guidance recomputed per pass, docs/GOLDEN.md
    cascade recipe)."""
    from ngpd_tpu.meshproc.gcn_denoiser import gcn_denoise_mesh

    variables2 = load_dgcnn_npz(args.cascade)
    ni2, sr2, vi2 = args.pass2.split(":")
    cfg2 = GNFConfig(normal_iterations=int(ni2), sigma_r=float(sr2),
                     vertex_iterations=int(vi2))
    rows = []
    for i, (label, clean, ntype, level) in enumerate(heldout_cases()):
        key = jax.random.PRNGKey(args.seed + i)
        noisy = add_mesh_noise(clean, key, level, noise_type=ntype)
        for passes in (1, 2):
            out = gcn_denoise_mesh(
                noisy, model, variables, passes=passes,
                gnf_cfg=GNFConfig(), variables2=variables2,
                gnf_cfg2=cfg2, bucketed=True,
            )
            row = {
                "mesh": label, "passes": passes,
                "Ea_noisy": round(float(mean_angular_error(noisy, clean)), 3),
                "Ea": round(float(mean_angular_error(out, clean)), 3),
                "CD": float(jnp.mean(pm.chamfer_distance(
                    np.asarray(clean.v), np.asarray(out.v)))),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
    if args.out:
        Path(args.out).write_text(
            "\n".join(json.dumps(r) for r in rows) + "\n")
    for passes in (1, 2):
        sub = [r for r in rows if r["passes"] == passes]
        mean_ea = sum(r["Ea"] for r in sub) / len(sub)
        gmean_cd = float(np.exp(np.mean([np.log(r["CD"]) for r in sub])))
        wins = sum(
            1 for a, b in zip(
                [r for r in rows if r["passes"] == 2],
                [r for r in rows if r["passes"] == 1],
            ) if a["Ea"] < b["Ea"]
        )
        print(f"# passes={passes}: mean Ea {mean_ea:.3f}, "
              f"gmean CD {gmean_cd:.3e}"
              + (f" (cascade wins {wins}/{len(sub)} cases)"
                 if passes == 2 else ""))


if __name__ == "__main__":
    main()
