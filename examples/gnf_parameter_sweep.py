"""GNF parameter sweep on the golden meshes with cached GCN guidance.

The guided filter's range bandwidth sigma_r and iteration counts are
fixed constants in the reference app (MeshNormalFiltering.cpp:29-40:
12 normal iterations, sigma_r 0.3, 16 vertex iterations — tuned for
ITS network's guidance quality). A from-scratch network has different
guidance error statistics, so the right operating point differs: this
sweep computes the stage-1 guidance normals ONCE per mesh (the
expensive part), caches them, then scores every (normal_iterations,
sigma_r, vertex_iterations) combination by mean angular error and
chamfer distance against the clean mesh.

Recorded operating point (docs/GOLDEN.md is the source of truth): the
round-4 bi-objective GLOBAL pick is normal_iterations=20, sigma_r=0.12,
vertex_iterations=8 — single-pass Ea fandisk 5.68, trim-star 4.78
(beats the reference's 5.32 on Ea and CD), fertility 4.49, nicolo 5.44
under the shipped checkpoint, with no mesh above 1.5x the reference's
chamfer distance.

Every row is scored bi-objectively: Ea AND chamfer distance, both as
raw values and as ratios to the reference's own shipped output
(`models/*_denoised.obj`) so positional accuracy can't silently regress
while tuning for angular accuracy (round-3 lesson: the tight sigma_r
bought fertility's Ea win at 1.85x the reference's CD).

Usage:
  PYTHONPATH=. python examples/gnf_parameter_sweep.py \
      [--ckpt assets/dgcnn_mesh.npz] [--only fandisk] \
      [--ni 8,12,16,20] [--sr 0.25,0.3,0.35,0.45] [--vi 16,24] \
      [--out sweep.jsonl]

  # then pick the global setting: the (ni, sr, vi) minimizing the
  # worst-mesh Ea ratio subject to a CD-ratio cap (default 1.5):
  python examples/gnf_parameter_sweep.py --pick sweep.jsonl [--cd-cap 1.5]
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import time
from pathlib import Path

import numpy as np

if os.environ.get("NGPD_CPU"):
    # Same dance as tests/conftest.py: the ambient axon sitecustomize
    # pins jax_platforms, so the env var alone cannot force CPU.
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from ngpd_tpu.config import GNFConfig
from ngpd_tpu.learn.weights import load_dgcnn_npz
from ngpd_tpu.meshproc.collector import load_mesh
from ngpd_tpu.meshproc.filtering import guided_normal_filter
from ngpd_tpu.meshproc.gcn_denoiser import predict_face_normals
from ngpd_tpu.meshproc.metrics import mean_angular_error
from ngpd_tpu.models.dgcnn import dgcnn_from_variables
from ngpd_tpu.ops import metrics as pm

REF = Path("/root/reference")

GOLDENS = [
    # (noisy, clean, reference's own denoised output)
    ("models/fandisk_gaus_n6_noisy.obj", "models/fandisk.obj",
     "models/fandisk_gaus_n6_denoised.obj"),
    ("models/trim-star_gaus_n3.obj", "models/trim-star.obj",
     "models/trim-star_gaus_n3_denoised.obj"),
    ("models/fertility_gaus_n3.obj", "models/fertility.obj",
     "models/fertility_gaus_n3_denoised.obj"),
    ("models/nicolo_imp6_noisy.obj", "models/nicolo.obj",
     "models/nicolo_imp_n6_denoised.obj"),
]


def pick(path: str, cd_cap: float) -> None:
    """Aggregate a sweep JSONL and pick the global operating point.

    Selection rule (bi-objective, reference-anchored): among settings
    measured on ALL meshes whose worst-mesh CD ratio <= ``cd_cap``,
    minimize the worst-mesh Ea ratio; tie-break on mean Ea ratio then
    mean CD ratio. Ratios are vs the reference's shipped outputs, so
    "1.0" means parity with the reference app on that mesh.
    """
    rows = [json.loads(l) for l in Path(path).read_text().splitlines()
            if l.strip() and not l.startswith("#")]
    meshes = sorted({r["mesh"] for r in rows})
    by_setting: dict = {}
    for r in rows:
        key = (r["ni"], r["sr"], r["vi"],
               r.get("gsi", 0), r.get("gss", 0.35))
        by_setting.setdefault(key, {})[r["mesh"]] = r
    candidates = []
    for key, per_mesh in by_setting.items():
        if len(per_mesh) != len(meshes):
            continue  # not measured everywhere — can't be the global pick
        ea = [per_mesh[m]["Ea_ratio"] for m in meshes]
        cd = [per_mesh[m]["CD_ratio"] for m in meshes]
        candidates.append({
            "ni": key[0], "sr": key[1], "vi": key[2],
            "gsi": key[3], "gss": key[4],
            "worst_Ea_ratio": max(ea), "mean_Ea_ratio": sum(ea) / len(ea),
            "worst_CD_ratio": max(cd), "mean_CD_ratio": sum(cd) / len(cd),
            "per_mesh": {m: (per_mesh[m]["Ea"], per_mesh[m]["CD"])
                         for m in meshes},
        })
    feasible = [c for c in candidates if c["worst_CD_ratio"] <= cd_cap]
    pool = feasible or candidates
    pool.sort(key=lambda c: (c["worst_Ea_ratio"], c["mean_Ea_ratio"],
                             c["mean_CD_ratio"]))
    for c in pool[:8]:
        print(json.dumps(c))
    if not feasible:
        print(f"# WARNING: no setting met CD cap {cd_cap}; showing "
              "unconstrained ranking")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="assets/dgcnn_mesh.npz")
    ap.add_argument("--cache", default="/tmp/gnf_guidance")
    ap.add_argument("--only", default=None,
                    help="substring filter on the mesh name")
    ap.add_argument("--ni", default="8,12,16,20")
    ap.add_argument("--sr", default="0.25,0.3,0.35,0.45")
    ap.add_argument("--vi", default="16,24")
    ap.add_argument("--gs-iters", default="0",
                    help="guidance_smooth_iterations values to grid")
    ap.add_argument("--gs-sigma", default="0.5",
                    help="guidance_smooth_sigma values to grid")
    ap.add_argument("--radius-scale", type=float, default=2.0)
    ap.add_argument("--sigma-s-scale", type=float, default=1.0)
    ap.add_argument("--out", default=None,
                    help="also append result rows to this JSONL file")
    ap.add_argument("--pick", default=None, metavar="JSONL",
                    help="aggregate a sweep file and print the global pick")
    ap.add_argument("--cd-cap", type=float, default=1.5,
                    help="max worst-mesh CD ratio for --pick feasibility")
    args = ap.parse_args()

    if args.pick:
        pick(args.pick, args.cd_cap)
        return

    cache = Path(args.cache)
    cache.mkdir(parents=True, exist_ok=True)
    variables = load_dgcnn_npz(args.ckpt)
    model = dgcnn_from_variables(variables)
    nis = [int(x) for x in args.ni.split(",")]
    srs = [float(x) for x in args.sr.split(",")]
    vis = [int(x) for x in args.vi.split(",")]
    gsis = [int(x) for x in args.gs_iters.split(",")]
    gsss = [float(x) for x in args.gs_sigma.split(",")]

    for noisy_rel, clean_rel, ref_rel in GOLDENS:
        stem = Path(noisy_rel).stem
        if args.only and args.only not in stem:
            continue
        noisy = load_mesh(REF / noisy_rel)
        clean = load_mesh(REF / clean_rel)
        ref_out = load_mesh(REF / ref_rel)
        ea_ref = float(mean_angular_error(ref_out, clean))
        cd_ref = float(jnp.mean(pm.chamfer_distance(clean.v, ref_out.v)))
        cache_p = cache / f"{stem}.npz"
        if cache_p.exists():
            guidance = jnp.asarray(np.load(cache_p)["g"])
        else:
            t0 = time.time()
            guidance = predict_face_normals(noisy, model, variables)
            np.savez(cache_p, g=np.asarray(guidance))
            print(f"# {stem}: guidance in {time.time()-t0:.0f}s", flush=True)

        for ni, sr, vi, gsi, gss in itertools.product(
            nis, srs, vis, gsis, gsss
        ):
            cfg = GNFConfig(
                radius_scale=args.radius_scale,
                sigma_s_scale=args.sigma_s_scale,
                normal_iterations=ni, sigma_r=sr, vertex_iterations=vi,
                guidance_smooth_iterations=gsi,
                guidance_smooth_sigma=gss,
            )
            out = guided_normal_filter(noisy, guidance, cfg)
            ea = float(mean_angular_error(out, clean))
            cd = float(jnp.mean(pm.chamfer_distance(clean.v, out.v)))
            row = json.dumps({
                "mesh": stem, "ni": ni, "sr": sr, "vi": vi,
                "gsi": gsi, "gss": gss,
                "Ea": round(ea, 3), "CD": cd,
                "Ea_ratio": round(ea / ea_ref, 4),
                "CD_ratio": round(cd / cd_ref, 4),
            })
            print(row, flush=True)
            if args.out:
                with open(args.out, "a") as fh:
                    fh.write(row + "\n")


if __name__ == "__main__":
    main()
