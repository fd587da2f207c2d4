"""Diagnose the organic-golden CD gap (fertility 1.43x, nicolo 1.19x).

docs/GOLDEN.md round-4 cascade table: fertility's CD ratio (1.43) is
disproportionate to its Ea ratio (1.11) — positions lag normals. The
usual mechanism for that in normal-guided vertex updating is SHRINKAGE:
iterating v += mean_f n_f (n_f.(c_f - v)) on slightly-wrong normals
contracts high-curvature regions (the same failure Taubin smoothing
corrects for in classical filtering). This probe splits the Chamfer
distance into its one-sided parts and measures shrinkage signatures
(signed volume, total area, mean radial extent) of our deployment
output vs the reference's shipped output vs the clean mesh.

Usage: python examples/organic_cd_probe.py [--only fertility]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REF = Path("/root/reference")

CASES = [
    ("models/fertility_gaus_n3.obj", "models/fertility.obj",
     "models/fertility_gaus_n3_denoised.obj"),
    ("models/nicolo_imp6_noisy.obj", "models/nicolo.obj",
     "models/nicolo_imp_n6_denoised.obj"),
]


def mesh_stats(v: np.ndarray, f: np.ndarray) -> dict:
    tri = v[f]
    # Signed volume via the divergence theorem (watertight assumption —
    # fine for relative comparison of the same topology).
    vol = float(np.sum(np.einsum("ij,ij->i", tri[:, 0],
                                 np.cross(tri[:, 1], tri[:, 2])))) / 6.0
    area = float(0.5 * np.linalg.norm(
        np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=1
    ).sum())
    c = v.mean(axis=0)
    return {
        "volume": vol,
        "area": area,
        "radial_mean": float(np.linalg.norm(v - c, axis=1).mean()),
        "bbox_diag": float(np.linalg.norm(v.max(0) - v.min(0))),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    ap.add_argument("--save", default=None,
                    help="save our denoised mesh to this path")
    args = ap.parse_args()

    from ngpd_tpu.learn.weights import load_dgcnn_npz
    from ngpd_tpu.meshproc.autorecipe import pick_recipe
    from ngpd_tpu.meshproc.collector import load_mesh
    from ngpd_tpu.meshproc.gcn_denoiser import gcn_denoise_mesh
    from ngpd_tpu.meshproc.metrics import mean_angular_error
    from ngpd_tpu.models.dgcnn import DGCNN
    from ngpd_tpu.ops import metrics as pm

    model = DGCNN()
    variables = load_dgcnn_npz("/root/repo/assets/dgcnn_mesh.npz")
    variables2 = load_dgcnn_npz("/root/repo/assets/dgcnn_mesh_2.npz")

    for noisy_rel, clean_rel, ref_rel in CASES:
        if args.only and args.only not in noisy_rel:
            continue
        noisy = load_mesh(REF / noisy_rel)
        clean = load_mesh(REF / clean_rel)
        ref_out = load_mesh(REF / ref_rel)
        recipe = pick_recipe(noisy)
        ours = gcn_denoise_mesh(
            noisy, model, variables, passes=recipe.passes,
            gnf_cfg=recipe.gnf_cfg, gnf_cfg2=recipe.gnf_cfg2,
            variables2=variables2, bucketed=True,
        )
        vc = np.asarray(clean.v)
        stc = mesh_stats(vc, np.asarray(clean.f))
        report = {"mesh": Path(noisy_rel).stem, "recipe": recipe.label}
        for label, m in (("ref", ref_out), ("ours", ours)):
            vm = np.asarray(m.v)
            d_m2c = float(pm.single_chamfer_distance(vm, vc).mean())
            d_c2m = float(pm.single_chamfer_distance(vc, vm).mean())
            st = mesh_stats(vm, np.asarray(m.f))
            report[label] = {
                "Ea": float(mean_angular_error(m, clean)),
                "CD": float(pm.chamfer_distance(vc, vm).mean()),
                "out->clean": d_m2c,
                "clean->out": d_c2m,
                "volume_ratio": st["volume"] / stc["volume"],
                "area_ratio": st["area"] / stc["area"],
                "radial_ratio": st["radial_mean"] / stc["radial_mean"],
            }
        print(json.dumps(report, indent=2), flush=True)
        if args.save:
            from ngpd_tpu.io.obj import save_obj

            save_obj(args.save, np.asarray(ours.v),
                     faces=np.asarray(ours.f))


if __name__ == "__main__":
    main()
