"""Measure the auto-recipe statistics on every golden and held-out case.

Produces the table that fixes the thresholds in
ngpd_tpu/meshproc/autorecipe.py (recorded in docs/GOLDEN.md):

  python examples/autorecipe_probe.py
"""

from __future__ import annotations

import json
import os
from pathlib import Path

if os.environ.get("NGPD_CPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax

from ngpd_tpu.meshproc.autorecipe import mesh_statistics, pick_recipe
from ngpd_tpu.meshproc.collector import load_mesh
from ngpd_tpu.meshproc.trimesh import add_mesh_noise

REF = Path("/root/reference")


def cases():
    from examples.validate_heldout import heldout_cases

    # The four goldens (the reference's shipped noisy inputs) + their
    # clean twins as negative controls.
    for noisy_rel, clean_rel in [
        ("models/fandisk_gaus_n6_noisy.obj", "models/fandisk.obj"),
        ("models/trim-star_gaus_n3.obj", "models/trim-star.obj"),
        ("models/fertility_gaus_n3.obj", "models/fertility.obj"),
        ("models/nicolo_imp6_noisy.obj", "models/nicolo.obj"),
    ]:
        yield Path(noisy_rel).stem, load_mesh(REF / noisy_rel)
        yield Path(clean_rel).stem + "_CLEAN", load_mesh(REF / clean_rel)
    # The held-out suite at its recorded seeds/noise regimes.
    for i, (label, clean, ntype, level) in enumerate(heldout_cases()):
        key = jax.random.PRNGKey(20260818 + i)
        yield label, add_mesh_noise(clean, key, level, noise_type=ntype)


def main():
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    for label, mesh in cases():
        s = mesh_statistics(mesh)
        r = pick_recipe(mesh, s)
        print(json.dumps({
            "mesh": label,
            "faces": int(mesh.num_faces),
            "noise_deg": round(s.noise_deg, 2),
            "crease_frac": round(s.crease_frac, 4),
            "crease_density": round(s.crease_density, 2),
            "recipe": r.label,
        }), flush=True)


if __name__ == "__main__":
    main()
