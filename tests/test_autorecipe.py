"""Auto-recipe regime estimation (meshproc.autorecipe).

The reference app leaves noise level/type and filter iterations to Qt
spinboxes (GCNDenoiser.cpp:25-33); ngpd_tpu estimates the regime from
the noisy mesh itself. These tests pin the classifier on synthetic
shapes where the regime is known by construction: a box is crease-rich
CAD (its crease set is curve-like: 12 edges), an icosphere is smooth/
organic (no creases at all).
"""

import jax
import pytest

from ngpd_tpu.meshproc.autorecipe import (
    mesh_statistics,
    pick_recipe,
)
from ngpd_tpu.meshproc.synthetic import box, icosphere
from ngpd_tpu.meshproc.trimesh import add_mesh_noise


@pytest.fixture(scope="module")
def shapes():
    return {"box": box(n=10), "sphere": icosphere(subdiv=3)}


def _noisy(mesh, level, ntype=0, seed=7):
    return add_mesh_noise(
        mesh, jax.random.PRNGKey(seed), level, noise_type=ntype
    )


# Noise 0.45 x edge length lands noise_deg ~41-42 — the goldens' heavy
# regime (fandisk gaus n6 sits at ~39). 0.6 is past anything shipped:
# there the probe's smoothing residue turns area-like on fine boxes and
# the density drifts above the CAD band (measured: n=16 box 5.74).


def test_noise_deg_tracks_severity(shapes):
    clean = mesh_statistics(shapes["box"])
    heavy = mesh_statistics(_noisy(shapes["box"], 0.45))
    light = mesh_statistics(_noisy(shapes["box"], 0.1))
    assert clean.noise_deg < light.noise_deg < heavy.noise_deg
    assert heavy.noise_deg >= 38.0


def test_crease_density_separates_cad_from_organic(shapes):
    cad = mesh_statistics(_noisy(shapes["box"], 0.45))
    # The sphere gets MORE noise than the box and still reads organic.
    organic = mesh_statistics(_noisy(shapes["sphere"], 0.6))
    assert cad.crease_density > organic.crease_density
    # The box's 12 crease edges form a curve-like set: density lands in
    # the CAD band; the sphere has no true creases.
    assert 1.5 <= cad.crease_density <= 5.5
    assert organic.crease_density < 1.5


def test_crease_density_is_tessellation_invariant(shapes):
    coarse = mesh_statistics(_noisy(box(n=8), 0.45, seed=3))
    fine = mesh_statistics(_noisy(box(n=16), 0.45, seed=3))
    # crease_frac halves as faces quadruple; the density stays in band.
    assert fine.crease_frac < coarse.crease_frac
    assert 1.5 <= coarse.crease_density <= 5.5
    assert 1.5 <= fine.crease_density <= 5.5


def test_pick_recipe_branches(shapes):
    # Heavy Gaussian CAD -> the wide-kernel full-strength cascade.
    heavy_cad = pick_recipe(_noisy(shapes["box"], 0.45))
    assert heavy_cad.label == "heavy-cad"
    assert heavy_cad.gnf_cfg.radius_scale == 4.0
    assert heavy_cad.passes == 2
    # Heavy organic -> the organic-heavy recipe: passes the noise gate
    # (noise_deg ~40) but is crease-FREE, so the guidance-smoothed
    # early-stop branch wins (the wide kernel over-smooths organics).
    organic = pick_recipe(_noisy(shapes["sphere"], 0.6))
    assert organic.label == "organic-heavy"
    assert organic.gnf_cfg.guidance_smooth_iterations == 1
    # Gentle second pass in the organic branch too.
    assert organic.gnf_cfg2.normal_iterations < 12
    # Light-noise organic -> the early-stopped organic recipe.
    light_org = pick_recipe(_noisy(shapes["sphere"], 0.2))
    assert light_org.label == "organic"
    assert light_org.gnf_cfg.normal_iterations == 4
    # Light noise on CAD -> organic: the round-5 three-arm A/B showed
    # the guidance-smoothed recipe wins or ties everywhere outside the
    # heavy-noise band (its range term protects sharp creases), so the
    # light-noise branch routes organic even on crease-rich shapes.
    assert pick_recipe(_noisy(shapes["box"], 0.1)).label == "organic"
    # Clean mesh -> the gentle organic branch (negative control: a
    # clean input takes the early-stopped recipe, not a heavy one).
    assert pick_recipe(shapes["box"]).label == "organic"
    # Catastrophic noise -> the plain tuned filter (the stairs-g6
    # regime: raw disorder >= 55 deg degrades guidance past the point
    # where any specialist recipe helps).
    from ngpd_tpu.meshproc.autorecipe import EXTREME_NOISE_DEG, MeshStats

    ex = MeshStats(noise_deg=EXTREME_NOISE_DEG + 5.0, crease_frac=0.1,
                   crease_density=9.0)
    assert pick_recipe(shapes["box"], ex).label == "default"


@pytest.mark.slow
def test_golden_meshes_route_to_measured_winners():
    """Routing lock on the four golden noisy meshes: a threshold tweak
    must not silently change which recipe `--auto` hands each golden.
    Fandisk/fertility/nicolo route to their measured per-mesh winner;
    trim-star routes organic — 0.14 deg off its per-mesh Ea best with
    a BETTER chamfer distance, the regret-minimal rule fixed by the
    round-5 three-arm A/B (docs/GOLDEN.md). Stats only — no denoise
    run."""
    from pathlib import Path

    ref = Path("/root/reference/models")
    if not ref.exists():
        pytest.skip("reference assets not mounted")
    from ngpd_tpu.meshproc.collector import load_mesh

    expected = {
        "fandisk_gaus_n6_noisy.obj": "heavy-cad",
        "trim-star_gaus_n3.obj": "organic",
        "fertility_gaus_n3.obj": "organic",
        "nicolo_imp6_noisy.obj": "organic-heavy",
    }
    got = {
        name: pick_recipe(load_mesh(ref / name)).label
        for name in expected
    }
    assert got == expected
