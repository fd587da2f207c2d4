"""Golden-asset tests against the reference's shipped data.

Uses the reference repo's noisy/clean OBJ pairs (read-only test DATA,
not code) the way PostProcessing.ipynb does: denoising the shipped
noisy clouds must reduce CD/sCD against the clean models. Skipped when
the assets are not mounted.
"""

from pathlib import Path

import numpy as np
import jax.numpy as jnp
import pytest

REF_MODELS = Path("/root/reference/models")
REF_NOISE = Path("/root/reference/common-3d-test-models-master/Generated_Noise")
REF_CLEAN = Path("/root/reference/common-3d-test-models-master")

pytestmark = [
    pytest.mark.skipif(
        not REF_MODELS.exists(), reason="reference assets not mounted"
    ),
    pytest.mark.slow,  # tier-2: full denoise runs on real meshes
]


def _estimated(points):
    from ngpd_tpu.core.normals import orient_normals, pvt_normals
    from ngpd_tpu.ops.knn import knn

    nbh, _ = knn(points, 12, exclude_self=True)
    return orient_normals(points, pvt_normals(points, nbh), nbh)


def _cd(a, b):
    from ngpd_tpu.ops import metrics

    return float(jnp.mean(metrics.chamfer_distance(a, b)))


def test_fandisk_denoise_improves_cd():
    from ngpd_tpu.core.pipeline import denoise
    from ngpd_tpu.io.obj import load_obj

    gt = load_obj(REF_MODELS / "fandisk.obj").points
    noisy = load_obj(REF_MODELS / "fandisk_gaus_n6_noisy.obj").points
    nrm = _estimated(noisy)
    out, _, _ = denoise(noisy, nrm, iterations=4)
    cd0, cd1 = _cd(noisy, gt), _cd(out, gt)
    assert cd1 < 0.65 * cd0, (cd0, cd1)


def test_fused_matches_pipeline_on_fandisk():
    """Windowed engine parity on REAL data (not just synthetic)."""
    from ngpd_tpu.core.fused import fused_denoise
    from ngpd_tpu.core.pipeline import denoise
    from ngpd_tpu.io.obj import load_obj

    noisy = load_obj(REF_MODELS / "fandisk_gaus_n6_noisy.obj").points
    # Subsample for CPU test speed.
    noisy = noisy[::4]
    nrm = _estimated(noisy)
    want, _, wc = denoise(noisy, nrm, iterations=1)
    got, _, gc = fused_denoise(
        noisy, nrm, iterations=1, tile=128, window=1024, group=2
    )
    agree = (np.asarray(gc) == np.asarray(wc)).mean()
    assert agree > 0.995, agree
    # Window-approximate neighbor sets propagate small position
    # differences even where classes agree; fandisk spans ~300 units,
    # so 0.05 is ~0.02% of the extent.
    same = np.asarray(gc) == np.asarray(wc)
    np.testing.assert_allclose(
        np.asarray(got)[same], np.asarray(want)[same], atol=5e-2
    )


def test_generated_noise_assets_denoise():
    from ngpd_tpu.core.pipeline import denoise
    from ngpd_tpu.io.obj import load_obj
    from ngpd_tpu.io.sampling import sample_mesh
    from ngpd_tpu.io.obj import read_obj

    noisy_p = REF_NOISE / "fandisk_2.obj"
    clean_p = REF_CLEAN / "fandisk.obj"
    if not noisy_p.exists():
        pytest.skip("Generated_Noise assets absent")
    noisy = load_obj(noisy_p).points[::4]
    clean_mesh = read_obj(clean_p)
    gt = jnp.asarray(sample_mesh(clean_mesh.v, clean_mesh.fv, 2**14).points)
    nrm = _estimated(noisy)
    # Low-noise asset: use the reference's own until-minimum-error
    # driver (returns the best iterate, so never worse than the input).
    from ngpd_tpu.core.pipeline import denoise_until_minimum_error

    best, _, err, iters = denoise_until_minimum_error(
        noisy, nrm, gt, max_iterations=6
    )
    cd0, cd1 = _cd(noisy, gt), _cd(best, gt)
    assert cd1 <= cd0 * 1.001, (cd0, cd1, int(iters))


def test_gcn_normals_beat_noisy_on_golden_trimstar():
    """The shipped checkpoint's patch-network normals must cut the
    angular error of the golden trim-star mesh well below the noisy
    input's (the GCN half of MeshViewer::slotDenoise; the GNF half is
    covered by tests/test_train_e2e.py). One 720-face batch keeps this
    CPU-affordable; the full-mesh numbers live in docs/GOLDEN.md."""
    ckpt = Path(__file__).resolve().parents[1] / "assets" / "dgcnn_mesh.npz"
    if not ckpt.exists():
        pytest.skip("trained mesh checkpoint not built")
    from ngpd_tpu.learn.weights import load_dgcnn_npz
    from ngpd_tpu.meshproc.collector import load_mesh
    from ngpd_tpu.meshproc.gcn_denoiser import _fwd
    from ngpd_tpu.meshproc.patches import (
        extract_mesh_patches,
        unrotate_predictions,
    )
    from ngpd_tpu.models.dgcnn import dgcnn_from_variables

    noisy = load_mesh(REF_MODELS / "trim-star_gaus_n3.obj")
    clean = load_mesh(REF_MODELS / "trim-star.obj")
    assert noisy.f.shape == clean.f.shape  # same topology, moved verts

    variables = load_dgcnn_npz(ckpt)
    model = dgcnn_from_variables(variables)
    patches = extract_mesh_patches(noisy)
    nf = patches.inputs.shape[0]
    sel = np.linspace(0, nf - 1, 720).astype(np.int32)

    pred = _fwd(model, variables, patches.inputs[sel])
    pred = pred / jnp.maximum(
        jnp.linalg.norm(pred, axis=1, keepdims=True), 1e-12
    )
    pred_world = unrotate_predictions(pred, patches.rotations[sel])

    gt_n, _, _ = clean.face_data()
    noisy_n, _, _ = noisy.face_data()

    def ang(a, b):
        d = jnp.abs(jnp.clip(jnp.sum(a * b, axis=1), -1, 1))
        return float(jnp.mean(jnp.degrees(jnp.arccos(d))))

    e_noisy = ang(noisy_n[sel], gt_n[sel])
    e_pred = ang(pred_world, gt_n[sel])
    # Full-mesh round-2 numbers: 28.8deg noisy -> 12.3deg after GCN+GNF.
    assert e_pred < 0.62 * e_noisy, (e_noisy, e_pred)


def test_cascade_beats_reference_output_on_trimstar():
    """The shipped two-stage cascade (distinct stage-2 checkpoint +
    gentle second-pass filter — the deployment recipe, docs/GOLDEN.md
    round-4 cascade table) must beat the reference app's own shipped
    denoised trim-star on mean angular error. Locks the headline
    'matches or beats' claim to the committed checkpoints."""
    assets = Path(__file__).resolve().parents[1] / "assets"
    ckpt, ckpt2 = assets / "dgcnn_mesh.npz", assets / "dgcnn_mesh_2.npz"
    if not (ckpt.exists() and ckpt2.exists()):
        pytest.skip("trained cascade checkpoints not built")
    from ngpd_tpu.config import GNFConfig
    from ngpd_tpu.learn.weights import load_dgcnn_npz
    from ngpd_tpu.meshproc.collector import load_mesh
    from ngpd_tpu.meshproc.gcn_denoiser import gcn_denoise_mesh
    from ngpd_tpu.meshproc.metrics import mean_angular_error
    from ngpd_tpu.models.dgcnn import dgcnn_from_variables

    noisy = load_mesh(REF_MODELS / "trim-star_gaus_n3.obj")
    clean = load_mesh(REF_MODELS / "trim-star.obj")
    ref_out = load_mesh(REF_MODELS / "trim-star_gaus_n3_denoised.obj")

    variables = load_dgcnn_npz(ckpt)
    ours = gcn_denoise_mesh(
        noisy,
        dgcnn_from_variables(variables),
        variables,
        passes=2,
        gnf_cfg=GNFConfig(),  # round-4 tuned default (20 / 0.12 / 8)
        variables2=load_dgcnn_npz(ckpt2),
        gnf_cfg2=GNFConfig(
            normal_iterations=4, sigma_r=0.12, vertex_iterations=2
        ),
    )
    ea_ref = float(mean_angular_error(ref_out, clean))
    ea_ours = float(mean_angular_error(ours, clean))
    assert ea_ours < ea_ref, (ea_ours, ea_ref)


def test_heavy_cad_cascade_beats_reference_output_on_fandisk():
    """The heavy-cad recipe (wide spatial kernel + full-strength
    two-stage cascade — what `--auto` routes fandisk gaus n6 to) must
    beat the reference app's own shipped denoised fandisk on mean
    angular error (docs/GOLDEN.md: 3.49 vs 3.95). Locks the hardest
    golden's headline win to the committed checkpoints and recipe."""
    assets = Path(__file__).resolve().parents[1] / "assets"
    ckpt, ckpt2 = assets / "dgcnn_mesh.npz", assets / "dgcnn_mesh_2.npz"
    if not (ckpt.exists() and ckpt2.exists()):
        pytest.skip("trained cascade checkpoints not built")
    from ngpd_tpu.learn.weights import load_dgcnn_npz
    from ngpd_tpu.meshproc.autorecipe import HEAVY_CAD_RECIPE
    from ngpd_tpu.meshproc.collector import load_mesh
    from ngpd_tpu.meshproc.gcn_denoiser import gcn_denoise_mesh
    from ngpd_tpu.meshproc.metrics import mean_angular_error
    from ngpd_tpu.models.dgcnn import dgcnn_from_variables

    noisy = load_mesh(REF_MODELS / "fandisk_gaus_n6_noisy.obj")
    clean = load_mesh(REF_MODELS / "fandisk.obj")
    ref_out = load_mesh(REF_MODELS / "fandisk_gaus_n6_denoised.obj")

    variables = load_dgcnn_npz(ckpt)
    ours = gcn_denoise_mesh(
        noisy,
        dgcnn_from_variables(variables),
        variables,
        passes=HEAVY_CAD_RECIPE["passes"],
        gnf_cfg=HEAVY_CAD_RECIPE["gnf_cfg"],
        variables2=load_dgcnn_npz(ckpt2),
        gnf_cfg2=HEAVY_CAD_RECIPE["gnf_cfg2"],
        bucketed=True,
    )
    ea_ref = float(mean_angular_error(ref_out, clean))
    ea_ours = float(mean_angular_error(ours, clean))
    assert ea_ours < ea_ref, (ea_ours, ea_ref)


def test_organic_cascade_beats_reference_output_on_fertility():
    """The organic recipe (guidance-smoothing pre-pass + early-stopped
    filter + gentle second cascade pass — what `--auto` routes
    fertility gaus n3 to) must beat the reference app's own shipped
    denoised fertility on BOTH mean angular error and chamfer distance
    (docs/GOLDEN.md round-5: Ea 3.949 vs 4.013, CD ratio 0.88). Locks
    the organic-regime win to the committed checkpoints and recipe."""
    assets = Path(__file__).resolve().parents[1] / "assets"
    ckpt, ckpt2 = assets / "dgcnn_mesh.npz", assets / "dgcnn_mesh_2.npz"
    if not (ckpt.exists() and ckpt2.exists()):
        pytest.skip("trained cascade checkpoints not built")
    from ngpd_tpu.learn.weights import load_dgcnn_npz
    from ngpd_tpu.meshproc.autorecipe import ORGANIC_RECIPE
    from ngpd_tpu.meshproc.collector import load_mesh
    from ngpd_tpu.meshproc.gcn_denoiser import gcn_denoise_mesh
    from ngpd_tpu.meshproc.metrics import mean_angular_error
    from ngpd_tpu.models.dgcnn import dgcnn_from_variables
    from ngpd_tpu.ops import metrics as pmetrics

    noisy = load_mesh(REF_MODELS / "fertility_gaus_n3.obj")
    clean = load_mesh(REF_MODELS / "fertility.obj")
    ref_out = load_mesh(REF_MODELS / "fertility_gaus_n3_denoised.obj")

    variables = load_dgcnn_npz(ckpt)
    ours = gcn_denoise_mesh(
        noisy,
        dgcnn_from_variables(variables),
        variables,
        passes=ORGANIC_RECIPE["passes"],
        gnf_cfg=ORGANIC_RECIPE["gnf_cfg"],
        variables2=load_dgcnn_npz(ckpt2),
        gnf_cfg2=ORGANIC_RECIPE["gnf_cfg2"],
        bucketed=True,
    )
    ea_ref = float(mean_angular_error(ref_out, clean))
    ea_ours = float(mean_angular_error(ours, clean))
    assert ea_ours < ea_ref, (ea_ours, ea_ref)
    cd_ref = float(jnp.mean(pmetrics.chamfer_distance(clean.v, ref_out.v)))
    cd_ours = float(jnp.mean(pmetrics.chamfer_distance(clean.v, ours.v)))
    assert cd_ours < cd_ref, (cd_ours, cd_ref)
