"""Shape-bucketed padding parity — padded programs must reproduce the
unpadded ones exactly on real rows (meshproc/bucketing.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from ngpd_tpu.config import GNFConfig, PatchConfig
from ngpd_tpu.meshproc.bucketing import bucket_size, pad_mesh
from ngpd_tpu.meshproc.filtering import guided_normal_filter
from ngpd_tpu.meshproc.gcn_denoiser import gcn_denoise_mesh
from ngpd_tpu.meshproc.patches import extract_mesh_patches
from ngpd_tpu.meshproc.synthetic import wedge
from ngpd_tpu.meshproc.trimesh import add_mesh_noise
from ngpd_tpu.models.dgcnn import DGCNN


def _noisy_wedge():
    mesh = wedge()  # 432 faces -> pads to the 512 bucket
    return add_mesh_noise(mesh, jax.random.PRNGKey(3), 0.3)


def test_bucket_size():
    assert bucket_size(1) == 256
    assert bucket_size(256) == 256
    assert bucket_size(257) == 512
    assert bucket_size(432) == 512
    assert bucket_size(5000, minimum=64) == 8192


def test_pad_mesh_invariants():
    mesh = _noisy_wedge()
    padded = pad_mesh(mesh)
    pm = padded.mesh
    assert pm.num_faces == 512 and pm.num_faces % 256 == 0
    assert pm.num_vertices % 256 == 0
    # Real rows are bit-identical.
    np.testing.assert_array_equal(
        np.asarray(pm.v[: padded.num_vertices]), np.asarray(mesh.v)
    )
    np.testing.assert_array_equal(
        np.asarray(pm.f[: padded.num_faces]), np.asarray(mesh.f)
    )
    # Sentinel faces are non-degenerate and FAR from the real surface.
    normals, areas, centroids = pm.face_data()
    areas = np.asarray(areas)
    assert (areas > 0).all()
    c = np.asarray(centroids)
    real, fake = c[: padded.num_faces], c[padded.num_faces :]
    gap = np.linalg.norm(
        fake[:, None, :] - real[None, :: 16, :], axis=-1
    ).min()
    diag = float(np.linalg.norm(np.ptp(np.asarray(mesh.v), axis=0)))
    assert gap > 10 * diag
    # Real faces' adjacency rows never reference sentinels.
    ff_idx, ff_mask = pm.face_face_adjacency()
    rows = np.asarray(ff_idx[: padded.num_faces])
    assert (rows[np.asarray(ff_mask[: padded.num_faces])] < padded.num_faces).all()


def test_extract_parity():
    mesh = _noisy_wedge()
    cfg = PatchConfig()
    plain = extract_mesh_patches(mesh, cfg=cfg)
    padded = pad_mesh(mesh)
    bucketed = extract_mesh_patches(padded.mesh, cfg=cfg)
    nf = padded.num_faces
    np.testing.assert_allclose(
        np.asarray(bucketed.inputs[:nf]), np.asarray(plain.inputs),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(bucketed.rotations[:nf]), np.asarray(plain.rotations),
        atol=1e-6,
    )


def test_gnf_parity():
    mesh = _noisy_wedge()
    guidance, _, _ = mesh.face_data()
    cfg = GNFConfig(normal_iterations=2, vertex_iterations=4)
    plain = guided_normal_filter(mesh, guidance, cfg)

    padded = pad_mesh(mesh)
    own, _, _ = padded.mesh.face_data()
    g_pad = own.at[: padded.num_faces].set(guidance)
    out = guided_normal_filter(
        padded.mesh, g_pad, cfg, face_mask=padded.face_mask
    )
    np.testing.assert_allclose(
        np.asarray(out.v[: padded.num_vertices]), np.asarray(plain.v),
        atol=1e-5,
    )


def test_gcn_denoise_bucketed_parity():
    mesh = _noisy_wedge()
    model = DGCNN()
    x0 = jnp.zeros((2, 20, PatchConfig().num_nodes))
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    cfg = GNFConfig(normal_iterations=1, vertex_iterations=2)
    plain = gcn_denoise_mesh(
        mesh, model, variables, passes=1, gnf_cfg=cfg, batch_size=256
    )
    bucketed = gcn_denoise_mesh(
        mesh, model, variables, passes=1, gnf_cfg=cfg, batch_size=256,
        bucketed=True,
    )
    assert bucketed.num_vertices == mesh.num_vertices
    np.testing.assert_allclose(
        np.asarray(bucketed.v), np.asarray(plain.v), atol=1e-5
    )


def test_cascade_second_stage_weights_used():
    """variables2 must actually drive the second pass: two passes with a
    distinct stage-2 model differ from two passes of stage 1."""
    mesh = _noisy_wedge()
    model = DGCNN()
    x0 = jnp.zeros((2, 20, PatchConfig().num_nodes))
    v1 = model.init(jax.random.PRNGKey(0), x0, train=False)
    v2 = model.init(jax.random.PRNGKey(1), x0, train=False)
    cfg = GNFConfig(normal_iterations=1, vertex_iterations=2)
    same = gcn_denoise_mesh(
        mesh, model, v1, passes=2, gnf_cfg=cfg, batch_size=256
    )
    cascade = gcn_denoise_mesh(
        mesh, model, v1, passes=2, gnf_cfg=cfg, batch_size=256,
        variables2=v2,
    )
    # First pass identical, second differs -> outputs differ.
    assert float(jnp.abs(cascade.v - same.v).max()) > 1e-7


def test_cascade_pass2_filter_config_used():
    """gnf_cfg2 must drive every pass after the first: a gentler second-
    pass filter (the cascade recipe, docs/GOLDEN.md) changes the output,
    and pass 1 is unaffected (passes=1 ignores gnf_cfg2)."""
    mesh = _noisy_wedge()
    model = DGCNN()
    x0 = jnp.zeros((2, 20, PatchConfig().num_nodes))
    v1 = model.init(jax.random.PRNGKey(0), x0, train=False)
    cfg = GNFConfig(normal_iterations=2, vertex_iterations=2)
    gentle = GNFConfig(normal_iterations=1, vertex_iterations=1)
    full = gcn_denoise_mesh(
        mesh, model, v1, passes=2, gnf_cfg=cfg, batch_size=256
    )
    eased = gcn_denoise_mesh(
        mesh, model, v1, passes=2, gnf_cfg=cfg, batch_size=256,
        gnf_cfg2=gentle,
    )
    assert float(jnp.abs(eased.v - full.v).max()) > 1e-7
    one_a = gcn_denoise_mesh(
        mesh, model, v1, passes=1, gnf_cfg=cfg, batch_size=256
    )
    one_b = gcn_denoise_mesh(
        mesh, model, v1, passes=1, gnf_cfg=cfg, batch_size=256,
        gnf_cfg2=gentle,
    )
    np.testing.assert_array_equal(np.asarray(one_a.v), np.asarray(one_b.v))
