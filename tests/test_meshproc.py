"""Mesh track: geometry ops, vertex updating, GNF, error metrics."""

import numpy as np
import jax.numpy as jnp

from ngpd_tpu.config import GNFConfig
from ngpd_tpu.meshproc import metrics as mm
from ngpd_tpu.meshproc.filtering import (
    guided_normal_filter,
    update_vertex_positions,
)
from ngpd_tpu.meshproc.trimesh import TriMesh

from fixtures import OCTA_F, OCTA_V


def _plane_mesh(n=12, spacing=1.0):
    xs = np.arange(n, dtype=np.float32) * spacing
    xx, yy = np.meshgrid(xs, xs, indexing="ij")
    v = np.stack([xx, yy, np.zeros_like(xx)], -1).reshape(-1, 3)
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            faces.append([a, a + n, a + 1])
            faces.append([a + 1, a + n, a + n + 1])
    return v, np.asarray(faces, np.int32)


def test_octahedron_face_data():
    m = TriMesh.from_numpy(OCTA_V, OCTA_F)
    normals, areas, centroids = m.face_data()
    # Exact-value asserts (test_Mesh.py:91-151 style).
    np.testing.assert_allclose(np.asarray(areas), np.sqrt(3) / 2, atol=1e-6)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(normals), axis=1), 1.0, atol=1e-6
    )
    # Normals point away from the origin.
    assert (np.sum(np.asarray(normals) * np.asarray(centroids), axis=1) > 0).all()
    # Vertex normals radial.
    vn = np.asarray(m.vertex_normals())
    radial = OCTA_V / np.linalg.norm(OCTA_V, axis=1, keepdims=True)
    np.testing.assert_allclose(vn, radial, atol=1e-6)


def test_adjacency():
    m = TriMesh.from_numpy(OCTA_V, OCTA_F)
    vf_idx, vf_mask = m.vertex_face_adjacency()
    assert np.asarray(vf_mask).sum() == 8 * 3  # every face at 3 vertices
    ff_idx, ff_mask = m.face_face_adjacency()
    assert np.asarray(ff_mask).all()  # closed surface: 3 neighbors each


def test_transforms():
    m = TriMesh.from_numpy(OCTA_V, OCTA_F)
    t = m.translated(jnp.asarray([1.0, 2.0, 3.0]))
    np.testing.assert_allclose(
        np.asarray(t.v).mean(0), [1.0, 2.0, 3.0], atol=1e-6
    )
    r = m.resized(2.0)
    np.testing.assert_allclose(
        np.asarray(r.average_edge_length()),
        np.asarray(m.average_edge_length()) * 2,
        rtol=1e-5,
    )
    u = m.translated(jnp.asarray([5.0, 0.0, 0.0])).centered_unit()
    assert abs(float(jnp.max(u.v) - 0.5)) < 1e-5


def test_update_vertex_positions_flattens():
    v, f = _plane_mesh(10)
    rng = np.random.default_rng(0)
    noisy = v.copy()
    noisy[:, 2] += rng.normal(scale=0.2, size=len(v)).astype(np.float32)
    m = TriMesh.from_numpy(noisy, f)
    vf_idx, vf_mask = m.vertex_face_adjacency()
    gt_normals = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (len(f), 1))
    out = update_vertex_positions(
        m.v, m.f, vf_idx, vf_mask, gt_normals, iterations=16
    )
    z = np.asarray(out)[:, 2]
    assert z.std() < noisy[:, 2].std() * 0.2, z.std()
    # x/y drift stays tiny (updates ride the +z normals).
    np.testing.assert_allclose(np.asarray(out)[:, :2], noisy[:, :2], atol=1e-4)


def test_guided_normal_filter_denoises():
    v, f = _plane_mesh(12)
    rng = np.random.default_rng(1)
    noisy = v.copy()
    noisy[:, 2] += rng.normal(scale=0.15, size=len(v)).astype(np.float32)
    gt = TriMesh.from_numpy(v, f)
    m = TriMesh.from_numpy(noisy, f)
    guidance = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (len(f), 1))
    cfg = GNFConfig(normal_iterations=4, vertex_iterations=8)
    out = guided_normal_filter(m, guidance, cfg, neighbors=32)
    ea_before = float(mm.mean_angular_error(m, gt))
    ea_after = float(mm.mean_angular_error(out, gt))
    assert ea_after < ea_before * 0.3, (ea_before, ea_after)


def test_metrics_zero_on_identical():
    m = TriMesh.from_numpy(OCTA_V, OCTA_F)
    # f32 acos near dot=1 floors at ~0.06 deg per face.
    assert float(mm.mean_angular_error(m, m)) < 0.1
    assert float(mm.msae(m, m)) < 0.1
    assert float(mm.vertex_distance(m, m)) < 1e-6


def test_error_map_colors():
    v, f = _plane_mesh(6)
    gt = TriMesh.from_numpy(v, f)
    colors = mm.error_map_colors(gt, gt)
    # Zero error -> pure blue.
    np.testing.assert_allclose(colors, [[0.0, 0.0, 1.0]] * len(v), atol=1e-6)


def test_predict_face_normals_sharded_parity():
    """pmesh= dp-shards the patch inference over the device mesh; the
    result matches the single-device 720-face loop (the face batch is
    embarrassingly parallel — MeshViewer.cpp:806's loop is a CUDA
    memory artifact, not an algorithmic one)."""
    import jax
    import pytest

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from ngpd_tpu.config import PatchConfig
    from ngpd_tpu.learn.train_dgcnn import init_dgcnn
    from ngpd_tpu.meshproc.gcn_denoiser import predict_face_normals
    from ngpd_tpu.meshproc.synthetic import icosphere
    from ngpd_tpu.parallel.mesh import make_mesh

    pcfg = PatchConfig(num_nodes=16)
    model, state, _ = init_dgcnn(
        jax.random.PRNGKey(0), emb_dims=32, num_nodes=pcfg.num_nodes
    )
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    ico = icosphere(subdiv=2)
    want = predict_face_normals(ico, model, variables, pcfg, batch_size=64)
    got = predict_face_normals(
        ico, model, variables, pcfg, pmesh=make_mesh(8)
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-4)


def test_gnf_nonfinite_hardening():
    """Padded-mesh hazards (meshproc.bucketing): masked sentinel faces
    can carry inf/NaN centroids after a runaway strip update, and faces
    whose every neighborhood weight underflows must keep their own
    normal instead of normalizing a flushed-to-zero accumulator (the
    round-4 all-NaN build2 bug)."""
    from ngpd_tpu.meshproc.filtering import _gnf_radius_sigma

    v, f = _plane_mesh(6)
    # A "sentinel" vertex at inf on the last face's row via face_mask.
    v_bad = v.copy()
    v_bad[int(f[-1][0])] = np.inf
    m = TriMesh.from_numpy(v_bad, f)
    face_mask = np.ones(len(f), bool)
    # mask out every face touching the inf vertex
    face_mask[np.any(f == int(f[-1][0]), axis=1)] = False
    sigma = _gnf_radius_sigma(m, 1.0, jnp.asarray(face_mask))
    assert np.isfinite(float(sigma)), float(sigma)

    # update_vertex_positions: NaN normals on masked adjacency slots
    # must contribute exactly zero.
    v2, f2 = _plane_mesh(4)
    m2 = TriMesh.from_numpy(v2, f2)
    vf_idx, vf_mask = m2.vertex_face_adjacency()
    normals = np.tile([[0.0, 0.0, 1.0]], (len(f2), 1)).astype(np.float32)
    normals[0] = np.nan  # face 0 is the padding fill value of vf_idx
    vf_mask_np = np.asarray(vf_mask).copy()
    vf_mask_np[np.asarray(vf_idx) == 0] = False  # mask face-0 slots
    out = update_vertex_positions(
        m2.v, m2.f, vf_idx, jnp.asarray(vf_mask_np),
        jnp.asarray(normals), iterations=4,
    )
    assert np.isfinite(np.asarray(out)).all()


def test_gnf_zero_weight_rescue():
    """sigma_r so tight that every range weight underflows: each face
    must keep its own normal (finite output, geometry barely moves)
    rather than exploding to ~1e10 pseudo-normals."""
    v, f = _plane_mesh(6)
    rng = np.random.default_rng(3)
    m = TriMesh.from_numpy(v, f)
    guidance = rng.normal(size=(len(f), 3))
    guidance /= np.linalg.norm(guidance, axis=1, keepdims=True)
    cfg = GNFConfig(normal_iterations=2, vertex_iterations=4,
                    sigma_r=1e-6)
    out = guided_normal_filter(
        m, jnp.asarray(guidance.astype(np.float32)), cfg, neighbors=16
    )
    ov = np.asarray(out.v)
    assert np.isfinite(ov).all()
    assert np.abs(ov - v).max() < 1.0, np.abs(ov - v).max()


def test_guidance_smoothing_constant_field_identity():
    # Smoothing a constant guidance field is a no-op (unit normalize of
    # a positively-weighted average of one vector), so the filter output
    # must match the unsmoothed path exactly.
    v, f = _plane_mesh(8)
    rng = np.random.default_rng(3)
    noisy = v.copy()
    noisy[:, 2] += rng.normal(scale=0.1, size=len(v)).astype(np.float32)
    m = TriMesh.from_numpy(noisy, f)
    guidance = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (len(f), 1))
    base = guided_normal_filter(
        m, guidance, GNFConfig(normal_iterations=2, vertex_iterations=4),
        neighbors=16,
    )
    smoothed = guided_normal_filter(
        m, guidance,
        GNFConfig(normal_iterations=2, vertex_iterations=4,
                  guidance_smooth_iterations=2),
        neighbors=16,
    )
    np.testing.assert_allclose(
        np.asarray(base.v), np.asarray(smoothed.v), atol=1e-5
    )


def test_guidance_smoothing_cancels_prediction_noise():
    # On a crease-free surface with NOISY guidance (the organic regime:
    # near-independent per-face prediction errors), one smoothing round
    # must reduce the angular error of the filtered mesh.
    v, f = _plane_mesh(12)
    rng = np.random.default_rng(5)
    noisy = v.copy()
    noisy[:, 2] += rng.normal(scale=0.1, size=len(v)).astype(np.float32)
    gt = TriMesh.from_numpy(v, f)
    m = TriMesh.from_numpy(noisy, f)
    g = np.tile([0.0, 0.0, 1.0], (len(f), 1))
    g += rng.normal(scale=0.25, size=g.shape)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    guidance = jnp.asarray(g, jnp.float32)
    cfg0 = GNFConfig(normal_iterations=4, vertex_iterations=8)
    cfg1 = GNFConfig(normal_iterations=4, vertex_iterations=8,
                     guidance_smooth_iterations=1,
                     guidance_smooth_sigma=0.5)
    ea0 = float(mm.mean_angular_error(
        guided_normal_filter(m, guidance, cfg0, neighbors=32), gt))
    ea1 = float(mm.mean_angular_error(
        guided_normal_filter(m, guidance, cfg1, neighbors=32), gt))
    assert ea1 < ea0 * 0.9, (ea0, ea1)
