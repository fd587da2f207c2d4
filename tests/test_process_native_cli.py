"""Processor-level APIs, native module, CLI, and viz smoke tests."""

import json
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ngpd_tpu.core import process
from ngpd_tpu.io.obj import save_obj

from fixtures import plane_grid, sphere_cloud

pytestmark = pytest.mark.slow  # tier-2: heavy engine/e2e (pytest.ini)


def test_radius_neighborhood():
    pts, _ = plane_grid(10, spacing=1.0)
    nbh = process.radius_neighborhood(jnp.asarray(pts), 1.5, k_cap=16)
    d = np.linalg.norm(pts[np.asarray(nbh.idx)] - pts[:, None, :], axis=-1)
    m = np.asarray(nbh.mask)
    assert (d[m] <= 1.5 + 1e-5).all()
    # Interior points: self + 4 direct + 4 diagonal = 9.
    deg = m.sum(1)
    assert deg.max() == 9


def test_vu_and_martin_decompositions():
    pts, nrm = sphere_cloud(300, seed=1)
    dec = process.vu_decomposition(jnp.asarray(pts), jnp.asarray(nrm))
    assert np.isfinite(np.asarray(dec.eigval)).all()
    dec2, filtered = process.martin_feature_decomposition(
        jnp.asarray(pts), jnp.asarray(nrm), jnp.asarray(0.5)
    )
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(filtered), axis=1), 1.0, atol=1e-4
    )


def test_md_features_plane_flat():
    pts, nrm = plane_grid(14)
    from ngpd_tpu.config import PatchConfig

    md = np.asarray(
        process.md_features(
            jnp.asarray(pts), jnp.asarray(nrm), PatchConfig(num_nodes=24)
        )
    )
    # A flat plane: interior points classify as flat (1).
    assert (md == 1).mean() > 0.8, (md == 1).mean()


def test_preprocess_pointcloud():
    pts, _ = sphere_cloud(400, seed=2)
    noisy, noisy_n, gt_n = process.preprocess_pointcloud(
        jax.random.PRNGKey(0), jnp.asarray(pts), noise_level=0.3
    )
    moved = np.abs(np.asarray(noisy) - pts).sum()
    assert moved > 0
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(noisy_n), axis=1), 1.0, atol=1e-4
    )


def test_native_obj_parity(tmp_path):
    from ngpd_tpu.native import native_read_obj

    pts, nrm = sphere_cloud(100, seed=3)
    p = tmp_path / "c.obj"
    save_obj(p, pts, nrm)
    parsed = native_read_obj(p)
    if parsed is None:
        pytest.skip("no C++ toolchain")
    v, vn, fv, fn = parsed
    np.testing.assert_allclose(v, pts, atol=1e-5)
    np.testing.assert_allclose(vn, nrm, atol=1e-5)


def test_native_grid_knn_oracle():
    from ngpd_tpu.native import native_grid_knn

    pts = sphere_cloud(1500, seed=4)[0]
    out = native_grid_knn(pts, 8)
    if out is None:
        pytest.skip("no C++ toolchain")
    idx, d = out
    dmat = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    want = np.sort(dmat, axis=1)[:, :8]
    np.testing.assert_allclose(np.sort(d, 1), want, atol=1e-5)


def test_cli_eval_and_denoise(tmp_path):
    pts, nrm = plane_grid(18)
    rng = np.random.default_rng(6)
    noisy = pts + nrm * rng.normal(scale=0.3, size=(len(pts), 1)).astype(
        np.float32
    )
    gt_p = tmp_path / "gt.obj"
    in_p = tmp_path / "in.obj"
    out_p = tmp_path / "out.obj"
    save_obj(gt_p, pts)
    save_obj(in_p, noisy, nrm)

    from ngpd_tpu.apps.cli import main

    main(["denoise", str(in_p), "-o", str(out_p), "--iterations", "2"])
    assert out_p.exists()
    # Denoised CD beats noisy CD.
    from ngpd_tpu.io.obj import load_obj
    from ngpd_tpu.ops import metrics

    out_cloud = load_obj(out_p)
    cd_out = float(
        jnp.mean(metrics.chamfer_distance(out_cloud.points, jnp.asarray(pts)))
    )
    cd_in = float(
        jnp.mean(metrics.chamfer_distance(jnp.asarray(noisy), jnp.asarray(pts)))
    )
    assert cd_out < cd_in

    main(["eval", str(gt_p), str(out_p)])


def test_cli_denoise_mesh_with_gcn_ckpt(tmp_path, capsys):
    """The app's flagship flow from the CLI: denoise-mesh --ckpt --gcns
    (MeshViewer.cpp:769-1416 wired to the box_gcns knob)."""
    import jax

    from ngpd_tpu.apps.cli import main
    from ngpd_tpu.io.obj import save_obj as save
    from ngpd_tpu.learn.train_dgcnn import dgcnn_variables, init_dgcnn
    from ngpd_tpu.learn.weights import save_variables_npz

    n = 8
    rng = np.random.default_rng(3)
    xs, ys = np.meshgrid(
        np.arange(n, dtype=np.float32), np.arange(n, dtype=np.float32)
    )
    v = np.stack(
        [xs.ravel(), ys.ravel(), np.zeros(n * n, np.float32)], axis=1
    )
    f = []
    for i in range(n - 1):
        for j in range(n - 1):
            a, b, c, d = (
                i * n + j, i * n + j + 1, (i + 1) * n + j, (i + 1) * n + j + 1
            )
            f.extend([[a, b, c], [b, d, c]])
    f = np.asarray(f, np.int32)
    clean_p = tmp_path / "clean.obj"
    noisy_p = tmp_path / "noisy.obj"
    out_p = tmp_path / "out.obj"
    save(str(clean_p), v, faces=f)
    noisy_v = v + 0.05 * rng.normal(size=v.shape).astype(np.float32)
    save(str(noisy_p), noisy_v, faces=f)

    # Small emb: the CLI sizes the model from the checkpoint
    # (dgcnn_from_variables), keeping this test fast.
    _, state, _ = init_dgcnn(jax.random.PRNGKey(0), emb_dims=64)
    ckpt = tmp_path / "w.npz"
    save_variables_npz(ckpt, jax.device_get(dgcnn_variables(state)))

    main([
        "denoise-mesh", str(noisy_p), "-o", str(out_p),
        "--ckpt", str(ckpt), "--gcns", "1", "--batch-size", "128",
        "--gt", str(clean_p), "--normal-iterations", "2",
        "--vertex-iterations", "4",
    ])
    assert out_p.exists()
    captured = capsys.readouterr().out
    assert "Ea before:" in captured and "Ea after:" in captured


def test_cli_denoise_mesh_cascade_ckpt2(tmp_path):
    """--ckpt2 must drive the SECOND pass from the CLI (the cascade's
    two-network design: script_model_2.pt, MeshViewer.cpp:787-798):
    two-pass output with a distinct second checkpoint differs from
    two-pass with the first checkpoint alone."""
    import jax

    from ngpd_tpu.apps.cli import main
    from ngpd_tpu.io.obj import load_obj, save_obj as save
    from ngpd_tpu.learn.train_dgcnn import dgcnn_variables, init_dgcnn
    from ngpd_tpu.learn.weights import save_variables_npz

    n = 6
    rng = np.random.default_rng(9)
    xs, ys = np.meshgrid(
        np.arange(n, dtype=np.float32), np.arange(n, dtype=np.float32)
    )
    v = np.stack(
        [xs.ravel(), ys.ravel(), np.zeros(n * n, np.float32)], axis=1
    )
    f = []
    for i in range(n - 1):
        for j in range(n - 1):
            a, b, c, d = (
                i * n + j, i * n + j + 1, (i + 1) * n + j, (i + 1) * n + j + 1
            )
            f.extend([[a, b, c], [b, d, c]])
    f = np.asarray(f, np.int32)
    noisy_p = tmp_path / "noisy.obj"
    save(str(noisy_p), v + 0.05 * rng.normal(size=v.shape).astype(np.float32),
         faces=f)

    ckpts = []
    for seed in (0, 1):
        _, state, _ = init_dgcnn(jax.random.PRNGKey(seed), emb_dims=64)
        p = tmp_path / f"w{seed}.npz"
        save_variables_npz(p, jax.device_get(dgcnn_variables(state)))
        ckpts.append(p)

    out_single = tmp_path / "out_single.obj"
    out_cascade = tmp_path / "out_cascade.obj"
    common = ["--gcns", "2", "--batch-size", "128",
              "--normal-iterations", "2", "--vertex-iterations", "2"]
    main(["denoise-mesh", str(noisy_p), "-o", str(out_single),
          "--ckpt", str(ckpts[0])] + common)
    main(["denoise-mesh", str(noisy_p), "-o", str(out_cascade),
          "--ckpt", str(ckpts[0]), "--ckpt2", str(ckpts[1])] + common)
    a = np.asarray(load_obj(out_single).points)
    b = np.asarray(load_obj(out_cascade).points)
    assert a.shape == b.shape
    assert float(np.abs(a - b).max()) > 1e-6


def test_cli_denoise_mesh_auto_recipe(tmp_path, capsys):
    """--auto estimates the regime from the input and picks the knobs
    (meshproc.autorecipe) — the spinbox-free counterpart of the
    reference app's manual noise/iteration controls
    (GCNDenoiser.cpp:25-33). A lightly-noised flat grid is crease-free
    at light noise, so it must route to the organic recipe and still
    produce output."""
    import jax

    from ngpd_tpu.apps.cli import main
    from ngpd_tpu.learn.train_dgcnn import dgcnn_variables, init_dgcnn
    from ngpd_tpu.learn.weights import save_variables_npz
    from ngpd_tpu.io.obj import save_obj as save

    n = 6
    rng = np.random.default_rng(11)
    xs, ys = np.meshgrid(
        np.arange(n, dtype=np.float32), np.arange(n, dtype=np.float32)
    )
    v = np.stack(
        [xs.ravel(), ys.ravel(), np.zeros(n * n, np.float32)], axis=1
    )
    f = []
    for i in range(n - 1):
        for j in range(n - 1):
            a, b, c, d = (
                i * n + j, i * n + j + 1, (i + 1) * n + j, (i + 1) * n + j + 1
            )
            f.extend([[a, b, c], [b, d, c]])
    f = np.asarray(f, np.int32)
    noisy_p = tmp_path / "noisy.obj"
    out_p = tmp_path / "out.obj"
    save(str(noisy_p), v + 0.02 * rng.normal(size=v.shape).astype(np.float32),
         faces=f)

    _, state, _ = init_dgcnn(jax.random.PRNGKey(0), emb_dims=64)
    ckpt = tmp_path / "w.npz"
    save_variables_npz(ckpt, jax.device_get(dgcnn_variables(state)))

    main([
        "denoise-mesh", str(noisy_p), "-o", str(out_p),
        "--ckpt", str(ckpt), "--auto", "--batch-size", "128",
    ])
    assert out_p.exists()
    captured = capsys.readouterr().out
    assert "auto recipe: organic" in captured


def test_viz_outputs(tmp_path):
    from ngpd_tpu.apps import viz

    pts, nrm = sphere_cloud(200, seed=7)
    p1 = viz.plot_cloud(pts, normals=nrm, out=tmp_path / "c.png")
    assert p1.exists() and p1.stat().st_size > 1000
    cls = np.random.default_rng(0).integers(0, 3, len(pts))
    p2 = viz.plot_classes(pts, cls, out=tmp_path / "cls.png")
    assert p2.exists()
    eigval = np.abs(np.random.default_rng(1).normal(size=(len(pts), 3)))
    eigvec = np.tile(np.eye(3), (len(pts), 1, 1))
    p3 = viz.plot_tensor_voting(pts, eigval, eigvec, out=tmp_path / "tv.png")
    assert p3.exists()


def test_k_ring():
    """k_ring matches a python BFS over the same kNN graph."""
    from ngpd_tpu.core.process import k_ring
    from ngpd_tpu.ops.knn import knn

    pts, _ = plane_grid(8)
    nbh, _ = knn(jnp.asarray(pts), 5, exclude_self=True)
    r2 = k_ring(nbh, 2, cap=40)
    idx = np.asarray(nbh.idx)
    # Oracle BFS.
    n = len(pts)
    for i in (0, 10, 37):
        ring1 = set(idx[i].tolist())
        ring2 = set(ring1)
        for j in ring1:
            ring2 |= set(idx[j].tolist())
        got = set(np.asarray(r2.idx[i])[np.asarray(r2.mask[i])].tolist())
        assert got == ring2, (i, got ^ ring2)


def test_add_mesh_noise():
    from ngpd_tpu.meshproc.trimesh import TriMesh, add_mesh_noise
    from fixtures import OCTA_F, OCTA_V

    m = TriMesh.from_numpy(OCTA_V, OCTA_F)
    noisy = add_mesh_noise(m, jax.random.PRNGKey(0), 0.3)
    disp = np.asarray(noisy.v - m.v)
    assert np.abs(disp).max() > 0
    # Along-normal noise: displacement parallel to vertex normals.
    vn = np.asarray(m.vertex_normals())
    cross = np.linalg.norm(np.cross(disp, vn), axis=1)
    np.testing.assert_allclose(cross, 0.0, atol=1e-6)


def test_cli_noise_roundtrip(tmp_path, capsys):
    """The full no-Python loop the Qt app's buttons cover: generate
    noise (slotGenNoise) -> persist -> re-load (slotLoadNoise) ->
    denoise -> score, all through CLI subcommands."""
    from ngpd_tpu.apps.cli import main
    from ngpd_tpu.io.obj import read_obj
    from ngpd_tpu.meshproc.metrics import mean_angular_error
    from ngpd_tpu.meshproc.synthetic import wedge
    from ngpd_tpu.meshproc.trimesh import TriMesh

    clean = wedge()
    clean_p = tmp_path / "clean.obj"
    save_obj(clean_p, np.asarray(clean.v), faces=np.asarray(clean.f))

    noisy_p = tmp_path / "noisy.obj"
    noise_dir = tmp_path / "noise"
    main([
        "add-noise", str(clean_p), "-o", str(noisy_p),
        "--level", "0.4", "--save-noise", str(noise_dir),
    ])
    realizations = list(noise_dir.glob("*.npz"))
    assert len(realizations) == 1

    # slotLoadNoise: reapplying the persisted realization reproduces
    # the same corrupted mesh bit-for-bit.
    reload_p = tmp_path / "reload.obj"
    main([
        "add-noise", str(clean_p), "-o", str(reload_p),
        "--load-noise", str(realizations[0]),
    ])
    a, b = read_obj(str(noisy_p)), read_obj(str(reload_p))
    np.testing.assert_array_equal(a.v, b.v)
    np.testing.assert_array_equal(a.fv, b.fv)

    out_p = tmp_path / "denoised.obj"
    main([
        "denoise-mesh", str(noisy_p), "-o", str(out_p),
        "--gt", str(clean_p), "--normal-iterations", "4",
    ])
    noisy_mesh_d = read_obj(str(noisy_p))
    out_d = read_obj(str(out_p))
    ea_noisy = float(mean_angular_error(
        TriMesh.from_numpy(noisy_mesh_d.v, noisy_mesh_d.fv), clean
    ))
    ea_out = float(mean_angular_error(
        TriMesh.from_numpy(out_d.v, out_d.fv), clean
    ))
    assert ea_out < 0.5 * ea_noisy

    capsys.readouterr()  # drop the denoise-mesh progress prints
    main(["eval", str(clean_p), str(out_p)])
    scored = json.loads(capsys.readouterr().out)
    assert scored["cd"] > 0


def test_cli_add_noise_point_cloud(tmp_path):
    """Point-cloud branch: impulse noise corrupts only a fraction of
    points (Noise.py:55-57 semantics)."""
    from ngpd_tpu.apps.cli import main

    pts, nrm = plane_grid(16)
    in_p = tmp_path / "cloud.xyz"
    out_p = tmp_path / "cloud_noisy.xyz"
    np.savetxt(in_p, np.concatenate([pts, nrm], axis=1), fmt="%.6f")
    main([
        "add-noise", str(in_p), "-o", str(out_p),
        "--level", "0.3", "--type", "impulse",
    ])
    from ngpd_tpu.io.xyz import load_xyz

    noisy = np.asarray(load_xyz(str(out_p)).points)
    moved = np.linalg.norm(noisy - pts, axis=1) > 1e-12
    assert 0 < moved.sum() < len(pts)
