"""PatchCollector / NoiseGenerator archive workflow
(PatchCollector.py:55-190): folder conventions, clean-twin lookup,
per-face .mat archives, npz shards, end-to-end dataset build."""

import numpy as np
import pytest

from ngpd_tpu.config import PatchConfig
from ngpd_tpu.io.matpatch import load_mat_patch
from ngpd_tpu.io.obj import read_obj, save_obj
from ngpd_tpu.meshproc.collector import (
    build_mesh_dataset,
    clean_twin_path,
    collect_patch_shard,
    collect_patches,
    generate_noisy_meshes,
    load_mesh,
    save_patch_archive,
)

CFG = PatchConfig(num_nodes=16)


def _grid_mesh(n: int = 8, seed: int = 0):
    """Triangulated height-field plane: (n*n) vertices, 2(n-1)^2 faces."""
    rng = np.random.default_rng(seed)
    xs, ys = np.meshgrid(np.arange(n, dtype=np.float32), np.arange(n, dtype=np.float32))
    z = 0.1 * rng.normal(size=(n, n)).astype(np.float32)
    v = np.stack([xs.ravel(), ys.ravel(), z.ravel()], axis=1)
    f = []
    for i in range(n - 1):
        for j in range(n - 1):
            a, b, c, d = i * n + j, i * n + j + 1, (i + 1) * n + j, (i + 1) * n + j + 1
            f.append([a, b, c])
            f.append([b, d, c])
    return v, np.asarray(f, np.int32)


@pytest.fixture()
def clean_obj(tmp_path):
    v, f = _grid_mesh()
    p = tmp_path / "plane.obj"
    save_obj(str(p), v, faces=f)
    return p


def test_noise_generation_and_twin_lookup(clean_obj):
    paths = generate_noisy_meshes(clean_obj, levels=[0.1, 0.3])
    assert [p.split("/")[-1] for p in paths] == ["plane_1.obj", "plane_3.obj"]
    for p in paths:
        assert clean_twin_path(p) == clean_obj
        noisy = read_obj(p)
        clean = read_obj(str(clean_obj))
        assert noisy.v.shape == clean.v.shape
        np.testing.assert_array_equal(noisy.fv, clean.fv)
        assert not np.allclose(noisy.v, clean.v)
    # heavier level moves vertices further
    d = [
        np.linalg.norm(read_obj(p).v - read_obj(str(clean_obj)).v, axis=1).mean()
        for p in paths
    ]
    assert d[1] > d[0]


def test_collect_patches_uses_clean_gt(clean_obj):
    noisy_p = generate_noisy_meshes(clean_obj, levels=[0.2])[0]
    batch = collect_patches(noisy_p, cfg=CFG)  # twin by convention
    nf = load_mesh(noisy_p).num_faces
    assert batch.inputs.shape == (nf, 20, CFG.num_nodes)
    assert batch.y.shape == (nf, 3)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(batch.y), axis=1), 1.0, atol=1e-4
    )
    # GT from the clean twin: rotating back must reproduce clean normals.
    clean = load_mesh(str(clean_obj))
    gt_n, _, _ = clean.face_data()
    back = np.einsum(
        "fji,fj->fi", np.asarray(batch.rotations), np.asarray(batch.y)
    )
    np.testing.assert_allclose(back, np.asarray(gt_n), atol=1e-4)


def test_mat_archive_roundtrip(clean_obj, tmp_path):
    noisy_p = generate_noisy_meshes(clean_obj, levels=[0.2])[0]
    batch = collect_patches(noisy_p, cfg=CFG)
    idx = np.array([0, 5, 9])
    paths = save_patch_archive(noisy_p, batch, face_indices=idx)
    assert [p.split("/")[-1] for p in paths] == [
        "plane_2_0.mat",
        "plane_2_5.mat",
        "plane_2_9.mat",
    ]
    for p, i in zip(paths, idx):
        loaded = load_mat_patch(p, num_nodes=CFG.num_nodes)
        x_ref = np.asarray(batch.inputs[i])
        # feature rows survive exactly
        np.testing.assert_allclose(
            loaded["x"][0:17], x_ref[0:17], atol=1e-6
        )
        np.testing.assert_allclose(
            loaded["gt_norm"], np.asarray(batch.y[i]), atol=1e-6
        )
        np.testing.assert_allclose(
            loaded["rotation"], np.asarray(batch.rotations[i]), atol=1e-6
        )
        # neighbor triplets point at adjacent rows (orders may differ
        # between the padding rules and the adjacency reconstruction)
        trip = loaded["x"][17:20].T.astype(int)
        assert trip.min() >= 0 and trip.max() < CFG.num_nodes


def test_shard_and_dataset_build(clean_obj, tmp_path):
    noisy_p = generate_noisy_meshes(clean_obj, levels=[0.2])[0]
    shard = collect_patch_shard(
        noisy_p, tmp_path / "shards" / "plane_2.npz", max_patches=20, cfg=CFG
    )
    data = np.load(shard)
    assert data["x"].shape == (20, 20, CFG.num_nodes)
    assert data["y"].shape == (20, 3)
    assert data["rot"].shape == (20, 3, 3)
    assert len(np.unique(data["face_index"])) == 20

    shards = build_mesh_dataset(
        [clean_obj],
        tmp_path / "ds",
        levels=[0.1, 0.3],
        max_patches_per_mesh=10,
        cfg=CFG,
    )
    assert len(shards) == 2
    for s in shards:
        d = np.load(s)
        assert d["x"].shape[0] == 10


def test_crease_mask_and_boosted_sampling(tmp_path):
    """crease_face_mask flags exactly the faces at a sharp dihedral, and
    crease_boost oversamples them when max_patches binds."""
    from ngpd_tpu.meshproc.collector import crease_face_mask
    from ngpd_tpu.meshproc.synthetic import box, icosphere

    # A box is all creases at its 12 edges; a subdivided sphere has none.
    assert crease_face_mask(icosphere(subdiv=2)).sum() == 0
    bx = box(n=6)
    mask = crease_face_mask(bx)
    assert 0 < mask.sum() < bx.f.shape[0]  # edges flagged, interiors not

    clean_p = tmp_path / "box.obj"
    save_obj(str(clean_p), np.asarray(bx.v), faces=np.asarray(bx.f))
    noisy_p = generate_noisy_meshes(clean_p, levels=[0.2])[0]

    def crease_fraction(boost):
        shard = collect_patch_shard(
            noisy_p, tmp_path / f"b{boost}.npz", gt_path=clean_p,
            max_patches=80, cfg=CFG, seed=0, crease_boost=boost,
        )
        idx = np.load(shard)["face_index"]
        return mask[idx].mean()

    base, boosted = crease_fraction(0.0), crease_fraction(4.0)
    assert boosted > base * 1.5, (base, boosted)
