"""``.h5`` path-list interop — reading the reference's shipped fixture
and round-tripping the DatasetManager formats (datautils.py:93-138,
DataUtils.py:145-307, train.py:32-61)."""

import numpy as np
import pytest

pytest.importorskip("h5py")

from ngpd_tpu.io.h5paths import (  # noqa: E402
    load_patch_batch,
    load_path_list,
    load_split,
    make_split,
    save_path_list,
    save_split,
    scan_mat_folders,
    split_paths,
    split_paths_by_val_index,
)
from ngpd_tpu.io.matpatch import save_mat_patch  # noqa: E402

REF_H5 = "/root/reference/DenoisingGCN/testsamples/TestDataPath.h5"


def test_reads_reference_testdatapath():
    paths = load_path_list(REF_H5)
    assert paths.shape == (11946,)
    assert paths[0] == "./testsamples/test_fandisk/0_0.mat"
    assert all(p.endswith(".mat") for p in paths[:100])


def test_path_list_roundtrip(tmp_path):
    paths = [f"./data/model_{i}/{i}_{j}.mat" for i in range(3) for j in range(4)]
    target = tmp_path / "dataPath.h5"
    save_path_list(target, paths)
    loaded = load_path_list(target)
    assert list(loaded) == paths
    # No-overwrite guard (DataUtils.py:201-202).
    with pytest.raises(FileExistsError):
        save_path_list(target, paths)
    save_path_list(target, paths[:2], overwrite=True)
    assert len(load_path_list(target)) == 2


def _make_mat_folder(root, name, n, with_nor=True, prefix=""):
    folder = root / name
    folder.mkdir(parents=True)
    rng = np.random.default_rng(hash(name) % 2**32)
    for i in range(n):
        adj = np.zeros((6, 6), np.float64)
        for a in range(6):
            for b in ((a + 1) % 6, (a + 2) % 6):
                adj[a, b] = adj[b, a] = 1
        nrm = rng.normal(size=3)
        nrm /= np.linalg.norm(nrm)
        save_mat_patch(
            folder / f"{prefix}{i}_0.mat",
            adj,
            rng.normal(size=(6, 17)).astype(np.float32),
            nrm,
            center_norm=nrm if with_nor else None,
        )
    return folder


def test_scan_and_batch(tmp_path):
    _make_mat_folder(tmp_path, "cube", 5)
    _make_mat_folder(tmp_path, "star", 4)
    paths = scan_mat_folders([tmp_path / "cube", tmp_path / "star"])
    assert len(paths) == 9

    batch = load_patch_batch(paths[:4], num_nodes=16)
    assert batch["x"].shape == (4, 20, 16)
    assert batch["gt_norm"].shape == (4, 3)
    assert batch["center_norm"].shape == (4, 3)
    np.testing.assert_allclose(
        np.linalg.norm(batch["gt_norm"], axis=1), 1.0, atol=1e-5
    )


def test_scan_skip_prefix_and_cap(tmp_path):
    """The '9'-prefix held-out convention (datautils.py:102-103) and
    maxFilesPerFolder subsampling (DataUtils.py:189-191)."""
    folder = _make_mat_folder(tmp_path, "m", 6)
    # add two files that start with '9'
    rng = np.random.default_rng(0)
    for i in range(2):
        save_mat_patch(
            folder / f"9{i}_0.mat",
            np.eye(4),
            rng.normal(size=(4, 17)).astype(np.float32),
            np.array([0.0, 0.0, 1.0]),
        )
    assert len(scan_mat_folders([folder])) == 8
    assert len(scan_mat_folders([folder], skip_prefixes=("9",))) == 6
    assert len(scan_mat_folders([folder], max_files_per_folder=3)) == 3


def test_split_roundtrip(tmp_path):
    split = make_split(1000, val_fraction=0.25, batch_size=100, seed=1)
    assert split[0] == 1000 and len(split) == 1 + 200
    p = tmp_path / "split.npy"
    save_split(p, split)
    loaded = load_split(p, num_data=1000)
    np.testing.assert_array_equal(loaded, split)
    with pytest.raises(ValueError):
        load_split(p, num_data=999)

    paths = np.array([f"x{i}.mat" for i in range(1000)])
    train, val = split_paths(paths, split)
    assert len(train) == 800 and len(val) == 200
    assert set(train) | set(val) == set(paths)
    assert not set(train) & set(val)


def test_val_index_convention():
    paths = np.array([f"x{i}.mat" for i in range(10)])
    train, val = split_paths_by_val_index(paths, np.array([1, 3, 5]))
    assert list(val) == ["x1.mat", "x3.mat", "x5.mat"]
    assert len(train) == 7
