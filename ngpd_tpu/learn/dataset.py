"""Patch dataset generation and loading.

Rebuilds FileDataset/SimpleDataset (FileDataset.py:29-282): for every
raw object x noise level (gaussian + impulsive, Config.py:33-34) the
pipeline loads/samples the cloud, estimates and orients normals (the
ground truth), corrupts it, re-estimates normals on the noisy cloud, and
extracts MD patches; shards are stored as .npz (the torch .pt
equivalent). Splits are a persisted random permutation with fractions
SPLIT=(0.6, 0.2, 0.2) (FileDataset.py:88-126).

Resolved reference drift: the reference's process() calls
generateNoise(level, 0, 0) making the noise stdev zero
(FileDataset.py:262-267 vs Noise.py:33,52) — here the mean edge length
is computed and passed, which is the evidently-intended behavior.

FileDataset's feature balancing (FileDataset.py:157-209): patches whose
center is an MD feature point (md_features != 1) are kept, and
non-feature patches are subsampled to ratio * num_feature
(ratio 1.5, FileDataset.py:173-182).
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Iterator, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PatchConfig, TrainConfig
from ..core import noise as noise_mod
from ..core.normals import orient_normals, pvt_normals
from ..core.patches import extract_patches, md_selection
from ..core import voting
from ..io.obj import load_obj
from ..io.sampling import sample_mesh
from ..io.obj import read_obj
from ..ops import metrics
from ..ops.knn import knn


def _estimate_normals(points: jnp.ndarray, k: int = 12):
    nbh, _ = knn(points, k, exclude_self=True)
    return orient_normals(points, pvt_normals(points, nbh), nbh)


def process_cloud(
    points: jnp.ndarray,
    key: jax.Array,
    noise_level: float,
    noise_type: int,
    patch_cfg: PatchConfig = PatchConfig(),
    balance_ratio: Optional[float] = None,
    balance_seed: int = 0,
):
    """Cloud -> dict of numpy patch arrays (one patch per kept point).

    Mirrors SimpleDataset.process for one (object, level) pair
    (FileDataset.py:250-269): GT normals -> noise -> re-estimated
    normals -> patches; optional feature balancing (FileDataset variant).
    """
    gt_n = _estimate_normals(points)
    nbh6, _ = knn(points, 6)
    mel = metrics.average_edge_length(points, nbh6)
    noisy = noise_mod.generate_noise(
        key, points, gt_n, noise_level, mel, noise_type=noise_type
    )
    noisy_n = _estimate_normals(noisy)
    batch = extract_patches(noisy, noisy_n, gt_normals=gt_n, cfg=patch_cfg)

    keep = np.arange(points.shape[0])
    if balance_ratio is not None:
        # MD classes of the noisy cloud (Decompositionor.getMDFeatures).
        nbh, mass, _ = md_selection(noisy, patch_cfg)
        dec, _ = voting.md_transformation(noisy, nbh, noisy_n, mass)
        md = np.asarray(voting.md_features(dec))
        feature_idx = np.where(md != 1)[0]
        flat_idx = np.where(md == 1)[0]
        rng = np.random.default_rng(balance_seed)
        n_keep = min(len(flat_idx), int(balance_ratio * max(len(feature_idx), 1)))
        kept_flat = rng.permutation(flat_idx)[:n_keep]
        keep = np.concatenate([feature_idx, kept_flat])
        keep.sort()

    return {
        "x": np.asarray(batch.x)[keep],
        "nbr_idx": np.asarray(batch.nbr_idx)[keep],
        "nbr_mask": np.asarray(batch.nbr_mask)[keep],
        "node_mask": np.asarray(batch.node_mask)[keep],
        "y": np.asarray(batch.y)[keep],
        "r_inv": np.asarray(batch.r_inv)[keep],
    }


def load_raw(path: str | Path, sample_points: Optional[int] = None):
    """Load a raw .obj as points; optionally surface-sample it
    (Manager.addPointcloud, Manager.py:160-166)."""
    path = Path(path)
    if sample_points is not None:
        data = read_obj(path)
        if data.fv.shape[0] > 0:
            return jnp.asarray(
                sample_mesh(data.v, data.fv, sample_points).points
            )
    return load_obj(path).points


def generate_dataset(
    raw_paths: Sequence[str | Path],
    out_dir: str | Path,
    train_cfg: TrainConfig = TrainConfig(),
    patch_cfg: PatchConfig = PatchConfig(),
    sample_points: Optional[int] = None,
    balance: bool = True,
) -> dict:
    """All objects x all noise levels -> .npz shards + split manifest."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    key = jax.random.PRNGKey(train_cfg.seed)
    shards = []
    levels = [(lv, noise_mod.GAUSSIAN) for lv in train_cfg.gaussian_noise_levels]
    levels += [(lv, noise_mod.IMPULSIVE) for lv in train_cfg.impulsive_noise_levels]
    for path in raw_paths:
        pts = load_raw(path, sample_points)
        for level, ntype in levels:
            key, sub = jax.random.split(key)
            data = process_cloud(
                pts, sub, level, ntype, patch_cfg,
                balance_ratio=train_cfg.balance_ratio if balance else None,
                balance_seed=train_cfg.seed,
            )
            name = f"{Path(path).stem}_t{ntype}_l{level}.npz"
            np.savez_compressed(out / name, **data)
            shards.append({"file": name, "count": int(len(data["y"]))})

    # Persisted split over shards (FileDataset.py:88-126 persists a
    # .split file; shard granularity here).
    rng = np.random.default_rng(train_cfg.seed)
    perm = rng.permutation(len(shards)).tolist()
    n = len(shards)
    n_train = int(train_cfg.split[0] * n)
    n_val = int(train_cfg.split[1] * n)
    manifest = {
        "shards": shards,
        "perm": perm,
        "train": perm[:n_train],
        "val": perm[n_train : n_train + n_val],
        "test": perm[n_train + n_val :],
    }
    (out / "manifest.json").write_text(json.dumps(manifest, indent=1))
    return manifest


@jax.jit
def _tree_take(data, idx):
    """One compiled gather for a whole batch dict. Eager per-field
    ``jnp.take`` calls would each compile a separate program — several
    minutes apiece through a remote TPU compiler."""
    return jax.tree_util.tree_map(lambda v: jnp.take(v, idx, axis=0), data)


class PatchDataset:
    """Batch iterator over generated shards (the DataLoader equivalent,
    Manager.py:74-86 — no worker processes needed: batches are dense
    arrays and the device pipeline is jitted)."""

    def __init__(self, root: str | Path, split: str = "train"):
        self.root = Path(root)
        manifest = json.loads((self.root / "manifest.json").read_text())
        self.files = [
            self.root / manifest["shards"][i]["file"] for i in manifest[split]
        ]
        arrays = [np.load(f) for f in self.files]
        keys = ["x", "nbr_idx", "nbr_mask", "node_mask", "y", "r_inv"]
        if arrays:
            self.data = {
                k: np.concatenate([a[k] for a in arrays]) for k in keys
            }
        else:
            self.data = {k: np.zeros((0,)) for k in keys}

    def __len__(self):
        return len(self.data["y"])

    # Below this size the whole split is staged in device memory once
    # and batches become on-device gathers. Per-batch host->device
    # transfers cost ~30 ms each through a remote TPU tunnel — an order
    # of magnitude more than the train step itself.
    DEVICE_STAGE_BYTES = int(os.environ.get("NGPD_STAGE_BYTES", 2 << 30))

    def _staged(self):
        if getattr(self, "_dev", None) is None:
            total = sum(
                v.nbytes for k, v in self.data.items() if k != "r_inv"
            )
            if total <= self.DEVICE_STAGE_BYTES:
                self._dev = {
                    k: jnp.asarray(v)
                    for k, v in self.data.items()
                    if k != "r_inv"
                }
            else:
                self._dev = False
        return self._dev

    def batches(
        self, batch_size: int, seed: int = 0, drop_remainder: bool = True
    ) -> Iterator[dict]:
        n = len(self)
        order = np.random.default_rng(seed).permutation(n)
        stop = (n // batch_size) * batch_size if drop_remainder else n
        dev = self._staged()
        for s in range(0, stop, batch_size):
            sel = order[s : s + batch_size]
            if dev:
                yield _tree_take(dev, jnp.asarray(sel))
            else:
                yield {
                    k: jnp.asarray(v[sel])
                    for k, v in self.data.items()
                    if k != "r_inv"
                }
