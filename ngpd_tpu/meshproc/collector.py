"""Bulk patch-archive generation — the PatchCollector / NoiseGenerator
dataset workflow.

The reference builds its GCN training data per mesh with a strict folder
convention (PatchGeneration/Modules/PatchCollector.py):

* noisy copies of ``{dir}/{name}.obj`` live at
  ``{dir}/Noise/{name}_{level*10}.obj`` (NoiseGenerator,
  PatchCollector.py:168-190);
* the clean twin of a noisy mesh is found by walking one directory up
  and stripping the last ``_suffix`` (``getGT``, PatchCollector.py:79-90);
* per-face patch files are written to
  ``{dir}/Noise/Patches/{name}_{lvl}_{faceidx}.mat``
  (``savePatches``, PatchCollector.py:94-106).

Here patch construction is one batched ``extract_mesh_patches`` call
per mesh (instead of a per-face Python loop with a timeout,
PatchCollector.py:135-158), with two storage backends: the faithful
per-face ``.mat`` archive (readable by the reference's tools) and a
single ``.npz`` shard per mesh — the fast path the trainer consumes.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence, Union

import jax
import numpy as np

from ..config import PatchConfig
from ..io.matpatch import save_mat_patch
from ..io.obj import read_obj, save_obj
from .patches import MeshPatchBatch, extract_mesh_patches
from .trimesh import TriMesh, add_mesh_noise

PathLike = Union[str, Path]

NOISE_DIR = "Noise"
PATCH_DIR = "Patches"


def load_mesh(path: PathLike) -> TriMesh:
    data = read_obj(str(path))
    if data.fv is None or len(data.fv) == 0:
        raise ValueError(f"{path} has no faces — not a mesh")
    return TriMesh.from_numpy(data.v, data.fv)


def generate_noisy_meshes(
    clean_path: PathLike,
    levels: Sequence[float],
    noise_type: int = 0,
    direction: int = 0,
    seed: int = 0,
) -> list:
    """Write ``{dir}/Noise/{name}_{int(level*10)}.obj`` for each level
    (NoiseGenerator.saveNoisyMeshes, PatchCollector.py:173-183).
    Returns the written paths."""
    clean_path = Path(clean_path)
    mesh = load_mesh(clean_path)
    noise_dir = clean_path.parent / NOISE_DIR
    noise_dir.mkdir(parents=True, exist_ok=True)

    out = []
    key = jax.random.PRNGKey(seed)
    for level in levels:
        key, sub = jax.random.split(key)
        noisy = add_mesh_noise(
            mesh, sub, float(level), noise_type=noise_type,
            direction=direction,
        )
        target = noise_dir / f"{clean_path.stem}_{int(level * 10)}.obj"
        save_obj(
            str(target), np.asarray(noisy.v), faces=np.asarray(noisy.f)
        )
        out.append(str(target))
    return out


def clean_twin_path(noisy_path: PathLike) -> Path:
    """``{dir}/Noise/{name}_{lvl}.obj`` -> ``{dir}/{name}.obj``
    (PatchCollector.getGT, PatchCollector.py:82-90)."""
    noisy_path = Path(noisy_path)
    stem = noisy_path.stem
    if "_" not in stem:
        raise ValueError(
            f"noisy mesh name carries no _level suffix: {noisy_path}"
        )
    return noisy_path.parent.parent / (stem[: stem.rfind("_")] + ".obj")


def collect_patches(
    noisy_path: PathLike,
    gt_path: Optional[PathLike] = None,
    cfg: PatchConfig = PatchConfig(),
    bucketed: bool = False,
) -> MeshPatchBatch:
    """Patches for every face of a noisy mesh, GT normals from the clean
    twin (setGT, PatchCollector.py:69-77; twin located by convention
    when ``gt_path`` is omitted). ``bucketed`` extracts on the padded
    mesh (meshproc.bucketing) so same-bucket meshes share one compiled
    program; outputs are cropped back to the real faces."""
    import jax.numpy as jnp

    noisy = load_mesh(noisy_path)
    gt_path = Path(gt_path) if gt_path is not None else clean_twin_path(noisy_path)
    gt = load_mesh(gt_path)
    if gt.num_faces != noisy.num_faces:
        raise ValueError(
            f"clean twin {gt_path} has {gt.num_faces} faces, noisy mesh "
            f"{noisy.num_faces} — not the same topology"
        )
    gt_normals, _, _ = gt.face_data()
    if not bucketed:
        return extract_mesh_patches(noisy, gt_normals=gt_normals, cfg=cfg)

    from .bucketing import pad_mesh

    padded = pad_mesh(noisy)
    own, _, _ = padded.mesh.face_data()
    gt_pad = own.at[: padded.num_faces].set(gt_normals)
    batch = extract_mesh_patches(padded.mesh, gt_normals=gt_pad, cfg=cfg)
    nf = padded.num_faces
    return MeshPatchBatch(
        inputs=batch.inputs[:nf],
        rotations=batch.rotations[:nf],
        y=batch.y[:nf],
        node_mask=batch.node_mask[:nf],
    )


def _mat_arrays(batch: MeshPatchBatch, i: int):
    """One patch of a batch -> (adjacency, features) for save_mat_patch."""
    x = np.asarray(batch.inputs[i])  # (20, P)
    p = x.shape[1]
    feats = x[0:17].T  # (P, 17)
    trip = x[17:20].T.astype(np.int64)  # (P, 3) local indices
    adj = np.zeros((p, p), np.float64)
    rows = np.arange(p)
    for c in range(3):
        tgt = trip[:, c]
        real = tgt != rows  # self-padding encodes "no neighbor"
        adj[rows[real], tgt[real]] = 1.0
        adj[tgt[real], rows[real]] = 1.0
    return adj, feats


def save_patch_archive(
    noisy_path: PathLike,
    batch: MeshPatchBatch,
    face_indices: Optional[np.ndarray] = None,
    out_dir: Optional[PathLike] = None,
) -> list:
    """Per-face ``.mat`` files ``{Patches}/{name}_{faceidx}.mat``
    (savePatches, PatchCollector.py:94-106) with {MAT, FEA, GT, ROT}.
    Subsample with ``face_indices``; returns the written paths."""
    noisy_path = Path(noisy_path)
    out_dir = (
        Path(out_dir)
        if out_dir is not None
        else noisy_path.parent / PATCH_DIR
    )
    out_dir.mkdir(parents=True, exist_ok=True)
    if face_indices is None:
        face_indices = np.arange(batch.inputs.shape[0])

    paths = []
    y = np.asarray(batch.y)
    rot = np.asarray(batch.rotations)
    for i in np.asarray(face_indices):
        adj, feats = _mat_arrays(batch, int(i))
        target = out_dir / f"{noisy_path.stem}_{int(i)}.mat"
        save_mat_patch(target, adj, feats, y[i], rotation=rot[i])
        paths.append(str(target))
    return paths


def crease_face_mask(mesh, angle_deg: float = 30.0) -> np.ndarray:
    """Faces adjacent to a dihedral sharper than ``angle_deg`` — the
    crease set whose normals dominate the golden-mesh residual
    (docs/GOLDEN.md error anatomy)."""
    f = np.asarray(mesh.f)
    n, _, _ = mesh.face_data()
    n = np.asarray(n)
    e = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
    e.sort(axis=1)
    owner = np.tile(np.arange(len(f)), 3)
    order = np.lexsort((e[:, 1], e[:, 0]))
    es, ow = e[order], owner[order]
    pair = np.all(es[:-1] == es[1:], axis=1)
    a, b = ow[:-1][pair], ow[1:][pair]
    sharp = np.sum(n[a] * n[b], axis=1) < np.cos(np.radians(angle_deg))
    mask = np.zeros(len(f), bool)
    mask[a[sharp]] = True
    mask[b[sharp]] = True
    return mask


def collect_patch_shard(
    noisy_path: PathLike,
    out_npz: PathLike,
    gt_path: Optional[PathLike] = None,
    max_patches: int = -1,
    cfg: PatchConfig = PatchConfig(),
    seed: int = 0,
    bucketed: bool = False,
    crease_boost: float = 0.0,
) -> str:
    """The fast archive: every (subsampled) patch of one mesh in a
    single ``.npz`` shard with x (B, 20, P) float32, y (B, 3), rot
    (B, 3, 3) — what the DGCNN trainer streams.

    ``crease_boost`` > 0 oversamples patches centered on CLEAN-mesh
    crease faces when ``max_patches`` binds: a crease face is weighted
    ``1 + crease_boost`` relative to a flat one (the FileDataset
    feature-balancing idea, FileDataset.py:173-182, applied to the mesh
    track's actual failure mode)."""
    batch = collect_patches(noisy_path, gt_path, cfg, bucketed=bucketed)
    nf = batch.inputs.shape[0]
    idx = np.arange(nf)
    if 0 <= max_patches < nf:
        rng = np.random.default_rng(seed)
        if crease_boost > 0.0 and gt_path is not None:
            gt_mesh = load_mesh(gt_path)
            w = np.ones(nf)
            mask = crease_face_mask(gt_mesh)[:nf]
            w[: len(mask)][mask] += crease_boost
            idx = rng.choice(
                nf, size=max_patches, replace=False, p=w / w.sum()
            )
        else:
            idx = rng.choice(nf, size=max_patches, replace=False)
        idx.sort()
    out_npz = Path(out_npz)
    out_npz.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        str(out_npz),
        x=np.asarray(batch.inputs, np.float32)[idx],
        y=np.asarray(batch.y, np.float32)[idx],
        rot=np.asarray(batch.rotations, np.float32)[idx],
        face_index=idx.astype(np.int32),
        source=str(noisy_path),
    )
    return str(out_npz)


def build_mesh_dataset(
    clean_meshes: Sequence[PathLike],
    out_dir: PathLike,
    levels: Sequence[float] = (0.1, 0.2, 0.3),
    max_patches_per_mesh: int = -1,
    noise_type: int = 0,
    direction: int = 0,
    cfg: PatchConfig = PatchConfig(),
    seed: int = 0,
    noisy_meshes: Optional[Sequence[PathLike]] = None,
    crease_boost: float = 0.0,
) -> list:
    """End-to-end dataset build: noise generation + per-mesh shards.

    With ``noisy_meshes`` given (paths following the clean-twin
    convention or pre-paired positionally with ``clean_meshes``), the
    noise stage is skipped and patches come from those files. Returns
    the shard paths.
    """
    out_dir = Path(out_dir)
    shards = []
    if noisy_meshes is not None:
        pairs = list(zip(noisy_meshes, clean_meshes))
    else:
        pairs = []
        for m, clean in enumerate(clean_meshes):
            for p in generate_noisy_meshes(
                clean, levels, noise_type, direction, seed=seed + m
            ):
                pairs.append((p, clean))
    for s, (noisy_p, clean_p) in enumerate(pairs):
        name = Path(noisy_p).stem
        shards.append(
            collect_patch_shard(
                noisy_p,
                out_dir / f"{name}.npz",
                gt_path=clean_p,
                max_patches=max_patches_per_mesh,
                cfg=cfg,
                seed=seed + 1000 + s,
                crease_boost=crease_boost,
            )
        )
    return shards
