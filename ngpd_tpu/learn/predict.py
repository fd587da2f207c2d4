"""Learned normal prediction over whole clouds.

Manager.predict equivalent (Manager.py:145-158): extract MD patches,
run the Patch2Normal model, L2-normalize, and rotate predictions back
to world frame. The reference calls a non-existent
``alignor.applyRInv`` (drift, Manager.py:157); the working operation —
used by the legacy pipeline at NetworkController.py:257 — is
``n_world = y_patch @ R_inv^T``, the inverse of the patch rotation
``y = gt_n @ R_inv`` (Processor.py:80).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..config import PatchConfig
from ..core.normals import orient_normals, pvt_normals
from ..core.patches import extract_patches
from ..ops.knn import knn
from .train import TrainState, make_predict_step


def predict_cloud_normals(
    model,
    state: TrainState,
    points: jnp.ndarray,
    normals: Optional[jnp.ndarray] = None,
    patch_cfg: PatchConfig = PatchConfig(),
    batch_size: int = 1024,
) -> jnp.ndarray:
    """Per-point world-frame normals for a (noisy) cloud."""
    if normals is None:
        nbh, _ = knn(points, 12, exclude_self=True)
        normals = orient_normals(points, pvt_normals(points, nbh), nbh)
    patches = extract_patches(points, normals, cfg=patch_cfg)
    step = make_predict_step(model)

    outs = []
    n = points.shape[0]
    for s in range(0, n, batch_size):
        e = min(s + batch_size, n)
        batch = {
            "x": patches.x[s:e],
            "nbr_idx": patches.nbr_idx[s:e],
            "nbr_mask": patches.nbr_mask[s:e],
            "node_mask": patches.node_mask[s:e],
        }
        outs.append(step(state, batch))
    pred = jnp.concatenate(outs, axis=0)  # (N, 3) in patch frames
    # Un-rotate: world = pred @ R_inv^T per point.
    return jnp.einsum("ni,nji->nj", pred, patches.r_inv)
