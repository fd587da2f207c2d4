"""Flat-npz weight archives for the Flax models.

A minimal, dependency-free way to ship trained weights inside the repo
(the role of the reference's ``.t7`` files, DenoisingGCN/train.py:132):
a flat npz whose keys are ``params/...`` / ``batch_stats/...`` paths
with ``/`` separators, as written by examples/train_mesh_gcn.py.
"""

from __future__ import annotations

from pathlib import Path
from typing import Mapping, Union

import numpy as np


def flatten_variables(variables: Mapping) -> dict:
    """Nested variables -> flat {path: array} with '/'-joined keys."""
    flat: dict = {}

    def walk(tree, prefix):
        for k, v in tree.items():
            key = f"{prefix}/{k}" if prefix else str(k)
            if isinstance(v, Mapping):
                walk(v, key)
            else:
                flat[key] = np.asarray(v)

    walk(variables, "")
    return flat


def unflatten_variables(flat: Mapping) -> dict:
    out: dict = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(value)
    return out


def save_variables_npz(path: Union[str, Path], variables: Mapping) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(str(path), **flatten_variables(variables))


def load_dgcnn_npz(path: Union[str, Path]) -> dict:
    """npz archive -> {"params", "batch_stats"} ready for model.apply."""
    with np.load(str(path)) as data:
        flat = {k: data[k] for k in data.files}
    tree = unflatten_variables(flat)
    if "batch_stats" not in tree:
        tree["batch_stats"] = {}
    return tree
