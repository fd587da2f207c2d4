"""Serialized model export for external consumption.

The reference freezes its trained DGCNN with TorchScript so the C++
application can run it without Python (DenoisingGCN/modelTrans.py:6-26;
consumed at MeshViewer.cpp:787-798). The TPU-native equivalent is
``jax.export``: the jitted predict step is lowered to StableHLO and
serialized to a self-contained byte blob that any StableHLO consumer
(a later JAX process, IREE, PJRT C API embedders) can load and run
without the model's Python class or weights files — parameters are
baked in as constants, exactly like TorchScript's frozen buffers.

``export_predict`` / ``load_exported`` round-trip is smoke-tested the
same way modelTrans.py compares scripted vs eager outputs.
"""

from __future__ import annotations

from pathlib import Path
from typing import Union

import jax
import jax.numpy as jnp
from jax import export as jax_export


def export_predict(model, state, example_batch: dict) -> bytes:
    """Freeze the L2-normalized predict step into a StableHLO blob.

    ``example_batch`` needs the predict keys (x, nbr_idx, nbr_mask,
    node_mask); only shapes/dtypes matter. Weights are captured as
    constants, so the blob is standalone.
    """
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    def predict(x, nbr_idx, nbr_mask, node_mask):
        out = model.apply(variables, x, nbr_idx, nbr_mask, node_mask, train=False)
        return out / jnp.maximum(jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12)

    args = tuple(
        jax.ShapeDtypeStruct(example_batch[k].shape, example_batch[k].dtype)
        for k in ("x", "nbr_idx", "nbr_mask", "node_mask")
    )
    exported = jax_export.export(jax.jit(predict))(*args)
    return bytes(exported.serialize())


def save_exported(path: Union[str, Path], blob: bytes) -> None:
    Path(path).write_bytes(blob)


def load_exported(source: Union[str, Path, bytes]):
    """Rehydrate an exported predict step into a callable.

    Accepts the blob itself or a path to one (the ``script_model.pt``
    loading of MeshViewer.cpp:787-798, minus the GUI).
    """
    blob = source if isinstance(source, (bytes, bytearray)) else Path(source).read_bytes()
    exported = jax_export.deserialize(bytearray(blob))

    def predict(x, nbr_idx, nbr_mask, node_mask):
        return exported.call(x, nbr_idx, nbr_mask, node_mask)

    return predict
