"""PyTorch <-> Flax weight interop for the legacy DGCNN.

The reference trains the patch network in PyTorch and ships weights as
``.t7`` state dicts (saved at DenoisingGCN/train.py:132, loaded at
PatchGeneration/Modules/Network/NetworkController.py:44-52) and as
TorchScript ``script_model_*.pt`` exports (DenoisingGCN/modelTrans.py:6-26,
consumed by the C++ app at MeshViewer.cpp:787-798). A user switching to
ngpd_tpu brings those files along; this module maps them onto
:class:`ngpd_tpu.models.dgcnn.DGCNN` variables — and back, so checkpoints
trained here can flow into the reference's torch tooling.

Layer correspondence (DenoisingGCN/GCNModel.py:69-112):

========================  ===========================================
torch parameter           Flax variable
========================  ===========================================
conv{i}.0.weight          params/conv{i}/Dense_0/kernel   (i = 1..6,
  (C_out, C_in, 1, 1)       transposed to (C_in, C_out))
bn{i}.weight / .bias      params/conv{i}/BatchNorm_0/{scale,bias}
bn{i}.running_mean/var    batch_stats/conv{i}/BatchNorm_0/{mean,var}
conv7.0.weight (E,1024,1) params/conv7/kernel (1024, E)
bn7.*                     params/bn7 + batch_stats/bn7
linear1.weight (512,2E)   params/linear1/kernel (2E, 512)   [no bias]
bn8/9/10.*                params/bn8/9/10 + batch_stats
linear2/3/4.weight+bias   params/linear{2,3,4}/{kernel,bias}
========================  ===========================================

No torch import happens at module import time — everything heavy is
inside the functions, so the JAX-only paths stay torch-free.
"""

from __future__ import annotations

from pathlib import Path
from typing import Mapping, Union

import numpy as np

# The six edge-conv blocks share their BatchNorms between the attribute
# name (bn1..bn6) and the Sequential slot (conv{i}.1) in the torch
# model; either key names the same tensor.
_NUM_EDGE_CONVS = 6


def _np(x) -> np.ndarray:
    """torch tensor / array-like -> float32 numpy (no torch import)."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _get(sd: Mapping, *names: str) -> np.ndarray:
    for n in names:
        if n in sd:
            return _np(sd[n])
    raise KeyError(f"none of {names} in torch state dict")


def _bn_in(sd: Mapping, torch_name: str, alias: str = ""):
    """(scale, bias) params + (mean, var) stats of one torch BatchNorm."""
    names = (torch_name, alias) if alias else (torch_name,)
    return (
        {
            "scale": _get(sd, *(f"{n}.weight" for n in names)),
            "bias": _get(sd, *(f"{n}.bias" for n in names)),
        },
        {
            "mean": _get(sd, *(f"{n}.running_mean" for n in names)),
            "var": _get(sd, *(f"{n}.running_var" for n in names)),
        },
    )


def variables_from_torch_dgcnn(state_dict: Mapping) -> dict:
    """Torch DGCNN state dict -> ``{"params", "batch_stats"}`` for
    :class:`ngpd_tpu.models.dgcnn.DGCNN` (any emb_dims / output size —
    shapes are taken from the tensors)."""
    sd = state_dict
    params: dict = {}
    stats: dict = {}

    for i in range(1, _NUM_EDGE_CONVS + 1):
        w = _get(sd, f"conv{i}.0.weight")  # (C_out, C_in, 1, 1)
        bn_p, bn_s = _bn_in(sd, f"bn{i}", f"conv{i}.1")
        params[f"conv{i}"] = {
            "Dense_0": {"kernel": w[:, :, 0, 0].T},
            "BatchNorm_0": bn_p,
        }
        stats[f"conv{i}"] = {"BatchNorm_0": bn_s}

    w7 = _get(sd, "conv7.0.weight")  # (E, 1024, 1) Conv1d
    params["conv7"] = {"kernel": w7[:, :, 0].T}
    params["bn7"], stats["bn7"] = _bn_in(sd, "bn7", "conv7.1")

    params["linear1"] = {"kernel": _get(sd, "linear1.weight").T}
    params["bn8"], stats["bn8"] = _bn_in(sd, "bn8")
    for li in (2, 3, 4):
        params[f"linear{li}"] = {
            "kernel": _get(sd, f"linear{li}.weight").T,
            "bias": _get(sd, f"linear{li}.bias"),
        }
        if li < 4:
            params[f"bn{li + 7}"], stats[f"bn{li + 7}"] = _bn_in(
                sd, f"bn{li + 7}"
            )

    to_f32 = lambda tree: {  # noqa: E731
        k: to_f32(v) if isinstance(v, dict) else np.asarray(v, np.float32)
        for k, v in tree.items()
    }
    return {"params": to_f32(params), "batch_stats": to_f32(stats)}


def _bn_out(sd: dict, torch_name: str, bn_p: Mapping, bn_s: Mapping, n: int):
    sd[f"{torch_name}.weight"] = np.asarray(bn_p["scale"], np.float32)
    sd[f"{torch_name}.bias"] = np.asarray(bn_p["bias"], np.float32)
    sd[f"{torch_name}.running_mean"] = np.asarray(bn_s["mean"], np.float32)
    sd[f"{torch_name}.running_var"] = np.asarray(bn_s["var"], np.float32)
    sd[f"{torch_name}.num_batches_tracked"] = np.asarray(n, np.int64)


def torch_state_dict_from_variables(variables: Mapping) -> dict:
    """Flax DGCNN variables -> torch-style state dict (numpy values,
    including the ``conv{i}.1`` BatchNorm aliases and
    ``num_batches_tracked`` so a strict ``load_state_dict`` succeeds
    after ``torch.as_tensor`` conversion)."""
    params = variables["params"]
    stats = variables["batch_stats"]
    sd: dict = {}

    for i in range(1, _NUM_EDGE_CONVS + 1):
        k = np.asarray(params[f"conv{i}"]["Dense_0"]["kernel"], np.float32)
        sd[f"conv{i}.0.weight"] = k.T[:, :, None, None]
        bn_p = params[f"conv{i}"]["BatchNorm_0"]
        bn_s = stats[f"conv{i}"]["BatchNorm_0"]
        _bn_out(sd, f"bn{i}", bn_p, bn_s, 0)
        _bn_out(sd, f"conv{i}.1", bn_p, bn_s, 0)

    k7 = np.asarray(params["conv7"]["kernel"], np.float32)
    sd["conv7.0.weight"] = k7.T[:, :, None]
    _bn_out(sd, "bn7", params["bn7"], stats["bn7"], 0)
    _bn_out(sd, "conv7.1", params["bn7"], stats["bn7"], 0)

    sd["linear1.weight"] = np.asarray(
        params["linear1"]["kernel"], np.float32
    ).T
    _bn_out(sd, "bn8", params["bn8"], stats["bn8"], 0)
    for li in (2, 3, 4):
        sd[f"linear{li}.weight"] = np.asarray(
            params[f"linear{li}"]["kernel"], np.float32
        ).T
        sd[f"linear{li}.bias"] = np.asarray(
            params[f"linear{li}"]["bias"], np.float32
        )
        if li < 4:
            _bn_out(
                sd,
                f"bn{li + 7}",
                params[f"bn{li + 7}"],
                stats[f"bn{li + 7}"],
                0,
            )
    return sd


def load_torch_checkpoint(path: Union[str, Path]) -> dict:
    """Load a reference checkpoint file into a plain state dict.

    Handles both formats the reference produces: ``.t7`` pickled state
    dicts (DenoisingGCN/train.py:132) and TorchScript ``.pt`` modules
    (modelTrans.py:6-26).
    """
    import os

    import torch

    path = str(path)
    try:
        # Safe loader first: tensors only, no pickled code execution.
        sd = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        try:
            # TorchScript archives (modelTrans.py exports) are zip
            # containers the safe loader rejects; jit.load reads only
            # the serialized graph + tensors.
            sd = torch.jit.load(path, map_location="cpu").state_dict()
        except Exception:
            # Last resort is full unpickling, which EXECUTES code
            # embedded in the checkpoint — these are exactly the
            # third-party .t7/.pt files this module ingests, so it is
            # opt-in only.
            if not os.environ.get("NGPD_UNSAFE_TORCH_LOAD"):
                raise RuntimeError(
                    f"{path} is neither a weights-only checkpoint nor a "
                    "TorchScript archive. Loading it requires full "
                    "unpickling, which executes arbitrary code from the "
                    "file; set NGPD_UNSAFE_TORCH_LOAD=1 only if you "
                    "trust its origin."
                )
            sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):  # a full module was pickled
        sd = sd.state_dict()
    return dict(sd)


def load_dgcnn_from_torch(path: Union[str, Path]) -> dict:
    """Checkpoint file -> Flax DGCNN variables, one call."""
    return variables_from_torch_dgcnn(load_torch_checkpoint(path))
