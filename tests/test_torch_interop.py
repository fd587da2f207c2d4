"""Torch <-> Flax DGCNN weight interop parity.

The reference trains/ships the patch network as torch ``.t7`` state
dicts and TorchScript exports (DenoisingGCN/train.py:132,
modelTrans.py:6-26). These tests load the REFERENCE'S OWN GCNModel.py
(read-only import, never copied) as the numeric oracle, convert its
randomly-initialized weights into our Flax DGCNN, and require the two
forwards to agree within float32 tolerance on (B, 20, 64) patch inputs
— the BASELINE "learned track parity" clause, demonstrable even though
the upstream repo ships no trained weights (bunny_0_2.zip is a 132-byte
git-lfs pointer; testsamples/*.mat are absent).
"""

import importlib.util
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ngpd_tpu.learn.torch_interop import (  # noqa: E402
    load_dgcnn_from_torch,
    load_torch_checkpoint,
    torch_state_dict_from_variables,
    variables_from_torch_dgcnn,
)
from ngpd_tpu.models.dgcnn import DGCNN  # noqa: E402

pytestmark = pytest.mark.slow  # tier-2: heavy engine/e2e (pytest.ini)

REF_GCN = "/root/reference/DenoisingGCN/GCNModel.py"


class _CPUTorch:
    """Proxy over the torch module that pins torch.device(...) to cpu —
    the reference hard-codes cuda in get_graph_feature_idx
    (GCNModel.py:49); this shim lets the oracle run on the CPU build."""

    def __getattr__(self, name):
        if name == "device":
            return lambda *a, **k: torch.device("cpu")
        return getattr(torch, name)


def _load_reference_dgcnn():
    spec = importlib.util.spec_from_file_location("ref_gcnmodel", REF_GCN)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_gcnmodel"] = mod
    spec.loader.exec_module(mod)
    mod.torch = _CPUTorch()
    return mod


def _random_torch_model(seed: int = 0, emb_dims: int = 1024):
    ref = _load_reference_dgcnn()
    torch.manual_seed(seed)
    model = ref.DGCNN(8, 17, emb_dims, 0.5)
    # Randomize BN affine + running stats so the conversion of every
    # tensor kind is actually exercised (fresh BN stats are 0/1).
    with torch.no_grad():
        for m in model.modules():
            if isinstance(
                m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)
            ):
                m.weight.normal_(1.0, 0.1)
                m.bias.normal_(0.0, 0.1)
                m.running_mean.normal_(0.0, 0.2)
                m.running_var.uniform_(0.5, 2.0)
    model.eval()
    return model


def _patch_inputs(batch: int, seed: int = 1) -> np.ndarray:
    """(B, 20, 64): 17 feature rows + 3 neighbor-index rows, the exact
    input format of GCNModel.py:114-118 / MeshViewer.cpp:802-885."""
    rng = np.random.default_rng(seed)
    feats = rng.normal(size=(batch, 17, 64)).astype(np.float32)
    idx = rng.integers(0, 64, size=(batch, 3, 64)).astype(np.float32)
    return np.concatenate([feats, idx], axis=1)


@pytest.fixture(scope="module")
def torch_model():
    return _random_torch_model()


@pytest.fixture(scope="module")
def inputs():
    return _patch_inputs(batch=4)


def test_forward_parity_torch_to_flax(torch_model, inputs):
    with torch.no_grad():
        ref_out = torch_model(torch.from_numpy(inputs)).numpy()

    variables = variables_from_torch_dgcnn(torch_model.state_dict())
    ours = DGCNN().apply(variables, inputs, train=False)
    ours = np.asarray(ours)

    assert ours.shape == ref_out.shape == (4, 3)
    np.testing.assert_allclose(ours, ref_out, rtol=2e-4, atol=2e-4)


def test_t7_checkpoint_roundtrip(torch_model, inputs, tmp_path):
    """torch.save(.t7) -> load_dgcnn_from_torch matches the live model,
    mirroring NetworkController.py:44-52's loadModel path."""
    p = tmp_path / "24_model.t7"
    torch.save(torch_model.state_dict(), str(p))
    variables = load_dgcnn_from_torch(p)
    ours = np.asarray(DGCNN().apply(variables, inputs, train=False))
    with torch.no_grad():
        ref_out = torch_model(torch.from_numpy(inputs)).numpy()
    np.testing.assert_allclose(ours, ref_out, rtol=2e-4, atol=2e-4)


def test_torchscript_checkpoint(torch_model, inputs, tmp_path):
    """TorchScript export (modelTrans.py:6-26) loads too."""
    p = tmp_path / "script_model_1.pt"
    with torch.no_grad():
        scripted = torch.jit.trace(
            torch_model, torch.from_numpy(inputs)
        )
    scripted.save(str(p))
    sd = load_torch_checkpoint(p)
    variables = variables_from_torch_dgcnn(sd)
    ours = np.asarray(DGCNN().apply(variables, inputs, train=False))
    with torch.no_grad():
        ref_out = torch_model(torch.from_numpy(inputs)).numpy()
    np.testing.assert_allclose(ours, ref_out, rtol=2e-4, atol=2e-4)


def test_flax_to_torch_roundtrip(torch_model, inputs):
    """Reverse direction: our variables -> torch state dict -> strict
    load into the reference model -> identical forward."""
    variables = variables_from_torch_dgcnn(torch_model.state_dict())
    sd = torch_state_dict_from_variables(variables)
    model2 = _random_torch_model(seed=7)
    model2.load_state_dict(
        {k: torch.as_tensor(v) for k, v in sd.items()}, strict=True
    )
    model2.eval()
    with torch.no_grad():
        a = torch_model(torch.from_numpy(inputs)).numpy()
        b = model2(torch.from_numpy(inputs)).numpy()
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)
