"""DataManager session state (DataManager.h:7-42)."""

import numpy as np
import pytest

from ngpd_tpu.io.obj import read_obj, save_obj
from ngpd_tpu.meshproc.datamanager import DataManager
from ngpd_tpu.meshproc.trimesh import TriMesh

from fixtures import OCTA_F, OCTA_V


@pytest.fixture()
def octa_obj(tmp_path):
    p = tmp_path / "octa.obj"
    save_obj(str(p), OCTA_V, faces=OCTA_F)
    return p


def test_import_original_fills_all_slots(octa_obj):
    dm = DataManager()
    dm.import_mesh(octa_obj, is_original=True)
    assert dm.original is dm.mesh
    assert dm.noisy is dm.original and dm.denoised is dm.original
    np.testing.assert_allclose(np.asarray(dm.mesh.v), OCTA_V, atol=1e-5)


def test_slot_moves_and_export(octa_obj, tmp_path):
    dm = DataManager()
    dm.import_mesh(octa_obj, is_original=True)
    noisy = TriMesh.from_numpy(OCTA_V + 0.1, OCTA_F)
    dm.noisy = noisy
    dm.use_noisy()
    assert dm.mesh is noisy
    dm.use_original()
    assert dm.mesh is dm.original
    dm.denoised = noisy
    dm.use_denoised()
    out = tmp_path / "out.obj"
    dm.export_mesh(out)
    rt = read_obj(str(out))
    np.testing.assert_allclose(rt.v, np.asarray(noisy.v), atol=1e-5)
    np.testing.assert_array_equal(rt.fv, OCTA_F)


def test_import_noisy_keeps_original(octa_obj, tmp_path):
    dm = DataManager()
    dm.import_mesh(octa_obj, is_original=True)
    orig = dm.original
    p2 = tmp_path / "noisy.obj"
    save_obj(str(p2), OCTA_V + 0.05, faces=OCTA_F)
    dm.import_mesh(p2, is_original=False)
    assert dm.original is orig
    assert dm.mesh is dm.noisy
    assert not np.allclose(np.asarray(dm.noisy.v), np.asarray(orig.v))


def test_clear_and_guards(octa_obj, tmp_path):
    dm = DataManager()
    with pytest.raises(ValueError):
        dm.export_mesh(tmp_path / "x.obj")
    dm.import_mesh(octa_obj)
    dm.clear()
    assert dm.mesh is None and dm.original is None
    # Point-only files are rejected (the app only loads meshes).
    p = tmp_path / "pts.obj"
    save_obj(str(p), OCTA_V)
    with pytest.raises(ValueError):
        dm.import_mesh(p)
