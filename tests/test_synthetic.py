"""Synthetic CAD mesh generators — manifoldness, orientation, and
patch-extractor compatibility."""

import numpy as np
import pytest

from ngpd_tpu.meshproc import synthetic


def _checks(mesh):
    v, f = np.asarray(mesh.v), np.asarray(mesh.f)
    p0, p1, p2 = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    vol = np.sum(np.einsum("ij,ij->i", p0, np.cross(p1, p2))) / 6
    e = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
    e.sort(axis=1)
    _, cnt = np.unique(e, axis=0, return_counts=True)
    areas = 0.5 * np.linalg.norm(np.cross(p1 - p0, p2 - p0), axis=1)
    return vol, set(cnt.tolist()), float(areas.min())


@pytest.mark.parametrize("name", sorted(synthetic.cad_suite()))
def test_suite_watertight_oriented(name):
    mesh = synthetic.cad_suite()[name]
    vol, edge_counts, min_area = _checks(mesh)
    assert vol > 0, "winding must be outward"
    assert edge_counts == {2}, "every edge shared by exactly 2 faces"
    assert min_area > 1e-6, "no degenerate faces"


def test_extrude_polygon_nonstar_kernel():
    # The L polygon's centroid is OUTSIDE the L; the kernel arg keeps
    # cap fans interior. Compare cap area to the exact polygon area.
    t, a = 0.35, 1.0
    mesh = synthetic.lbracket(arm=a, thick=t)
    v, f = np.asarray(mesh.v), np.asarray(mesh.f)
    exact = 2 * a * t - t * t
    p0, p1, p2 = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    n = np.cross(p1 - p0, p2 - p0)
    top = np.abs(np.einsum("ij,ij->i", (p0 + p1 + p2) / 3 - 0, n)) > 0
    zmax = v[:, 2].max()
    cap = np.all(np.isclose(v[f][:, :, 2], zmax), axis=1)
    cap_area = 0.5 * np.linalg.norm(n[cap], axis=1).sum()
    assert np.isclose(cap_area, exact, rtol=1e-5)
    del top


def test_patch_extraction_on_stairs():
    from ngpd_tpu.meshproc.patches import extract_mesh_patches

    mesh = synthetic.stairs(steps=3, n=3)
    patches = extract_mesh_patches(mesh)
    nf = mesh.f.shape[0]
    assert patches.inputs.shape == (nf, 20, 64)
    assert bool(np.all(np.isfinite(np.asarray(patches.inputs))))


def test_feature_statistics_cover_creases():
    # A box's dihedral-angle histogram must contain flat interior faces
    # AND sharp 90-degree crease pairs — the training signal organic
    # scans lack.
    mesh = synthetic.box(n=6)
    v, f = np.asarray(mesh.v), np.asarray(mesh.f)
    p0, p1, p2 = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    n = np.cross(p1 - p0, p2 - p0)
    n = n / np.linalg.norm(n, axis=1, keepdims=True)
    e = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
    owner = np.tile(np.arange(len(f)), 3)
    e_sorted = np.sort(e, axis=1)
    order = np.lexsort((e_sorted[:, 1], e_sorted[:, 0]))
    es, ow = e_sorted[order], owner[order]
    pair = np.all(es[:-1] == es[1:], axis=1)
    a, b = ow[:-1][pair], ow[1:][pair]
    cosd = np.einsum("ij,ij->i", n[a], n[b])
    assert (cosd > 0.99).sum() > 0  # coplanar neighbors
    assert (np.abs(cosd) < 0.1).sum() >= 4  # 90-degree creases
