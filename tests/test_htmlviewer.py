"""Standalone HTML viewer export (apps/htmlviewer.py)."""

import base64
import re

import numpy as np

from ngpd_tpu.apps.htmlviewer import export_html

from fixtures import OCTA_F, OCTA_V, plane_grid


def _decode(html, name):
    m = re.search(rf'decode\("{name}"\)', html)
    assert m is None  # template placeholders must all be substituted
    return None


def _embedded(html):
    """All base64 payloads in document order."""
    return [
        np.frombuffer(base64.b64decode(b), np.float32)
        for b in re.findall(r'decode\("([A-Za-z0-9+/=]+)"\)', html)
    ]


def test_mesh_export(tmp_path):
    out = export_html(
        tmp_path / "m.html", np.asarray(OCTA_V), faces=np.asarray(OCTA_F)
    )
    html = out.read_text()
    assert "__POS__" not in html and "__TITLE__" not in html
    pos, col, nrm = _embedded(html)
    nf = len(OCTA_F)
    assert pos.size == nf * 9 and col.size == nf * 9 and nrm.size == nf * 9
    # Normalized into the unit box.
    assert np.abs(pos).max() <= 0.5 + 1e-6
    # Face normals are unit.
    n = nrm.reshape(-1, 3)[::3]
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-5)
    assert '"points": false' in html


def test_pointcloud_export_with_colors(tmp_path):
    pts, _ = plane_grid(8)
    colors = np.random.default_rng(0).uniform(size=pts.shape).astype(
        np.float32
    )
    out = export_html(tmp_path / "p.html", pts, colors=colors)
    html = out.read_text()
    arrays = _embedded(html)
    assert arrays[0].size == pts.size
    np.testing.assert_allclose(
        arrays[1].reshape(-1, 3), colors, atol=1e-6
    )
    assert '"points": true' in html
