"""Analytic geometry fixtures.

The reference's test style (PatchGeneration/Tests/test_Mesh.py:7-36)
builds tiny analytic meshes with exactly known normals/areas; the same
approach ports directly (SURVEY.md §4). All fixtures are numpy,
deterministic, and small enough for CPU test runs.
"""

from __future__ import annotations

import numpy as np

# Octahedron: 6 vertices, 8 faces (test_Mesh.py:7-27 uses the same solid).
OCTA_V = np.array(
    [
        [1.0, 0.0, 0.0],
        [-1.0, 0.0, 0.0],
        [0.0, 1.0, 0.0],
        [0.0, -1.0, 0.0],
        [0.0, 0.0, 1.0],
        [0.0, 0.0, -1.0],
    ],
    dtype=np.float32,
)
OCTA_F = np.array(
    [
        [0, 2, 4],
        [2, 1, 4],
        [1, 3, 4],
        [3, 0, 4],
        [2, 0, 5],
        [1, 2, 5],
        [3, 1, 5],
        [0, 3, 5],
    ],
    dtype=np.int32,
)


def plane_grid(n: int = 16, spacing: float = 1.0, jitter: float = 0.0, seed: int = 0):
    """A flat z=0 grid: every point is a 'face' point with normal +z."""
    rng = np.random.default_rng(seed)
    xs = np.arange(n, dtype=np.float32) * spacing
    xx, yy = np.meshgrid(xs, xs, indexing="ij")
    pts = np.stack([xx, yy, np.zeros_like(xx)], axis=-1).reshape(-1, 3)
    if jitter:
        pts = pts + rng.normal(scale=jitter, size=pts.shape).astype(np.float32)
    normals = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (len(pts), 1))
    return pts.astype(np.float32), normals


def roof_edge(n: int = 16, spacing: float = 1.0):
    """Two half-planes meeting at a 90-degree crease along the y axis.

    Points on the crease (x == 0) are edge points; crease direction +y.
    """
    xs = np.arange(n, dtype=np.float32) * spacing
    ys = np.arange(n, dtype=np.float32) * spacing
    pts, normals = [], []
    s2 = np.float32(1.0 / np.sqrt(2.0))
    for x in xs:
        for y in ys:
            if x == 0:
                pts.append([0.0, y, 0.0])
                normals.append([0.0, 0.0, 1.0])
            else:
                # left slope (negative x side) and right slope
                pts.append([-x * s2, y, -x * s2])
                normals.append([-s2, 0.0, s2])
                pts.append([x * s2, y, -x * s2])
                normals.append([s2, 0.0, s2])
    return np.asarray(pts, np.float32), np.asarray(normals, np.float32)


def cube_corner(n: int = 10, spacing: float = 1.0):
    """Three faces of a cube meeting at the origin corner.

    Returns (points, normals, labels) with labels 0 face / 1 edge /
    2 corner by analytic position, the FeatureFix.ipynb ground truth
    style (SURVEY.md §4).
    """
    xs = np.arange(n, dtype=np.float32) * spacing
    pts, normals, labels = [], [], []
    for a in xs:
        for b in xs:
            on_a, on_b = a == 0, b == 0
            lab = 2 if (on_a and on_b) else (1 if (on_a or on_b) else 0)
            # z=0 face (normal +z), x=0 face (+x), y=0 face (+y)
            pts.append([a, b, 0.0]); normals.append([0.0, 0.0, 1.0]); labels.append(lab)
            pts.append([0.0, a, b]); normals.append([1.0, 0.0, 0.0]); labels.append(lab)
            pts.append([a, 0.0, b]); normals.append([0.0, 1.0, 0.0]); labels.append(lab)
    pts = np.asarray(pts, np.float32)
    normals = np.asarray(normals, np.float32)
    labels = np.asarray(labels, np.int32)
    pts, idx = np.unique(pts.round(6), axis=0, return_index=True)
    return pts.astype(np.float32), normals[idx], labels[idx]


def random_cloud(n: int = 256, seed: int = 0, scale: float = 1.0):
    rng = np.random.default_rng(seed)
    return (rng.random((n, 3)) * scale).astype(np.float32)


def sphere_cloud(n: int = 512, radius: float = 1.0, seed: int = 0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pts = (v * radius).astype(np.float32)
    return pts, v.astype(np.float32)
