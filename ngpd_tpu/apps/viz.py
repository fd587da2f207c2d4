"""Headless visualization (the Visualize.py equivalent).

The reference plots with meshplot/matplotlib inside notebooks
(Visualize.py:39-213). Here everything renders to PNG with matplotlib's
Agg backend so it works on headless TPU hosts:

  * plot_cloud — 3D scatter with optional per-point colors and normal
    quivers (visualize/visSample, Visualize.py:39-102);
  * plot_classes — the face/edge/corner coloring;
  * plot_tensor_voting — eigenvalue-scaled eigenvector axes per sampled
    point (visTensorVoting, Visualize.py:122-152).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

CLASS_COLORS = np.array(
    [[0.2, 0.6, 1.0], [1.0, 0.7, 0.1], [1.0, 0.1, 0.1]]
)  # face / edge / corner


def _new_ax():
    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(111, projection="3d")
    ax.set_box_aspect((1, 1, 1))
    return fig, ax


def plot_cloud(
    points: np.ndarray,
    colors: Optional[np.ndarray] = None,
    normals: Optional[np.ndarray] = None,
    out: str | Path = "cloud.png",
    point_size: float = 2.0,
    quiver_scale: float = 0.05,
):
    points = np.asarray(points)
    fig, ax = _new_ax()
    ax.scatter(*points.T, s=point_size, c=colors)
    if normals is not None:
        normals = np.asarray(normals)
        scale = quiver_scale * float(
            np.linalg.norm(points.max(0) - points.min(0))
        )
        ax.quiver(
            *points.T, *(normals.T * scale), length=1.0, linewidth=0.3,
            color="gray",
        )
    fig.savefig(out, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return Path(out)


def plot_classes(
    points: np.ndarray, classes: np.ndarray, out: str | Path = "classes.png"
):
    cls = np.asarray(classes).clip(0, 2)
    return plot_cloud(points, colors=CLASS_COLORS[cls], out=out)


def plot_tensor_voting(
    points: np.ndarray,
    eigval: np.ndarray,
    eigvec: np.ndarray,
    out: str | Path = "voting.png",
    sample: int = 200,
):
    """Eigenvalue-scaled frames at a point subsample
    (Visualize.visTensorVoting, Visualize.py:122-152)."""
    points = np.asarray(points)
    eigval = np.asarray(eigval)
    eigvec = np.asarray(eigvec)
    stride = max(1, len(points) // sample)
    fig, ax = _new_ax()
    ax.scatter(*points.T, s=1.0, c="lightgray")
    scale = 0.03 * float(np.linalg.norm(points.max(0) - points.min(0)))
    colors = ["r", "g", "b"]
    for axis in range(3):
        vec = eigvec[::stride, :, axis] * (
            eigval[::stride, axis : axis + 1] * scale
        )
        ax.quiver(
            *points[::stride].T, *vec.T, length=1.0, linewidth=0.5,
            color=colors[axis],
        )
    fig.savefig(out, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return Path(out)
