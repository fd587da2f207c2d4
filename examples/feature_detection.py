"""Feature classification accuracy on analytic shapes — the
FeatureDetection.ipynb / FeatureFix.ipynb workflow.

The reference checks face/edge/corner classification against analytic
ground truth on cube/triangle meshes (FeatureFix.ipynb cells 1-5). This
script builds the analytic cube-corner fixture, classifies with the
tensor-voting pipeline, reports accuracy, and renders the classes.

Usage: python examples/feature_detection.py [--out classes.png]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import sys
from pathlib import Path

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parent.parent / "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="classes.png")
    ap.add_argument("--n", type=int, default=14)
    args = ap.parse_args()

    from fixtures import cube_corner

    from ngpd_tpu.apps import viz
    from ngpd_tpu.core import voting
    from ngpd_tpu.core.pipeline import my_feature_decomposition
    from ngpd_tpu.ops.knn import knn

    pts, nrm, labels = cube_corner(n=args.n)
    nbh, _ = knn(jnp.asarray(pts), 16)
    dec, f_n = my_feature_decomposition(
        jnp.asarray(pts), jnp.asarray(nrm), nbh, angle=np.pi * 5 / 12
    )
    cls = np.asarray(voting.classes(dec))
    acc = (cls == labels).mean()
    print(f"classification vs analytic labels: {acc:.1%} "
          f"(faces {(cls == 0).sum()}, edges {(cls == 1).sum()}, "
          f"corners {(cls == 2).sum()})")
    out = viz.plot_classes(pts, cls, out=args.out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
