"""Full-optimization canary.

The suite runs with JAX_DISABLE_MOST_OPTIMIZATIONS=1 (conftest.py:24) to
cut compile-bound wall-clock, which means an XLA fusion/optimization bug
could slip past every in-process test. This canary re-runs a small
denoise parity check in a subprocess with FULL optimizations and
compares against the unoptimized in-process result.

The workload is a piecewise-planar surface (bench.py's make_cloud
shape), NOT a random blob: free-space Gaussian points sit exactly on
the face/edge/corner classification boundaries, where any one-ULP
numeric difference flips a class and the iteration diverges chaotically
— that would test input conditioning, not the compiler.
"""

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _surface_cloud():
    rng = np.random.default_rng(7)
    side = 40
    xs = np.linspace(0.0, 0.4, side, dtype=np.float32)
    xx, yy = np.meshgrid(xs, xs, indexing="ij")
    p, amp = 0.1, 0.02
    tri = lambda t: 2 * np.abs(t / p - np.floor(t / p + 0.5))  # noqa: E731
    zz = amp * (tri(xx) + tri(yy))
    pts = np.stack([xx, yy, zz], -1).reshape(-1, 3).astype(np.float32)
    nrm = np.zeros_like(pts)
    nrm[:, 2] = 1.0
    noise = rng.normal(scale=0.002, size=(len(pts), 1)).astype(np.float32)
    return pts + nrm * noise, nrm


_SCRIPT = """
import json
import numpy as np
import jax
# The JAX_PLATFORMS env var alone is ignored: the ambient axon
# sitecustomize pins jax_platforms, and with the TPU tunnel down the
# subprocess would wedge on backend init (same dance as conftest.py).
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from ngpd_tpu.config import DenoiseConfig
from ngpd_tpu.core.fused import fused_denoise
from tests.test_opt_canary import _surface_cloud
import pytest

pytestmark = pytest.mark.slow  # tier-2: heavy engine/e2e (pytest.ini)

pts, nrm = _surface_cloud()
out, _, _ = fused_denoise(
    jnp.asarray(pts), jnp.asarray(nrm), DenoiseConfig(),
    iterations=2, tile=64, window=128,
)
print(json.dumps({"out": np.asarray(out).ravel().tolist()}))
"""


def test_full_optimizations_match_disabled():
    import jax.numpy as jnp

    from ngpd_tpu.config import DenoiseConfig
    from ngpd_tpu.core.fused import fused_denoise

    pts, nrm = _surface_cloud()
    out, _, _ = fused_denoise(
        jnp.asarray(pts), jnp.asarray(nrm), DenoiseConfig(),
        iterations=2, tile=64, window=128,
    )
    here = np.asarray(out).ravel()

    env = dict(os.environ)
    env["JAX_DISABLE_MOST_OPTIMIZATIONS"] = "0"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        env=env, capture_output=True, text=True, timeout=900, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    got = np.asarray(
        json.loads(proc.stdout.strip().splitlines()[-1])["out"], np.float32
    )
    # Full-opt XLA reassociates float reductions, which can flip the
    # class of a point sitting exactly on a threshold; those points then
    # take a different (also valid) update. Require the BULK to agree to
    # float32 tolerance and bound the worst boundary flip — a genuine
    # optimization miscompile would shift far more than a handful of
    # threshold points.
    diff = np.abs(got - here)
    frac_off = float((diff > 1e-4).mean())
    assert frac_off < 0.01, f"{frac_off:.2%} of outputs differ by >1e-4"
    assert float(diff.max()) < 5e-3, f"max diff {diff.max():.2e}"
