"""Full-optimization XLA canary.

conftest.py sets JAX_DISABLE_MOST_OPTIMIZATIONS=1 for the suite (it is
compile-bound on CPU), so every other test validates unoptimized XLA
only. This canary re-runs the fusion-heaviest path — the classical
denoise iteration — in a subprocess WITH the full optimization
pipeline and pins its output to the in-process (deoptimized) result; a
fusion- or optimization-dependent numerical regression fails here
instead of passing CI unseen.

Cost control on the 1-CPU host: normals are precomputed once here (the
wavefront-orientation while_loop is the most expensive compile and is
not fusion-sensitive), the deoptimized side runs in-process (its
programs are already in the suite's persistent cache), and only the
optimized denoise step pays a subprocess compile — cached across runs
by JAX_COMPILATION_CACHE_DIR.
"""

import os
import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent

_DRIVER = """
import sys
import numpy as np
import jax
# The JAX_PLATFORMS env var alone is ignored: the ambient axon
# sitecustomize pins jax_platforms, and with the TPU tunnel down the
# subprocess would wedge on backend init (same dance as conftest.py).
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from ngpd_tpu.core.pipeline import denoise
import pytest

pytestmark = pytest.mark.slow  # tier-2: heavy engine/e2e (pytest.ini)

data = np.load(sys.argv[1])
out, out_n, _ = denoise(
    jnp.asarray(data["pos"]), jnp.asarray(data["n"]), iterations=2
)
np.savez(sys.argv[2], pos=np.asarray(out), n=np.asarray(out_n))
"""


def test_full_optimizations_match_deoptimized():
    import jax.numpy as jnp

    from ngpd_tpu.core.normals import orient_normals, pvt_normals
    from ngpd_tpu.core.pipeline import denoise
    from ngpd_tpu.ops.knn import knn

    rng = np.random.default_rng(7)
    # A noisy sphere: curved geometry with every voting class
    # represented, small enough that the cold subprocess compile stays
    # cheap.
    u = rng.normal(size=(384, 3))
    pts = u / np.linalg.norm(u, axis=1, keepdims=True)
    pts = (pts + rng.normal(0, 0.02, pts.shape)).astype(np.float32)

    pos = jnp.asarray(pts)
    nbh, _ = knn(pos, 12, exclude_self=True)
    nrm = orient_normals(pos, pvt_normals(pos, nbh), nbh)

    # Deoptimized reference: in-process, under the suite's
    # JAX_DISABLE_MOST_OPTIMIZATIONS=1.
    assert os.environ.get("JAX_DISABLE_MOST_OPTIMIZATIONS") == "1"
    ref, ref_n, _ = denoise(pos, nrm, iterations=2)

    with tempfile.TemporaryDirectory() as td:
        infile = f"{td}/in.npz"
        outfile = f"{td}/opt.npz"
        np.savez(infile, pos=pts, n=np.asarray(nrm))
        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            JAX_DISABLE_MOST_OPTIMIZATIONS="0",
            PYTHONPATH=os.pathsep.join(
                [str(REPO)] + env.get("PYTHONPATH", "").split(os.pathsep)
            ),
        )
        subprocess.run(
            [sys.executable, "-c", _DRIVER, infile, outfile],
            check=True,
            env=env,
            timeout=540,
        )
        opt = np.load(outfile)

    # A handful of points sit exactly on voting-class thresholds where
    # an ulp of fusion difference flips the class (update magnitude
    # ~2e-4); a real optimization regression moves the bulk by orders
    # more. Require the bulk tight and everything bounded.
    err = np.abs(opt["pos"] - np.asarray(ref)).max(axis=1)
    assert np.quantile(err, 0.99) < 5e-5, np.quantile(err, 0.99)
    assert err.max() < 5e-3, err.max()
    # Normals can sign-flip under eigh degeneracies; compare up to sign.
    dot = np.abs(np.sum(opt["n"] * np.asarray(ref_n), axis=1))
    assert np.quantile(dot, 0.02) > 0.999
