"""Pallas engine parity (interpret mode on CPU) + kernel-safe math."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ngpd_tpu.core.fused import fused_denoise
from ngpd_tpu.core.pallas_fused import pallas_denoise
from ngpd_tpu.ops.fastmath import acos_poly

from fixtures import sphere_cloud

pytestmark = pytest.mark.slow  # tier-2: heavy engine/e2e (pytest.ini)


def test_acos_poly_matches_arccos():
    x = jnp.linspace(-1.0, 1.0, 4097)
    got = np.asarray(acos_poly(x))
    want = np.arccos(np.asarray(x))
    np.testing.assert_allclose(got, want, atol=5e-7)


def test_pallas_matches_fused_stale():
    """The Pallas kernels reproduce the XLA fused engine exactly
    (same math, same stale thresholds)."""
    pts, nrm = sphere_cloud(256, seed=4)
    rng = np.random.default_rng(5)
    noisy = (pts + rng.normal(scale=0.03, size=pts.shape)).astype(np.float32)
    want, _, wc = fused_denoise(
        jnp.asarray(noisy), jnp.asarray(nrm), iterations=1,
        tile=128, window=128, group=1,
        threshold_method="exact", threshold_refresh=0,
    )
    got, _, gc = pallas_denoise(
        jnp.asarray(noisy), jnp.asarray(nrm), iterations=1,
        tile=128, window=128, threshold_method="exact", interpret=True,
    )
    assert (np.asarray(gc) == np.asarray(wc)).all()
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5
    )


def test_hybrid_matches_lagged():
    """The hybrid engine (window kernels + XLA per-point stages)
    reproduces the monolithic lagged kernels."""
    from ngpd_tpu.core.pallas_fused import pallas_denoise_hybrid

    pts, nrm = sphere_cloud(256, seed=4)
    rng = np.random.default_rng(5)
    noisy = (pts + rng.normal(scale=0.03, size=pts.shape)).astype(np.float32)
    a, _, ac = pallas_denoise(
        jnp.asarray(noisy), jnp.asarray(nrm), iterations=2,
        tile=128, window=128, threshold_method="exact",
        delta_mode="lagged", interpret=True,
    )
    b, _, bc = pallas_denoise_hybrid(
        jnp.asarray(noisy), jnp.asarray(nrm), iterations=2,
        tile=128, window=128, interpret=True,
    )
    assert (np.asarray(ac) == np.asarray(bc)).all()
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_pallas_all_strategies():
    """corner/new/dummy paths also lower and run."""
    pts, nrm = sphere_cloud(128, seed=6)
    out, _, _ = pallas_denoise(
        jnp.asarray(pts), jnp.asarray(nrm), iterations=1,
        strategy=("new", "corner", "dummy"),
        tile=128, window=64, threshold_method="exact", interpret=True,
    )
    assert np.isfinite(np.asarray(out)).all()


def test_hybrid_strategy_variants():
    """The K2 layout branches (new/corner/dummy) lower and run in the
    hybrid engine too."""
    from ngpd_tpu.core.pallas_fused import pallas_denoise_hybrid

    pts, nrm = sphere_cloud(128, seed=8)
    for strat in (("new", "corner", "feature"), ("dummy", "edge", "corner")):
        out, _, _ = pallas_denoise_hybrid(
            jnp.asarray(pts), jnp.asarray(nrm), iterations=1,
            strategy=strat, tile=128, window=64, interpret=True,
        )
        assert np.isfinite(np.asarray(out)).all(), strat


def test_hybrid_matches_fused_on_real_asset():
    """Hybrid vs fused on the reference fandisk (subsampled) — classes
    and positions agree within window-approximation tolerances."""
    from pathlib import Path

    import pytest

    ref = Path("/root/reference/models/fandisk_gaus_n6_noisy.obj")
    if not ref.exists():
        pytest.skip("reference assets not mounted")
    from ngpd_tpu.core.fused import fused_denoise
    from ngpd_tpu.core.pallas_fused import pallas_denoise_hybrid
    from ngpd_tpu.io.obj import load_obj
    from ngpd_tpu.core.normals import orient_normals, pvt_normals
    from ngpd_tpu.ops.knn import knn

    noisy = load_obj(ref).points[::8]
    nbh, _ = knn(noisy, 12, exclude_self=True)
    nrm = orient_normals(noisy, pvt_normals(noisy, nbh), nbh)
    want, _, wc = fused_denoise(
        noisy, nrm, iterations=1, tile=128, window=256, group=1,
        threshold_method="exact", threshold_refresh=0,
    )
    got, _, gc = pallas_denoise_hybrid(
        noisy, nrm, iterations=1, tile=128, window=256, interpret=True,
    )
    # Class boundaries are numerics-sensitive (polynomial acos, counting
    # thresholds vs top_k); broad agreement is the contract on irregular
    # real data.
    agree = (np.asarray(gc) == np.asarray(wc)).mean()
    assert agree > 0.95, agree


def test_hybrid_window_sharing_matches_per_tile():
    """sub>1 (one DMA'd window shared by several compute subtiles) is
    bit-identical to per-tile DMA: every subtile reads the exact same
    +-window span, just from a shared VMEM slab."""
    from ngpd_tpu.core.pallas_fused import pallas_denoise_hybrid

    pts, nrm = sphere_cloud(1024, seed=9)
    rng = np.random.default_rng(10)
    noisy = (pts + rng.normal(scale=0.03, size=pts.shape)).astype(np.float32)
    a, an, ac = pallas_denoise_hybrid(
        jnp.asarray(noisy), jnp.asarray(nrm), iterations=2,
        tile=128, window=128, interpret=True, sub=1,
    )
    b, bn, bc = pallas_denoise_hybrid(
        jnp.asarray(noisy), jnp.asarray(nrm), iterations=2,
        tile=128, window=128, interpret=True, sub=2,
    )
    assert (np.asarray(ac) == np.asarray(bc)).all()
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    np.testing.assert_allclose(np.asarray(an), np.asarray(bn), atol=1e-6)


def test_hybrid_lagged_nvt1_close_to_fresh():
    """lagged_nvt1 reuses K2's filtered-NVT t6 rows as the next
    iteration's K1 output. The t6 summands are neighbor-normal outer
    products — positions enter only the (frozen-threshold) weight
    masks — so on a sphere cloud with clamped steps the two paths
    stay within mask-flip noise of each other, and usually match
    exactly."""
    from ngpd_tpu.core.pallas_fused import pallas_denoise_hybrid

    pts, nrm = sphere_cloud(1024, seed=9)
    rng = np.random.default_rng(10)
    noisy = (pts + rng.normal(scale=0.03, size=pts.shape)).astype(np.float32)
    a, _, ac = pallas_denoise_hybrid(
        jnp.asarray(noisy), jnp.asarray(nrm), iterations=3,
        tile=128, window=128, interpret=True,
    )
    b, _, bc = pallas_denoise_hybrid(
        jnp.asarray(noisy), jnp.asarray(nrm), iterations=3,
        tile=128, window=128, interpret=True, lagged_nvt1=True,
    )
    assert np.mean(np.asarray(ac) == np.asarray(bc)) > 0.99
    diff = np.abs(np.asarray(a) - np.asarray(b))
    # A handful of mask-flip points may move by ~the clamp step; the
    # bulk must be (near-)identical.
    assert np.mean(diff <= 2e-3) > 0.999
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-2)
