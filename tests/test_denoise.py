"""Denoise steps and pipeline: oracle parity + behavioral properties."""

import numpy as np
import jax
import jax.numpy as jnp

from ngpd_tpu.core import denoise as steps
from ngpd_tpu.core import noise as noise_mod
from ngpd_tpu.core.pipeline import (
    denoise,
    denoise_iteration,
    denoise_until_minimum_error,
)
from ngpd_tpu.ops import metrics
from ngpd_tpu.ops.knn import knn

import oracle
from fixtures import plane_grid, sphere_cloud


def _noisy_plane(n=14, sigma=0.1, seed=0):
    pts, nrm = plane_grid(n)
    rng = np.random.default_rng(seed)
    noisy = pts + np.array([0, 0, 1.0], np.float32) * rng.normal(
        scale=sigma, size=(len(pts), 1)
    ).astype(np.float32)
    return pts, noisy, nrm


def test_flat_step_flattens_plane():
    pts, noisy, nrm = _noisy_plane()
    nbh, _ = knn(jnp.asarray(noisy), 8)
    out = np.asarray(
        steps.flat_step(jnp.asarray(noisy), nbh, jnp.asarray(nrm), jnp.asarray(10.0), 1.0)
    )
    assert np.abs(out[:, 2]).std() < np.abs(noisy[:, 2]).std() * 0.6
    # x/y untouched (update along the normal only).
    np.testing.assert_allclose(out[:, :2], noisy[:, :2], atol=1e-5)


def test_steps_match_oracle():
    """flat/edge/feature steps vs the ragged float64 oracle on a generic
    cloud, applied to ALL rows with uniform normals data."""
    pts64, nrm64 = sphere_cloud(96, seed=7)
    pts64 = pts64.astype(np.float64)
    nrm64 = nrm64.astype(np.float64)
    k, d_thr, alpha = 8, 100.0, 0.3
    idx = oracle.knn_with_self(pts64, k)
    rows = np.arange(len(pts64))
    nbh, _ = knn(jnp.asarray(pts64.astype(np.float32)), k)
    p32 = jnp.asarray(pts64.astype(np.float32))
    n32 = jnp.asarray(nrm64.astype(np.float32))

    want = oracle.feature_step(pts64, idx, rows, nrm64, d_thr, alpha)
    got = np.asarray(steps.feature_step(p32, nbh, n32, jnp.asarray(d_thr), alpha))
    np.testing.assert_allclose(got, want, atol=2e-3)

    # Edge step with synthetic edge directions (unit, arbitrary).
    rng = np.random.default_rng(8)
    y = rng.normal(size=(len(pts64), 3))
    y /= np.linalg.norm(y, axis=1, keepdims=True)
    want = oracle.edge_step(pts64, idx, rows, nrm64, y, d_thr, alpha)
    got = np.asarray(
        steps.edge_step(
            p32, nbh, n32, jnp.asarray(y.astype(np.float32)), jnp.asarray(d_thr), alpha
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-3)

    want = oracle.flat_step(pts64, idx, rows, nrm64, d_thr, alpha)
    got = np.asarray(steps.flat_step(p32, nbh, n32, jnp.asarray(d_thr), alpha))
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_denoise_iteration_matches_oracle():
    """One full fused iteration vs the ragged oracle (class dispatch,
    per-class flat delta, VU smoothing — everything)."""
    pts, nrm = sphere_cloud(128, seed=9)
    pts64 = pts.astype(np.float64)
    k_feat, k_step, d_thr = 16, 8, 100.0
    alphas = (1.0, 0.2, 1.0)
    angle = np.pi * 5 / 12
    want_pos, want_fn, want_cls = oracle.denoise_iteration(
        pts64, nrm.astype(np.float64), k_feat, k_step, d_thr, alphas, angle
    )
    nbh_f, _ = knn(jnp.asarray(pts), k_feat)
    nbh_s, _ = knn(jnp.asarray(pts), k_step)
    got_pos, got_fn, got_cls = denoise_iteration(
        jnp.asarray(pts), jnp.asarray(nrm), nbh_f, nbh_s,
        jnp.asarray(d_thr), alphas, angle,
    )
    agree = (np.asarray(got_cls) == want_cls).mean()
    assert agree > 0.95, agree
    same = np.asarray(got_cls) == want_cls
    np.testing.assert_allclose(np.asarray(got_pos)[same], want_pos[same], atol=5e-3)


def test_dummy_step_identity():
    pts, nrm = sphere_cloud(32)
    nbh, _ = knn(jnp.asarray(pts), 4)
    out = steps.dummy_step(jnp.asarray(pts), nbh, jnp.asarray(nrm), jnp.asarray(1.0))
    np.testing.assert_array_equal(np.asarray(out), pts)


def test_threshold_rejects_large_steps():
    pts, nrm = sphere_cloud(64, seed=11)
    nbh, _ = knn(jnp.asarray(pts), 8)
    out = np.asarray(
        steps.feature_step(
            jnp.asarray(pts), nbh, jnp.asarray(nrm), jnp.asarray(1e-9), 1.0
        )
    )
    np.testing.assert_array_equal(out, pts)  # every step rejected


def test_denoise_improves_chamfer_on_noisy_plane():
    pts, nrm = plane_grid(16)
    key = jax.random.PRNGKey(0)
    noisy = noise_mod.generate_noise(
        key, jnp.asarray(pts), jnp.asarray(nrm), 0.3, jnp.asarray(1.0)
    )
    out, _, _ = denoise(noisy, jnp.asarray(nrm))
    cd0 = float(jnp.mean(metrics.chamfer_distance(noisy, jnp.asarray(pts))))
    cd1 = float(jnp.mean(metrics.chamfer_distance(out, jnp.asarray(pts))))
    assert cd1 < cd0 * 0.5, (cd0, cd1)


def test_until_minimum_error_returns_best():
    pts, nrm = plane_grid(12)
    key = jax.random.PRNGKey(1)
    noisy = noise_mod.generate_noise(
        key, jnp.asarray(pts), jnp.asarray(nrm), 0.3, jnp.asarray(1.0)
    )
    best, best_nrm, err, iters = denoise_until_minimum_error(
        noisy, jnp.asarray(nrm), jnp.asarray(pts), max_iterations=16
    )
    e_best = float(jnp.mean(metrics.paper_distance(jnp.asarray(pts), best)))
    e_noisy = float(jnp.mean(metrics.paper_distance(jnp.asarray(pts), noisy)))
    assert e_best < e_noisy
    assert int(iters) >= 1
    np.testing.assert_allclose(float(err), e_best, rtol=1e-4)
    # Best-iterate normals ride along (the reference leaves them stale,
    # Processor.py:185): unit length, plane orientation preserved (VU
    # smoothing keeps the dominant eigvec ±z on a plane).
    lens = np.linalg.norm(np.asarray(best_nrm), axis=1)
    np.testing.assert_allclose(lens, 1.0, atol=1e-4)
    assert float(np.abs(np.asarray(best_nrm)[:, 2]).mean()) > 0.95


def test_until_minimum_error_windowed():
    from ngpd_tpu.core.pipeline import denoise_until_minimum_error_windowed

    pts, nrm = plane_grid(16)
    key = jax.random.PRNGKey(2)
    noisy = noise_mod.generate_noise(
        key, jnp.asarray(pts), jnp.asarray(nrm), 0.3, jnp.asarray(1.0)
    )
    best, _, err, it = denoise_until_minimum_error_windowed(
        noisy, jnp.asarray(nrm), jnp.asarray(pts),
        max_iterations=6, tile=128, window=256, use_pallas=False,
    )
    e0 = float(jnp.mean(metrics.paper_distance(jnp.asarray(pts), noisy)))
    assert err < e0
    assert it >= 1
