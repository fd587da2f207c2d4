"""Sharded paths vs single-device ground truth on the 8-device CPU mesh —
the fake-cluster layer the reference never had (SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ngpd_tpu.core.pipeline import denoise
from ngpd_tpu.ops import metrics
from ngpd_tpu.ops.knn import knn
from ngpd_tpu.parallel import (
    chamfer_distance_sharded,
    denoise_sharded,
    knn_sharded,
)
from ngpd_tpu.parallel.mesh import make_mesh, shard_points

from fixtures import sphere_cloud

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_knn_sharded_matches_single():
    pts, _ = sphere_cloud(512, seed=0)
    mesh = make_mesh(8)
    sp, n = shard_points(jnp.asarray(pts), mesh)
    nbh_s, d_s = knn_sharded(sp, 8, mesh)
    nbh, d = knn(jnp.asarray(pts), 8)
    np.testing.assert_allclose(np.asarray(d_s)[:n], np.asarray(d), atol=1e-5)


def test_knn_sharded_exclude_self():
    pts, _ = sphere_cloud(256, seed=1)
    mesh = make_mesh(8)
    sp, n = shard_points(jnp.asarray(pts), mesh)
    nbh_s, d_s = knn_sharded(sp, 6, mesh, exclude_self=True)
    nbh, d = knn(jnp.asarray(pts), 6, exclude_self=True)
    np.testing.assert_allclose(np.asarray(d_s)[:n], np.asarray(d), atol=1e-5)
    assert not (
        np.asarray(nbh_s.idx)[:n] == np.arange(n)[:, None]
    ).any()


def test_chamfer_sharded_matches_single():
    a, _ = sphere_cloud(300, seed=2)
    b, _ = sphere_cloud(260, seed=3)
    mesh = make_mesh(8)
    sa, na = shard_points(jnp.asarray(a), mesh)
    sb, nb = shard_points(jnp.asarray(b), mesh)
    # Padding rows would pollute the sharded sum; pad-free comparison:
    a8 = a[:296]  # multiple of 8
    b8 = b[:256]
    sa, _ = shard_points(jnp.asarray(a8), mesh)
    sb, _ = shard_points(jnp.asarray(b8), mesh)
    got = float(chamfer_distance_sharded(sa, sb, mesh))
    want = float(jnp.mean(metrics.chamfer_distance(jnp.asarray(a8), jnp.asarray(b8))))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_denoise_sharded_matches_single():
    """The multi-chip denoise reproduces the single-device result."""
    pts, nrm = sphere_cloud(256, seed=4)
    rng = np.random.default_rng(5)
    noisy = (pts + rng.normal(scale=0.03, size=pts.shape)).astype(np.float32)

    want, _, _ = denoise(jnp.asarray(noisy), jnp.asarray(nrm), iterations=2)

    mesh = make_mesh(8)
    sp, n = shard_points(jnp.asarray(noisy), mesh)
    sn, _ = shard_points(jnp.asarray(nrm), mesh, pad_value=0.0)
    got, _ = denoise_sharded(sp, sn, mesh, iterations=2)
    np.testing.assert_allclose(
        np.asarray(got)[:n], np.asarray(want), atol=5e-4
    )


def test_fused_denoise_sharded_matches_single():
    """The sharded Morton-window engine reproduces the single-device
    fused result across an 8-device mesh."""
    import jax.numpy as jnp
    from ngpd_tpu.core.fused import fused_denoise
    from ngpd_tpu.parallel.fused_sharded import fused_denoise_sharded

    pts, nrm = sphere_cloud(2048, seed=9)
    rng = np.random.default_rng(10)
    noisy = (pts + rng.normal(scale=0.03, size=pts.shape)).astype(np.float32)

    want, _, wc = fused_denoise(
        jnp.asarray(noisy), jnp.asarray(nrm), iterations=2,
        tile=128, window=128, group=1,
        threshold_method="exact", threshold_refresh=0,
    )

    mesh = make_mesh(8)
    sp, n = shard_points(jnp.asarray(noisy), mesh)
    sn, _ = shard_points(jnp.asarray(nrm), mesh, pad_value=0.0)
    got, _, gc = fused_denoise_sharded(
        sp, sn, mesh, iterations=2, tile=128, window=128, num_valid=n,
    )
    np.testing.assert_allclose(
        np.asarray(got)[:n], np.asarray(want), atol=2e-4
    )
    assert (np.asarray(gc)[:n] == np.asarray(wc)).mean() > 0.99
