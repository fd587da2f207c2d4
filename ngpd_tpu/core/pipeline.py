"""Denoising drivers — the Processor equivalent (Processor.py:24-199).

The classical pipeline per iteration:
  1. feature decomposition: kNN(16) -> BetterFilteredNVT -> VU-smoothed
     normals -> second BetterFilteredNVT (getMyFeatureDecomposition,
     Processor.py:110-117);
  2. classify face/edge/corner (Decompositionor.py:65-69);
  3. per-class vertex update with the smoothed normals
     (Processor.py:119-139);
  4. adopt the smoothed normals for the next iteration.

TPU-first: the whole iteration is one jitted function; fixed-count
iteration uses ``lax.scan`` (denoise, Processor.py:119-139 runs 2) and
the until-minimum-error driver is a ``lax.while_loop`` carrying the
best-so-far iterate on device (Processor.py:141-185) — no host round
trips in the loop.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..config import DenoiseConfig
from ..ops import metrics
from ..ops.knn import knn
from ..ops.neighbors import Neighborhood
from . import denoise as steps
from . import voting

STEP_NAMES = ("flat", "edge", "corner", "feature", "new", "dummy")
DEFAULT_STRATEGY = ("flat", "edge", "feature")  # Processor.py:127-137


def my_feature_decomposition(
    points: jnp.ndarray,
    normals: jnp.ndarray,
    nbh: Neighborhood,
    angle: float,
    vu_tau: float = 0.3,
    vu_damping: float = 3.0,
    src_points: Optional[jnp.ndarray] = None,
    src_normals: Optional[jnp.ndarray] = None,
    src_f_n: Optional[jnp.ndarray] = None,
):
    """getMyFeatureDecomposition (Processor.py:110-117): filtered NVT,
    VU-smooth the normals, second filtered NVT on the smoothed normals.

    In sharded mode ``src_f_n`` must be the full (replicated) VU-smoothed
    normals so the second NVT gathers globally consistent values; the
    parallel driver computes them in a first all-to-all round.
    """
    nvt1 = voting.better_filtered_nvt(
        points, nbh, normals, angle, src_points, src_normals
    )
    f_n = voting.vu_smoothed_normals(nvt1, normals, vu_tau, vu_damping)
    decomp = voting.better_filtered_nvt(
        points, nbh, f_n, angle, src_points, src_f_n
    )
    return decomp, f_n


def martin_feature_decomposition(
    points: jnp.ndarray,
    normals: jnp.ndarray,
    nbh: Neighborhood,
    rho: float = 0.9,
):
    """getMartinFeatureDecomposition (Processor.py:102-108) on a
    radius-masked neighborhood."""
    nvt1 = voting.normal_filtered_nvt(nbh, normals, rho)
    f_n = voting.vu_smoothed_normals(nvt1, normals)
    decomp = voting.normal_filtered_pvt(points, nbh, f_n, rho)
    return decomp, f_n


def _class_delta(
    points: jnp.ndarray,
    nbh: Neighborhood,
    row_mask: jnp.ndarray,
    src_points: Optional[jnp.ndarray] = None,
    axis_name: Optional[str] = None,
) -> jnp.ndarray:
    """The reference's global neighbor-spread scale, restricted to the
    rows of one class (flat_step computes it over the filtered selection's
    gathered neighbors, Denoiser.py:106-107).

    Under shard_map (``axis_name`` set) the mean/max reductions run
    across all shards via psum/pmax, so the scale matches the
    single-device value exactly.
    """
    vj = nbh.gather(points if src_points is None else src_points)
    m = (row_mask[:, None] & nbh.mask).astype(points.dtype)
    total = jnp.sum(m)
    vsum = jnp.sum(vj * m[..., None], axis=(0, 1))
    if axis_name is not None:
        total = jax.lax.psum(total, axis_name)
        vsum = jax.lax.psum(vsum, axis_name)
    center = vsum / jnp.maximum(total, 1.0)
    dist = jnp.linalg.norm(vj - center, axis=-1)
    delta = jnp.max(jnp.where(m > 0, dist, 0.0))
    if axis_name is not None:
        delta = jax.lax.pmax(delta, axis_name)
    return delta


def denoise_iteration(
    points: jnp.ndarray,
    normals: jnp.ndarray,
    nbh_feat: Neighborhood,
    nbh_step: Neighborhood,
    d: jnp.ndarray,
    alphas: tuple[float, float, float],
    angle: float,
    class_scale: float = 0.2,
    strategy: tuple[str, str, str] = DEFAULT_STRATEGY,
    vu_tau: float = 0.3,
    vu_damping: float = 3.0,
    src_points: Optional[jnp.ndarray] = None,
    src_normals: Optional[jnp.ndarray] = None,
    gather_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    axis_name: Optional[str] = None,
):
    """One full classify-and-update iteration for ALL points.

    Classes are data: each configured step runs densely and the result is
    where-selected per point — the fused-dispatch replacement for the
    reference's per-class selection filtering (Processor.py:126-138).

    Sharded mode (shard_map callers): ``points``/``normals`` hold only
    this shard's rows, ``src_points``/``src_normals`` the full replicated
    arrays, ``gather_fn`` all-gathers a local row array into the full
    one, and ``axis_name`` names the mesh axis for cross-shard
    reductions. Single-device callers leave all four unset.
    """
    nvt1 = voting.better_filtered_nvt(
        points, nbh_feat, normals, angle, src_points, src_normals
    )
    f_n = voting.vu_smoothed_normals(nvt1, normals, vu_tau, vu_damping)
    src_f_n = gather_fn(f_n) if gather_fn is not None else None
    decomp = voting.better_filtered_nvt(
        points, nbh_feat, f_n, angle, src_points, src_f_n
    )
    cls = voting.classes(decomp, class_scale)
    edge_vectors = decomp.eigvec[..., 0]  # smallest-eigval direction

    def run(name: str, class_id: int) -> jnp.ndarray:
        if name == "flat":
            delta = _class_delta(
                points, nbh_step, cls == class_id, src_points, axis_name
            )
            return steps.flat_step(
                points, nbh_step, f_n, d, alphas[class_id], delta=delta,
                src_points=src_points, src_normals=src_f_n,
            )
        if name == "edge":
            return steps.edge_step(
                points, nbh_step, f_n, edge_vectors, d, alphas[class_id],
                src_points=src_points, src_normals=src_f_n,
            )
        if name == "corner":
            return steps.corner_step(
                points, nbh_step, f_n, d, alphas[class_id],
                src_points=src_points, src_normals=src_f_n,
            )
        if name == "feature":
            return steps.feature_step(
                points, nbh_step, f_n, d, alphas[class_id],
                src_points=src_points, src_normals=src_f_n,
            )
        if name == "new":
            delta = _class_delta(
                points, nbh_step, cls == class_id, src_points, axis_name
            )
            return steps.new_step(
                points, nbh_step, f_n, d, alphas[class_id], delta=delta,
                src_points=src_points, src_normals=src_f_n,
            )
        if name == "dummy":
            return steps.dummy_step(points, nbh_step, f_n, d, alphas[class_id])
        raise ValueError(f"unknown step {name!r}; expected one of {STEP_NAMES}")

    new_by_class = [run(strategy[c], c) for c in range(3)]
    new_pos = jnp.where(
        (cls == 0)[:, None],
        new_by_class[0],
        jnp.where((cls == 1)[:, None], new_by_class[1], new_by_class[2]),
    )
    return new_pos, f_n, cls


def step_threshold(points: jnp.ndarray, num_valid=None) -> jnp.ndarray:
    """d = 2 * mean 6-NN edge length (Processor.py:120-121).

    Quirk preserved: getKNNSelection(6) includes the query itself as a
    zero-length edge (scipy KDTree semantics), so the mean runs over six
    distances one of which is 0.
    """
    nbh, _ = knn(points, 6, num_valid=num_valid)
    return 2.0 * metrics.average_edge_length(points, nbh)


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg",
        "strategy",
        "iterations",
        "neighbor_method",
        "grid_capacity",
    ),
)
def denoise(
    points: jnp.ndarray,
    normals: jnp.ndarray,
    cfg: DenoiseConfig = DenoiseConfig(),
    strategy: tuple[str, str, str] = DEFAULT_STRATEGY,
    iterations: Optional[int] = None,
    num_valid: Optional[jnp.ndarray] = None,
    neighbor_method: str = "auto",
    grid_capacity: int = 96,
):
    """Fixed-iteration denoise (Processor.denoise, Processor.py:119-139).

    Neighbors are recomputed from the CURRENT positions every iteration
    (the reference queries a KD-tree frozen at noisy positions,
    Selector.py:141 — recomputing is strictly more faithful to the
    geometry and costs one fused kNN per iteration on TPU).

    ``neighbor_method``: "brute" (exact tiled O(N^2), default below
    100k points), "grid" (voxel-hash, the >=100k path), or "auto".

    Returns (denoised points, final normals, final classes).
    """
    iters = cfg.iterations if iterations is None else iterations
    n = points.shape[0]
    use_grid = neighbor_method == "grid" or (
        neighbor_method == "auto" and n >= 100_000
    )
    d = cfg.d_scale / 2.0 * step_threshold(points, num_valid)
    if use_grid:
        from ..ops.knn import estimate_cell_size, knn_grid

        # Cell sized for the largest k in play, estimated once on the
        # noisy input (positions only shrink toward the surface).
        cell = estimate_cell_size(points, max(cfg.feature_k, cfg.step_k))

        def neighbors(pos, k):
            return knn_grid(
                pos, k, cell, capacity=grid_capacity, num_valid=num_valid
            )

    else:

        def neighbors(pos, k):
            return knn(pos, k, num_valid=num_valid)

    def body(carry, _):
        pos, nrm = carry
        nbh_feat, _ = neighbors(pos, cfg.feature_k)
        nbh_step, _ = neighbors(pos, cfg.step_k)
        new_pos, f_n, cls = denoise_iteration(
            pos,
            nrm,
            nbh_feat,
            nbh_step,
            d,
            cfg.alphas,
            cfg.angle,
            cfg.class_scale,
            strategy,
            cfg.vu_tau,
            cfg.vu_damping,
        )
        return (new_pos, f_n), cls

    (pos, nrm), cls_hist = jax.lax.scan(
        body, (points, normals), None, length=iters
    )
    return pos, nrm, cls_hist[-1]


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "strategy", "k", "error_fn", "max_iterations"),
)
def denoise_until_minimum_error(
    points: jnp.ndarray,
    normals: jnp.ndarray,
    gt_points: jnp.ndarray,
    cfg: DenoiseConfig = DenoiseConfig(),
    strategy: tuple[str, str, str] = DEFAULT_STRATEGY,
    k: int = 7,
    alphas: tuple[float, float, float] = (0.02, 0.02, 0.1),
    d: float = 200.0,
    error_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray] = metrics.paper_distance,
    max_iterations: Optional[int] = None,
):
    """Iterate while the error against GT keeps improving; return the
    best (previous) iterate — Processor.denoiseUntilMinimumError
    (Processor.py:141-185), with the error check on device inside a
    lax.while_loop instead of a host-side Python while.

    Returns (best_points, best_normals, best_error_mean,
    iterations_done). The reference only returns positions and leaves
    the caller's normals stale (Processor.py:185); returning the best
    iterate's smoothed normals is the deliberate drift fix.
    """
    max_iters = cfg.max_iterations if max_iterations is None else max_iterations
    d_arr = jnp.asarray(d, dtype=points.dtype)

    err0 = jnp.mean(error_fn(gt_points, points))

    def one_step(pos, nrm):
        nbh_feat, _ = knn(pos, cfg.feature_k)
        nbh_step, _ = knn(pos, k)
        return denoise_iteration(
            pos,
            nrm,
            nbh_feat,
            nbh_step,
            d_arr,
            alphas,
            cfg.angle,
            cfg.class_scale,
            strategy,
            cfg.vu_tau,
            cfg.vu_damping,
        )

    # Carry: (prev_pos, prev_nrm, prev_err, cur_pos, cur_nrm, cur_err,
    # iters). Initial prev_err = err0 + 200 (Processor.py:153).
    init = (
        points, normals, err0 + 200.0, points, normals, err0, jnp.int32(0)
    )

    def cond(c):
        _, _, prev_err, _, _, cur_err, it = c
        return jnp.logical_and(cur_err < prev_err, it < max_iters)

    def body(c):
        _, _, _, pos, nrm, cur_err, it = c
        new_pos, f_n, _ = one_step(pos, nrm)
        new_err = jnp.mean(error_fn(gt_points, new_pos))
        return (pos, nrm, cur_err, new_pos, f_n, new_err, it + 1)

    prev_pos, prev_nrm, prev_err, _, _, _, it = jax.lax.while_loop(
        cond, body, init
    )
    return prev_pos, prev_nrm, prev_err, it - 1


def denoise_until_minimum_error_windowed(
    points,
    normals,
    gt_points,
    cfg: DenoiseConfig = DenoiseConfig(),
    strategy: tuple[str, str, str] = DEFAULT_STRATEGY,
    max_iterations: int = 64,
    error_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray] = metrics.paper_distance,
    tile: int = 256,
    window: int = 256,
    use_pallas: Optional[bool] = None,
):
    """Until-minimum-error driver at large-cloud scale.

    Same best-iterate semantics as denoise_until_minimum_error
    (Processor.py:141-185) but each step runs one windowed-engine
    iteration (Pallas on TPU, XLA elsewhere) and the error check loops
    on host — each single-iteration call is jit-cached, so the loop
    costs one kernel launch + one error evaluation per step.

    Returns (best_points, best_normals, best_error_mean,
    iterations_done).
    """
    import jax as _jax

    if use_pallas is None:
        use_pallas = _jax.devices()[0].platform not in ("cpu",)
    if use_pallas:
        from .pallas_fused import pallas_denoise_hybrid as _engine_p

        def step(p, n):
            return _engine_p(
                p, n, cfg, strategy=strategy, iterations=1,
                tile=tile, window=window,
            )
    else:
        from .fused import fused_denoise as _engine_f

        def step(p, n):
            return _engine_f(
                p, n, cfg, strategy=strategy, iterations=1,
                tile=tile, window=window, threshold_refresh=0,
            )

    pos, nrm = points, normals
    prev_pos, prev_nrm = pos, nrm
    prev_err = float(jnp.mean(error_fn(gt_points, pos)))
    it = 0
    while it < max_iterations:
        new_pos, new_nrm, _ = step(pos, nrm)
        err = float(jnp.mean(error_fn(gt_points, new_pos)))
        if err >= prev_err:
            break
        prev_pos, prev_nrm, prev_err = new_pos, new_nrm, err
        pos, nrm = new_pos, new_nrm
        it += 1
    return prev_pos, prev_nrm, prev_err, it
