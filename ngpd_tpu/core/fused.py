"""Fused windowed denoise — the speed-of-light large-cloud path.

Motivation (measured on v5e): XLA random row-gathers run at ~123M
rows/s regardless of row width, so the dense (N, k) gather formulation
(core/pipeline.py) spends ~0.25 s per 1M x 32 gather — an order of
magnitude over the 1M-points x 20-iterations < 1 s budget. This module
removes EVERY random gather from the iteration:

  1. Points are Morton-sorted once (ops/morton.py; lax.sort carries the
     payload, no permutation gather). Geometric neighbors then live
     within a small INDEX window of each point.
  2. The cloud is processed in tiles of T sorted queries. Each tile
     takes one contiguous dynamic-slice window of W_t = T + 2*window
     sorted rows.
  3. kNN becomes a (T, W_t) distance tile (MXU matmul) + per-row k-th
     distance threshold; every neighbor reduction in the pipeline —
     filtered NVT, VU smoothing inputs, and all denoise-step systems —
     becomes a masked (T, W_t) x (W_t, C) matmul against precomputed
     window feature columns. The MXU does the "scatter".

The math is EXACTLY the reference pipeline's (same citations as
core/voting.py / core/denoise.py); only the neighbor-set construction
is approximate: a point's true k-th neighbor must lie inside its Morton
window. With window >= 512 on surface clouds recall is ~1 (tested);
window >= N/2 makes it exact and bit-comparable to core/pipeline.py
(parity tests).

Derivations for the window forms (f = smoothed normals, p = positions,
per query i over window j, sums masked to the kNN set):
  * feature/corner (Denoiser.py:174-219, 26-51):
      A_i = I + n_i n_i^T + S_i + deg_i n_i n_i^T,
      b_i = p_i + n_i n_i^T p_i + n_i n_i^T (M @ p) + M @ (n (n.p)),
      with S_i = M @ (n n^T cols), M the mask matrix.
  * edge (Denoiser.py:53-88): with projector P = I - y y^T and
    n_pi = P n, v_pi = P v + (y.p_i) y:
      A_i = P S_i P + deg_i y y^T,
      b_i = P [ M@(n (n.p)) - Q_i : y y ] + deg_i (y.p_i) y,
      where Q_i[c,a,b] = M @ (n_c n_a p_b) (27 columns) and ":" is the
      double contraction over (a, b).
  * flat (Denoiser.py:90-119): all terms are (T, W_t) elementwise on
    the distance tile and two MXU cross-products (n_i.n_j, p_i.n_j).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import DenoiseConfig
from ..ops.eigh3 import eigh3x3
from ..ops.morton import morton_sort, unsort
from ..ops.solve3 import solve3x3_guarded
from . import voting
from .pipeline import DEFAULT_STRATEGY

_INF = jnp.float32(jnp.inf)
_HI = jax.lax.Precision.HIGHEST


def _mm(a, b):
    """MXU matmul at full f32 precision (distances/weights feed
    thresholds — bf16 passes reorder neighbors)."""
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), precision=_HI,
        preferred_element_type=jnp.float32,
    )


def _dist_tile(tile_pos, win_pos, col_valid):
    aa = jnp.sum(tile_pos * tile_pos, axis=1, keepdims=True)
    bb = jnp.sum(win_pos * win_pos, axis=1)[None, :]
    ab = _mm(tile_pos, win_pos.T)
    d = jnp.maximum(aa + bb - 2.0 * ab, 0.0)
    return jnp.where(col_valid[None, :], d, _INF)


def _kth_smallest(d, k, method: str = "exact"):
    """Per-row k-th smallest of d. "approx" uses the TPU-optimized
    approx_min_k aggregator (recall 0.99) — much cheaper than top_k and
    safe here: the threshold merely selects the kNN mask, and a
    borderline 33rd-vs-32nd neighbor swap is noise to the sums."""
    if method == "approx":
        vals, _ = jax.lax.approx_min_k(d, k, recall_target=0.99)
        return vals[:, k - 1]
    vals, _ = jax.lax.top_k(-d, k)
    return -vals[:, k - 1]


def _sym6(n):
    """(W, 3) -> (W, 6) upper-triangle columns of n n^T."""
    return jnp.stack(
        [n[:, 0] * n[:, 0], n[:, 0] * n[:, 1], n[:, 0] * n[:, 2],
         n[:, 1] * n[:, 1], n[:, 1] * n[:, 2], n[:, 2] * n[:, 2]],
        axis=1,
    )


def _mat3(s6):
    """(T, 6) -> (T, 3, 3) symmetric."""
    a, b, c, d, e, f = (s6[:, i] for i in range(6))
    return jnp.stack(
        [jnp.stack([a, b, c], -1), jnp.stack([b, d, e], -1),
         jnp.stack([c, e, f], -1)],
        axis=1,
    )


def _nvt_tile(tile_pos, win_pos, win_n, d, mask_k, rho):
    """better_filtered_nvt (Decompositionor.py:278-300) on one tile.

    Weight: acos(|normalize(p_j - p_i) . n_j|) > rho, i.e.
    |cos| < cos(rho); zero-weight rows fall back to the plain kNN mask.
    """
    pn_j = jnp.sum(win_pos * win_n, axis=1)  # (W,) p_j . n_j
    cross = _mm(tile_pos, win_n.T)  # (T, W) p_i . n_j
    num = jnp.abs(pn_j[None, :] - cross)
    cosang = num / jnp.maximum(jnp.sqrt(d), 1e-12)
    w = (cosang < jnp.cos(rho)) & mask_k
    wsum = jnp.sum(w, axis=1)
    w = jnp.where((wsum == 0)[:, None], mask_k, w)
    wf = w.astype(jnp.float32)
    wsum = jnp.sum(wf, axis=1)
    t6 = _mm(wf, _sym6(win_n)) / jnp.maximum(wsum, 1.0)[:, None]
    return voting.Decomposition(*eigh3x3(_mat3(t6)))


def _clamp(vi, opt, alpha, d_thr, strict=True):
    di = (opt - vi) * alpha
    nrm = jnp.linalg.norm(di, axis=-1)
    ok = nrm < d_thr if strict else nrm <= d_thr
    return jnp.where(ok[:, None], vi + di, vi)


class _TileCtx(NamedTuple):
    tile_pos: jnp.ndarray  # (T, 3)
    win_pos: jnp.ndarray  # (W, 3)
    win_fn: jnp.ndarray  # (W, 3) smoothed normals
    tile_fn: jnp.ndarray  # (T, 3)
    d: jnp.ndarray  # (T, W)
    mask8: jnp.ndarray  # (T, W) bool — step-kNN membership
    mask8f: jnp.ndarray  # float32
    deg: jnp.ndarray  # (T,)


def _step_columns(ctx: _TileCtx):
    njvj = jnp.sum(ctx.win_fn * ctx.win_pos, axis=1)  # (W,)
    col_nnv = ctx.win_fn * njvj[:, None]  # (W, 3) n (n.p)
    m6 = _sym6(ctx.win_fn)  # (W, 6)
    s6 = _mm(ctx.mask8f, m6)  # (T, 6)
    b_nv = _mm(ctx.mask8f, col_nnv)  # (T, 3)
    sv = _mm(ctx.mask8f, ctx.win_pos)  # (T, 3)
    return njvj, col_nnv, m6, s6, b_nv, sv


def _flat_tile(ctx: _TileCtx, njvj, d_thr, alpha, delta):
    ninj = _mm(ctx.tile_fn, ctx.win_fn.T)
    d2 = jnp.maximum(delta**2, 1e-30)
    sim = jnp.exp(-16.0 * (2.0 - 2.0 * ninj) / d2)
    close = jnp.exp(-4.0 * jnp.where(jnp.isfinite(ctx.d), ctx.d, 0.0) / d2)
    wb = sim * close * ctx.mask8f
    dot = njvj[None, :] - _mm(ctx.tile_pos, ctx.win_fn.T)
    num = jnp.sum(wb * dot, axis=1)
    wsum = jnp.sum(wb, axis=1)
    di = (num / jnp.maximum(wsum, 1e-30) * alpha)[:, None] * ctx.tile_fn
    nrm = jnp.linalg.norm(di, axis=-1)
    di = jnp.where((nrm <= d_thr)[:, None], di, 0.0)
    return ctx.tile_pos + di


def _feature_like_tile(ctx: _TileCtx, s6, b_nv, sv, d_thr, alpha):
    eye = jnp.eye(3, dtype=jnp.float32)
    ni_o = ctx.tile_fn[:, :, None] * ctx.tile_fn[:, None, :]
    a = eye[None] + ni_o + _mat3(s6) + ctx.deg[:, None, None] * ni_o
    niv = jnp.einsum("tij,tj->ti", ni_o, ctx.tile_pos)
    nisv = jnp.einsum("tij,tj->ti", ni_o, sv)
    b = ctx.tile_pos + niv + nisv + b_nv
    opt, _ = solve3x3_guarded(a, b, ctx.tile_pos)
    return _clamp(ctx.tile_pos, opt, alpha, d_thr)


def _new_tile(ctx: _TileCtx, njvj, col_nnv, m6, d_thr, alpha, delta):
    dot = njvj[None, :] - _mm(ctx.tile_pos, ctx.win_fn.T)
    d2 = jnp.maximum(delta**2, 1e-30)
    like = jnp.exp(-9.0 * dot**2 / d2) * ctx.mask8f
    s6 = _mm(like, m6)
    b_nv = _mm(like, col_nnv)
    sv = _mm(like, ctx.win_pos)
    eye = jnp.eye(3, dtype=jnp.float32)
    ni_o = ctx.tile_fn[:, :, None] * ctx.tile_fn[:, None, :]
    # Cardinality stays the RAW neighbor count (Denoiser.py:148,204).
    a = eye[None] + ni_o + _mat3(s6) + ctx.deg[:, None, None] * ni_o
    niv = jnp.einsum("tij,tj->ti", ni_o, ctx.tile_pos)
    nisv = jnp.einsum("tij,tj->ti", ni_o, sv)
    b = ctx.tile_pos + niv + nisv + b_nv
    opt, _ = solve3x3_guarded(a, b, ctx.tile_pos)
    return _clamp(ctx.tile_pos, opt, alpha, d_thr)


def _corner_tile(ctx: _TileCtx, s6, b_nv, d_thr, alpha):
    opt, _ = solve3x3_guarded(_mat3(s6), b_nv, ctx.tile_pos)
    return _clamp(ctx.tile_pos, opt, alpha, d_thr)


def _edge_tile(ctx: _TileCtx, s6, b_nv, d_thr, alpha, y):
    w = ctx.win_fn
    p = ctx.win_pos
    # Q columns: n_c n_a p_b, 27 per window row.
    qcols = (
        w[:, :, None, None] * w[:, None, :, None] * p[:, None, None, :]
    ).reshape(-1, 27)
    q = _mm(ctx.mask8f, qcols).reshape(-1, 3, 3, 3)  # (T, c, a, b)
    s = _mat3(s6)
    eye = jnp.eye(3, dtype=jnp.float32)
    proj = eye[None] - y[:, :, None] * y[:, None, :]
    a = (
        jnp.einsum("tij,tjk,tkl->til", proj, s, proj)
        + ctx.deg[:, None, None] * (y[:, :, None] * y[:, None, :])
    )
    q_yy = jnp.einsum("tcab,ta,tb->tc", q, y, y)
    yv = jnp.sum(y * ctx.tile_pos, axis=1)
    b = (
        jnp.einsum("tij,tj->ti", proj, b_nv - q_yy)
        + (ctx.deg * yv)[:, None] * y
    )
    opt, _ = solve3x3_guarded(a, b, ctx.tile_pos)
    return _clamp(ctx.tile_pos, opt, alpha, d_thr)


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "strategy", "iterations", "tile", "window", "group",
        "threshold_method", "threshold_refresh",
    ),
)
def fused_denoise(
    points: jnp.ndarray,
    normals: jnp.ndarray,
    cfg: DenoiseConfig = DenoiseConfig(),
    strategy: tuple[str, str, str] = DEFAULT_STRATEGY,
    iterations: Optional[int] = None,
    num_valid: Optional[jnp.ndarray] = None,
    tile: int = 256,
    window: int = 512,
    group: int = 4,
    threshold_method: str = "exact",
    threshold_refresh: int = 1,
    threshold_slack: float = 1.05,
):
    """Windowed equivalent of core.pipeline.denoise.

    Returns (points, normals, classes) in ORIGINAL point order.
    ``window`` is the one-sided Morton-index search radius; windows of
    at least the cloud size make the neighbor sets exact.

    ``threshold_refresh``: recompute the per-point k-th-distance
    thresholds every n iterations (1 = every iteration, exact kNN
    semantics). 0 computes them once on the noisy input and reuses them
    scaled by ``threshold_slack`` — the k-th selection is by far the
    most expensive reduction, and reuse mirrors the reference, whose
    KD-tree is built ONCE on the noisy positions and queried against
    moving points for the whole run (Selector.py:141).
    """
    iters = cfg.iterations if iterations is None else iterations
    n_in = points.shape[0]
    nv = jnp.asarray(n_in if num_valid is None else num_valid, jnp.int32)

    # Pad to a tile multiple; padding sorts to the end.
    n = -(-n_in // tile) * tile
    if n != n_in:
        points = jnp.pad(points, ((0, n - n_in), (0, 0)))
        normals = jnp.pad(normals, ((0, n - n_in), (0, 0)))
    sc = morton_sort(points, normals, nv)

    wt = min(tile + 2 * window, n)
    num_tiles = n // tile
    starts = jnp.clip(
        jnp.arange(num_tiles, dtype=jnp.int32) * tile - window, 0, n - wt
    )
    col_of = jnp.arange(wt, dtype=jnp.int32)

    # Tiles are processed in vmapped GROUPS inside a sequential lax.map:
    # the group batches per-step work so the chip isn't starved by
    # per-step dispatch, while the map bounds live memory.
    g = max(1, min(group, num_tiles))
    while num_tiles % g:
        g -= 1
    num_groups = num_tiles // g

    def tiles(fn, *arrays):
        """Map fn(t_idx, off, tiles..., windows...) over all tiles."""

        def one(t):
            off = starts[t]
            tl = [
                jax.lax.dynamic_slice_in_dim(a, t * tile, tile) for a in arrays
            ]
            wn = [jax.lax.dynamic_slice_in_dim(a, off, wt) for a in arrays]
            return fn(t, off, tl, wn)

        def body(gi):
            return jax.vmap(one)(gi * g + jnp.arange(g, dtype=jnp.int32))

        out = jax.lax.map(body, jnp.arange(num_groups, dtype=jnp.int32))
        return jax.tree_util.tree_map(
            lambda x: x.reshape((num_tiles,) + x.shape[2:]), out
        )

    # --- d threshold: 2 * mean 6-NN edge length (Processor.py:120-121),
    # computed once on the noisy input like the reference.
    def thr_tile(t, off, tl, wn):
        (tp,) = tl
        (wp,) = wn
        d = _dist_tile(tp, wp, off + col_of < nv)
        d6 = -jax.lax.top_k(-d, 6)[0]  # (T, 6) incl. the zero self edge
        dist = jnp.sqrt(jnp.where(jnp.isfinite(d6), d6, 0.0))
        row_ok = (t * tile + jnp.arange(tile)) < nv
        return (
            jnp.sum(jnp.where(row_ok[:, None], dist, 0.0)),
            jnp.sum(row_ok) * 6,
        )

    sums, counts = tiles(thr_tile, sc.pos)
    d_thr = cfg.d_scale * jnp.sum(sums) / jnp.maximum(jnp.sum(counts), 1)

    needs_delta = tuple(
        c for c in range(3) if strategy[c] in ("flat", "new")
    )

    def one_iteration(carry, _):
        pos, nrm, rk_feat0, rk_step0 = carry

        # ---- pass A: NVT1 + VU smoothing -> f_n. The per-point
        # k-th-distance thresholds are recomputed here every
        # ``threshold_refresh`` iterations and reused by passes B/C/D
        # (positions do not move within an iteration) — and across
        # iterations in stale-threshold mode.
        def pass_a(t, off, tl, wn):
            tp, tn, trk, trk8 = tl
            wp, wnm, _, _ = wn
            d = _dist_tile(tp, wp, off + col_of < nv)
            if threshold_refresh:
                rk = _kth_smallest(d, cfg.feature_k, threshold_method)
                rk8 = _kth_smallest(d, cfg.step_k, threshold_method)
            else:
                rk, rk8 = trk, trk8
            mk = (d <= rk[:, None]) & (d < _INF)
            dec = _nvt_tile(tp, wp, wnm, d, mk, cfg.angle)
            f = voting.vu_smoothed_normals(
                dec, tn, cfg.vu_tau, cfg.vu_damping
            )
            return f, rk, rk8

        f_n, rk_feat, rk_step = tiles(pass_a, pos, nrm, rk_feat0, rk_step0)
        f_n = f_n.reshape(n, 3)
        rk_feat = rk_feat.reshape(n)
        rk_step = rk_step.reshape(n)

        # ---- pass B: NVT2 -> classes, edge dirs, delta mean partials ---
        def pass_b(t, off, tl, wn):
            tp, _tf, trk, trk8 = tl
            wp, wf, _, _ = wn
            d = _dist_tile(tp, wp, off + col_of < nv)
            mk = (d <= trk[:, None]) & (d < _INF)
            dec = _nvt_tile(tp, wp, wf, d, mk, cfg.angle)
            cls = voting.classes(dec, cfg.class_scale)
            edge_vec = dec.eigvec[..., 0]
            m8 = ((d <= trk8[:, None]) & (d < _INF)).astype(jnp.float32)
            row_ok = (t * tile + jnp.arange(tile)) < nv
            psums, pcnts = [], []
            for c in needs_delta:
                mrow = ((cls == c) & row_ok).astype(jnp.float32)
                mc = m8 * mrow[:, None]
                psums.append(jnp.sum(_mm(mc, wp), axis=0))
                pcnts.append(jnp.sum(mc))
            if needs_delta:
                ps = jnp.stack(psums)
                pc = jnp.stack(pcnts)
            else:
                ps = jnp.zeros((1, 3))
                pc = jnp.zeros((1,))
            return cls, edge_vec, ps, pc

        cls, edge_vec, psums, pcnts = tiles(pass_b, pos, f_n, rk_feat, rk_step)
        cls = cls.reshape(n)
        edge_vec = edge_vec.reshape(n, 3)
        centers = jnp.sum(psums, axis=0) / jnp.maximum(
            jnp.sum(pcnts, axis=0), 1.0
        )[:, None]  # (n_delta, 3)

        # ---- pass C: delta = max dist from class center ----------------
        def pass_c(t, off, tl, wn):
            tp, tc, trk8 = tl
            wp, _, _ = wn
            d = _dist_tile(tp, wp, off + col_of < nv)
            m8 = (d <= trk8[:, None]) & (d < _INF)
            row_ok = (t * tile + jnp.arange(tile)) < nv
            outs = []
            for ci, c in enumerate(needs_delta):
                dist = jnp.linalg.norm(wp - centers[ci][None, :], axis=1)
                m = m8 & ((tc == c) & row_ok)[:, None]
                outs.append(jnp.max(jnp.where(m, dist[None, :], 0.0)))
            return jnp.stack(outs) if needs_delta else jnp.zeros((1,))

        if needs_delta:
            dmax = tiles(pass_c, pos, cls, rk_step)
            deltas = {
                c: jnp.max(dmax[:, ci])
                for ci, c in enumerate(needs_delta)
            }
        else:
            deltas = {}

        # ---- pass D: the class-dispatched vertex updates ----------------
        def pass_d(t, off, tl, wn):
            tp, tf, tc, te, trk8 = tl
            wp, wf, _, _, _ = wn
            d = _dist_tile(tp, wp, off + col_of < nv)
            m8 = (d <= trk8[:, None]) & (d < _INF)
            m8f = m8.astype(jnp.float32)
            ctx = _TileCtx(
                tile_pos=tp, win_pos=wp, win_fn=wf, tile_fn=tf,
                d=d, mask8=m8, mask8f=m8f, deg=jnp.sum(m8f, axis=1),
            )
            njvj, col_nnv, m6, s6, b_nv, sv = _step_columns(ctx)

            def run(name, cid):
                if name == "flat":
                    return _flat_tile(
                        ctx, njvj, d_thr, cfg.alphas[cid], deltas[cid]
                    )
                if name == "edge":
                    return _edge_tile(ctx, s6, b_nv, d_thr, cfg.alphas[cid], te)
                if name == "corner":
                    return _corner_tile(ctx, s6, b_nv, d_thr, cfg.alphas[cid])
                if name == "feature":
                    return _feature_like_tile(
                        ctx, s6, b_nv, sv, d_thr, cfg.alphas[cid]
                    )
                if name == "new":
                    return _new_tile(
                        ctx, njvj, col_nnv, m6, d_thr, cfg.alphas[cid],
                        deltas[cid],
                    )
                if name == "dummy":
                    return tp
                raise ValueError(name)

            outs = [run(strategy[c], c) for c in range(3)]
            return jnp.where(
                (tc == 0)[:, None], outs[0],
                jnp.where((tc == 1)[:, None], outs[1], outs[2]),
            )

        new_pos = tiles(pass_d, pos, f_n, cls, edge_vec, rk_step).reshape(n, 3)
        # Keep padding rows pinned.
        row = jnp.arange(n)
        new_pos = jnp.where((row < nv)[:, None], new_pos, pos)
        return (new_pos, f_n, rk_feat, rk_step), cls

    if threshold_refresh:
        rk_feat0 = jnp.zeros(n, jnp.float32)
        rk_step0 = jnp.zeros(n, jnp.float32)
    else:
        # Stale-threshold mode: one k-th-distance sweep on the noisy
        # input, inflated by the slack so the moving points keep at
        # least ~k neighbors inside.
        def thr_pass(t, off, tl, wn):
            (tp,) = tl
            (wp,) = wn
            d = _dist_tile(tp, wp, off + col_of < nv)
            rk = _kth_smallest(d, cfg.feature_k, threshold_method)
            rk8 = _kth_smallest(d, cfg.step_k, threshold_method)
            return rk, rk8

        rk_feat0, rk_step0 = tiles(thr_pass, sc.pos)
        rk_feat0 = rk_feat0.reshape(n) * threshold_slack
        rk_step0 = rk_step0.reshape(n) * threshold_slack

    (pos, nrm_out, _, _), cls_hist = jax.lax.scan(
        one_iteration, (sc.pos, sc.nrm, rk_feat0, rk_step0), None,
        length=iters,
    )
    final_cls = cls_hist[-1]

    # One scatter back to original order.
    out_pos = unsort(pos, sc.orig_idx)[:n_in]
    out_nrm = unsort(nrm_out, sc.orig_idx)[:n_in]
    out_cls = unsort(final_cls[:, None], sc.orig_idx)[:n_in, 0]
    return out_pos, out_nrm, out_cls
