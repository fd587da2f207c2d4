"""Multi-chip Morton-windowed denoise — the large-cloud scale-out path.

Combines the fused window engine (core/fused.py) with point-axis
sharding: after a replicated Morton sort, each chip owns a contiguous
range of sorted tiles. Because tile windows only reach ``window`` rows
past the tile, a chip needs at most that halo beyond its range — here
the sorted arrays are kept replicated (one all-gather of positions +
smoothed normals per pass round), so windows need no explicit halo
exchange and every chip runs the identical single-chip tile kernels on
its slice. Global scalars (the d threshold, per-class centers and
spread deltas) reduce with psum/pmax over the mesh axis.

Replication is deliberate at this scale: 4M points of packed geometry
are ~100 MB — a single ICI round per iteration against an O(N * window)
compute body. A fully distributed sort + halo-ring design only pays off
beyond ~50M points per slice and is left for a later round.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..config import DenoiseConfig
from ..core import voting
from ..core.fused import (
    _TileCtx,
    _corner_tile,
    _dist_tile,
    _edge_tile,
    _feature_like_tile,
    _flat_tile,
    _kth_smallest,
    _new_tile,
    _nvt_tile,
    _step_columns,
)
from ..core.pipeline import DEFAULT_STRATEGY
from ..ops.morton import morton_sort, unsort
from .mesh import POINTS_AXIS

_INF = jnp.float32(jnp.inf)


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "strategy", "iterations", "mesh", "tile", "window",
        "threshold_method", "axis",
    ),
)
def fused_denoise_sharded(
    points: jnp.ndarray,
    normals: jnp.ndarray,
    mesh: Mesh,
    cfg: DenoiseConfig = DenoiseConfig(),
    strategy: tuple[str, str, str] = DEFAULT_STRATEGY,
    iterations: Optional[int] = None,
    num_valid: Optional[jnp.ndarray] = None,
    tile: int = 256,
    window: int = 256,
    threshold_method: str = "exact",
    threshold_slack: float = 1.05,
    axis: str = POINTS_AXIS,
):
    """Windowed denoise with tiles sharded over the mesh axis.

    ``points``/``normals`` are (N, 3) row-sharded or replicated; N must
    be divisible by devices * tile. Returns (points, normals, classes)
    in original order, row-sharded like the input.
    """
    iters = cfg.iterations if iterations is None else iterations
    n_in = points.shape[0]
    nv = jnp.asarray(n_in if num_valid is None else num_valid, jnp.int32)
    d = mesh.shape[axis]

    chunk = d * tile
    n = -(-n_in // chunk) * chunk
    if n != n_in:
        points = jnp.pad(points, ((0, n - n_in), (0, 0)))
        normals = jnp.pad(normals, ((0, n - n_in), (0, 0)))

    num_tiles = n // tile
    tiles_per_shard = num_tiles // d
    wt = min(tile + 2 * window, n)
    needs_delta = tuple(c for c in range(3) if strategy[c] in ("flat", "new"))

    def body(pts_l, nrm_l):
        # Replicate + sort identically on every chip.
        full_p = jax.lax.all_gather(pts_l, axis, axis=0, tiled=True)
        full_n = jax.lax.all_gather(nrm_l, axis, axis=0, tiled=True)
        sc = morton_sort(full_p, full_n, nv)

        sid = jax.lax.axis_index(axis)
        my_tiles = sid * tiles_per_shard + jnp.arange(
            tiles_per_shard, dtype=jnp.int32
        )
        starts = jnp.clip(my_tiles * tile - window, 0, n - wt)
        col_of = jnp.arange(wt, dtype=jnp.int32)

        def tiles_map(fn, *full_arrays):
            def one(i):
                t = my_tiles[i]
                off = starts[i]
                tl = [
                    jax.lax.dynamic_slice_in_dim(a, t * tile, tile)
                    for a in full_arrays
                ]
                wn = [
                    jax.lax.dynamic_slice_in_dim(a, off, wt)
                    for a in full_arrays
                ]
                return fn(t, off, tl, wn)

            return jax.lax.map(one, jnp.arange(tiles_per_shard, dtype=jnp.int32))

        # Stale thresholds + d threshold (global psum).
        def thr_tile(t, off, tl, wn):
            (tp,) = tl
            (wp,) = wn
            dmat = _dist_tile(tp, wp, off + col_of < nv)
            rkf = _kth_smallest(dmat, cfg.feature_k, threshold_method)
            rk8 = _kth_smallest(dmat, cfg.step_k, threshold_method)
            d6 = -jax.lax.top_k(-dmat, 6)[0]
            dist6 = jnp.sqrt(jnp.where(jnp.isfinite(d6), d6, 0.0))
            row_ok = (t * tile + jnp.arange(tile)) < nv
            return (
                rkf, rk8,
                jnp.sum(jnp.where(row_ok[:, None], dist6, 0.0)),
                jnp.sum(row_ok) * 6,
            )

        rkf_l, rk8_l, ssum, cnt = tiles_map(thr_tile, sc.pos)
        rk_feat_l = rkf_l.reshape(-1) * threshold_slack  # local rows
        rk_step_l = rk8_l.reshape(-1) * threshold_slack
        d_thr = cfg.d_scale * jax.lax.psum(jnp.sum(ssum), axis) / jnp.maximum(
            jax.lax.psum(jnp.sum(cnt), axis), 1
        )
        # Replicate thresholds (rows are in shard order = sorted order).
        rk_feat = jax.lax.all_gather(rk_feat_l, axis, axis=0, tiled=True)
        rk_step = jax.lax.all_gather(rk_step_l, axis, axis=0, tiled=True)

        def one_iteration(carry, _):
            pos, nrm = carry  # full sorted (n, 3), replicated

            def pass_a(t, off, tl, wn):
                tp, tn, trk = tl
                wp, wnm, _ = wn
                dm = _dist_tile(tp, wp, off + col_of < nv)
                mk = (dm <= trk[:, None]) & (dm < _INF)
                dec = _nvt_tile(tp, wp, wnm, dm, mk, cfg.angle)
                return voting.vu_smoothed_normals(
                    dec, tn, cfg.vu_tau, cfg.vu_damping
                )

            f_n_l = tiles_map(pass_a, pos, nrm, rk_feat).reshape(-1, 3)
            f_n = jax.lax.all_gather(f_n_l, axis, axis=0, tiled=True)

            def pass_b(t, off, tl, wn):
                tp, _tf, trk, trk8 = tl
                wp, wf, _, _ = wn
                dm = _dist_tile(tp, wp, off + col_of < nv)
                mk = (dm <= trk[:, None]) & (dm < _INF)
                dec = _nvt_tile(tp, wp, wf, dm, mk, cfg.angle)
                cls = voting.classes(dec, cfg.class_scale)
                edge_vec = dec.eigvec[..., 0]
                m8 = ((dm <= trk8[:, None]) & (dm < _INF)).astype(jnp.float32)
                row_ok = (t * tile + jnp.arange(tile)) < nv
                psums, pcnts = [], []
                for c in needs_delta:
                    mrow = ((cls == c) & row_ok).astype(jnp.float32)
                    mc = m8 * mrow[:, None]
                    psums.append(jnp.sum(mc[..., None] * wp[None], axis=(0, 1)))
                    pcnts.append(jnp.sum(mc))
                ps = jnp.stack(psums) if needs_delta else jnp.zeros((1, 3))
                pc = jnp.stack(pcnts) if needs_delta else jnp.zeros((1,))
                return cls, edge_vec, ps, pc

            cls_l, edge_l, psums, pcnts = tiles_map(
                pass_b, pos, f_n, rk_feat, rk_step
            )
            cls_l = cls_l.reshape(-1)
            edge_l = edge_l.reshape(-1, 3)
            centers = jax.lax.psum(jnp.sum(psums, axis=0), axis) / jnp.maximum(
                jax.lax.psum(jnp.sum(pcnts, axis=0), axis), 1.0
            )[:, None]

            deltas = {}
            if needs_delta:
                def pass_c(t, off, tl, wn):
                    tp, tc, trk8 = tl
                    wp, _, _ = wn
                    dm = _dist_tile(tp, wp, off + col_of < nv)
                    m8 = (dm <= trk8[:, None]) & (dm < _INF)
                    row_ok = (t * tile + jnp.arange(tile)) < nv
                    outs = []
                    for ci, c in enumerate(needs_delta):
                        dist = jnp.linalg.norm(
                            wp - centers[ci][None, :], axis=1
                        )
                        m = m8 & ((tc == c) & row_ok)[:, None]
                        outs.append(jnp.max(jnp.where(m, dist[None, :], 0.0)))
                    return jnp.stack(outs)

                cls_full = jax.lax.all_gather(cls_l, axis, axis=0, tiled=True)
                dmax = tiles_map(pass_c, pos, cls_full, rk_step)
                for ci, c in enumerate(needs_delta):
                    deltas[c] = jax.lax.pmax(jnp.max(dmax[:, ci]), axis)
            else:
                cls_full = jax.lax.all_gather(cls_l, axis, axis=0, tiled=True)

            def pass_d(t, off, tl, wn):
                tp, tf, tc, te, trk8 = tl
                wp, wf, _, _, _ = wn
                dm = _dist_tile(tp, wp, off + col_of < nv)
                m8 = (dm <= trk8[:, None]) & (dm < _INF)
                m8f = m8.astype(jnp.float32)
                ctx = _TileCtx(
                    tile_pos=tp, win_pos=wp, win_fn=wf, tile_fn=tf,
                    d=dm, mask8=m8, mask8f=m8f, deg=jnp.sum(m8f, axis=1),
                )
                njvj, col_nnv, m6, s6, b_nv, sv = _step_columns(ctx)

                def run(name, cid):
                    if name == "flat":
                        return _flat_tile(
                            ctx, njvj, d_thr, cfg.alphas[cid], deltas[cid]
                        )
                    if name == "edge":
                        return _edge_tile(
                            ctx, s6, b_nv, d_thr, cfg.alphas[cid], te
                        )
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
                    return tp

                outs = [run(strategy[c], c) for c in range(3)]
                return jnp.where(
                    (tc == 0)[:, None], outs[0],
                    jnp.where((tc == 1)[:, None], outs[1], outs[2]),
                )

            edge_full = jax.lax.all_gather(edge_l, axis, axis=0, tiled=True)
            new_l = tiles_map(
                pass_d, pos, f_n, cls_full, edge_full, rk_step
            ).reshape(-1, 3)
            new_full = jax.lax.all_gather(new_l, axis, axis=0, tiled=True)
            row = jnp.arange(n)
            new_full = jnp.where((row < nv)[:, None], new_full, pos)
            return (new_full, f_n), cls_l

        (pos_f, nrm_f), cls_hist = jax.lax.scan(
            one_iteration, (sc.pos, sc.nrm), None, length=iters
        )
        # Unsort (replicated) and return this shard's original-order rows.
        out_pos = unsort(pos_f, sc.orig_idx)
        out_nrm = unsort(nrm_f, sc.orig_idx)
        cls_full = jax.lax.all_gather(cls_hist[-1], axis, axis=0, tiled=True)
        out_cls = unsort(cls_full[:, None], sc.orig_idx)[:, 0]
        rows = n // d
        lo = sid * rows
        return (
            jax.lax.dynamic_slice_in_dim(out_pos, lo, rows),
            jax.lax.dynamic_slice_in_dim(out_nrm, lo, rows),
            jax.lax.dynamic_slice_in_dim(out_cls, lo, rows),
        )

    f = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None)),
        out_specs=(P(axis, None), P(axis, None), P(axis)),
        check_vma=False,
    )
    out_pos, out_nrm, out_cls = f(points, normals)
    return out_pos[:n_in], out_nrm[:n_in], out_cls[:n_in]
