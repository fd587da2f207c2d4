"""Beyond-HBM multi-chip denoise: halo-ring windows, no replication.

`parallel.fused_sharded` deliberately all-gathers the full sorted cloud
onto every chip each pass round — a single ICI round against an
O(N * window) compute body, fine to ~50M points. This module is the
SURVEY §7 stage-7 design for clouds that do NOT fit one chip's HBM:

- **Distributed Morton sort** (:func:`morton_sort_sharded`): each chip
  sorts its row slice locally, then ``d`` block odd-even merge-split
  phases over a `ppermute` ring produce the globally sorted order.
  Peak per-chip memory is O(2N/d) rows — never the full cloud. (The
  0-1 principle gives correctness of block odd-even transposition
  after d phases when blocks start locally sorted.)
- **Halo-exchange iterations** (:func:`fused_denoise_halo`): a tile's
  window reaches at most ``window`` rows past the shard boundary, so
  each chip only ever needs a ``window``-row halo from each ring
  neighbor — two `ppermute` sends of (window, 3) per array per
  iteration instead of an all-gather of (N, 3). Per-chip live arrays
  are O(N/d + window); the compiled program contains NO all-gather
  (asserted by tests/test_halo.py against the optimized HLO).

Window semantics are identical to `fused_denoise_sharded`: per-tile
window start = clip(t*tile - window, 0, n - wt) GLOBALLY. The clip only
binds inside the first and last shard, where the needed rows are local;
interior tiles reach exactly ``window`` rows into the neighbor halos —
so results match the replicated engine row for row (parity-tested on
the 8-device CPU mesh).

Outputs stay in **sorted order** (plus the original-row index per row):
un-sorting is a global permutation — an all-to-all a beyond-HBM caller
does at ingest/egress, not per denoise call. Point-cloud order carries
no meaning; metrics and downstream consumers are order-free.

Reference scope note: the reference is single-GPU (NCCL appears
nowhere; Selector.py rebuilds one FLANN tree on host) — this subsystem
is TPU-native scale-out beyond the reference's ceiling.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

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
from ..ops.morton import _part1by2, MORTON_BITS
from .mesh import POINTS_AXIS

_INF = jnp.float32(jnp.inf)
_PAD_CODE = jnp.int32(2**30)


class ShardedSortedCloud(NamedTuple):
    """Morton-sorted cloud, row-sharded: shard i holds global sorted
    rows [i*rows, (i+1)*rows). Padding rows sort to the global tail."""

    pos: jnp.ndarray  # (N, 3) sharded P(axis, None)
    nrm: jnp.ndarray  # (N, 3)
    orig_idx: jnp.ndarray  # (N,) int32: sorted row -> original row
    num_valid: jnp.ndarray  # scalar int32


def _ring_perms(d: int):
    """(to_right, to_left) static ppermute pairs for a d-device line."""
    return (
        [(i, i + 1) for i in range(d - 1)],
        [(i + 1, i) for i in range(d - 1)],
    )


def _halo_exchange(arr: jnp.ndarray, window: int, axis: str, d: int):
    """(rows, c) -> (window + rows + window, c): ``window`` rows from
    each line neighbor. End shards receive zeros in the outer halo —
    never read there, because the global window clip keeps the first
    and last shard's tiles inside their own rows."""
    to_right, to_left = _ring_perms(d)
    left = jax.lax.ppermute(arr[-window:], axis, to_right)
    right = jax.lax.ppermute(arr[:window], axis, to_left)
    return jnp.concatenate([left, arr, right], axis=0)


def _local_morton_codes(pos, valid, axis):
    """Morton codes with GLOBAL quantization bounds (pmin/pmax — the
    replicated engine gets the same bounds from the full array)."""
    safe = jnp.where(valid[:, None], pos, 0.0)
    mn_l = jnp.min(jnp.where(valid[:, None], safe, jnp.inf), axis=0)
    mx_l = jnp.max(jnp.where(valid[:, None], safe, -jnp.inf), axis=0)
    mn = jax.lax.pmin(mn_l, axis)
    mx = jax.lax.pmax(mx_l, axis)
    scale = (2**MORTON_BITS - 1) / jnp.maximum(mx - mn, 1e-30)
    cell = jnp.clip(
        ((safe - mn) * scale).astype(jnp.int32), 0, 2**MORTON_BITS - 1
    )
    code = (
        _part1by2(cell[:, 0])
        | (_part1by2(cell[:, 1]) << 1)
        | (_part1by2(cell[:, 2]) << 2)
    )
    return jnp.where(valid, code, _PAD_CODE)


def _sort8(code, gid, pos, nrm):
    """Sort rows by (code, gid) carrying the payload. The gid tiebreak
    makes the order a TOTAL order, so the merge-split network and a
    monolithic sort agree exactly even on duplicate codes."""
    ops = jax.lax.sort(
        (code, gid, pos[:, 0], pos[:, 1], pos[:, 2],
         nrm[:, 0], nrm[:, 1], nrm[:, 2]),
        num_keys=2,
    )
    return ops[0], ops[1], jnp.stack(ops[2:5], 1), jnp.stack(ops[5:8], 1)


def _sort_body(pts_l, nrm_l, nv, axis: str, d: int):
    """shard-local distributed sort: local sort + d odd-even
    merge-split phases over the ring. Returns this shard's slice of the
    globally Morton-sorted cloud."""
    rows = pts_l.shape[0]
    sid = jax.lax.axis_index(axis)
    gid = sid * rows + jnp.arange(rows, dtype=jnp.int32)
    valid = gid < nv
    # Clamp padding coords finite (ops/morton.py:84-86 semantics).
    far_l = jnp.max(jnp.where(valid[:, None], pts_l, -jnp.inf), axis=0)
    far = jax.lax.pmax(far_l, axis) + 1.0
    pts_l = jnp.where(valid[:, None], pts_l, far)
    code = _local_morton_codes(pts_l, valid, axis)

    code, gid, pos, nrm = _sort8(code, gid, pts_l, nrm_l)

    for phase in range(d):
        # Even phase pairs (0,1)(2,3)...; odd phase pairs (1,2)(3,4)...
        pairs = [
            (i, i + 1) for i in range(phase % 2, d - 1, 2)
        ]
        perm = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
        has_partner = jnp.zeros((d,), jnp.bool_)
        for a, b in pairs:
            has_partner = has_partner.at[a].set(True).at[b].set(True)
        lower = jnp.zeros((d,), jnp.bool_)
        for a, _b in pairs:
            lower = lower.at[a].set(True)

        r_code = jax.lax.ppermute(code, axis, perm)
        r_gid = jax.lax.ppermute(gid, axis, perm)
        r_pos = jax.lax.ppermute(pos, axis, perm)
        r_nrm = jax.lax.ppermute(nrm, axis, perm)
        m_code, m_gid, m_pos, m_nrm = _sort8(
            jnp.concatenate([code, r_code]),
            jnp.concatenate([gid, r_gid]),
            jnp.concatenate([pos, r_pos]),
            jnp.concatenate([nrm, r_nrm]),
        )
        off = jnp.where(lower[sid], 0, rows)
        k_code = jax.lax.dynamic_slice_in_dim(m_code, off, rows)
        k_gid = jax.lax.dynamic_slice_in_dim(m_gid, off, rows)
        k_pos = jax.lax.dynamic_slice_in_dim(m_pos, off, rows)
        k_nrm = jax.lax.dynamic_slice_in_dim(m_nrm, off, rows)
        keep = has_partner[sid]
        code = jnp.where(keep, k_code, code)
        gid = jnp.where(keep, k_gid, gid)
        pos = jnp.where(keep, k_pos, pos)
        nrm = jnp.where(keep, k_nrm, nrm)
    return pos, nrm, gid


@functools.partial(
    jax.jit, static_argnames=("mesh", "axis")
)
def morton_sort_sharded(
    points: jnp.ndarray,
    normals: jnp.ndarray,
    mesh: Mesh,
    num_valid: Optional[jnp.ndarray] = None,
    axis: str = POINTS_AXIS,
) -> ShardedSortedCloud:
    """Distributed Morton sort: O(N/d) peak per-chip memory.

    N must divide by the mesh axis size. Padding rows (>= num_valid)
    must sit at the END in original order (standard pad placement)."""
    n = points.shape[0]
    nv = jnp.asarray(n if num_valid is None else num_valid, jnp.int32)
    d = mesh.shape[axis]

    f = shard_map(
        functools.partial(_sort_body, axis=axis, d=d),
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P()),
        out_specs=(P(axis, None), P(axis, None), P(axis)),
        check_vma=False,
    )
    pos, nrm, gid = f(points, normals, nv)
    return ShardedSortedCloud(pos=pos, nrm=nrm, orig_idx=gid, num_valid=nv)


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "strategy", "iterations", "mesh", "tile", "window",
        "threshold_method", "axis",
    ),
)
def fused_denoise_halo(
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
    """Windowed denoise with O(N/d + window) per-chip live memory.

    Returns (pos, nrm, classes, orig_idx) in SORTED order, row-sharded
    over ``axis`` — see the module docstring for why sorted order is
    the right egress format at this scale. Valid rows are the first
    ``num_valid`` (padding sorts to the tail); ``orig_idx`` maps each
    sorted row to its original row for callers that need to rejoin.

    Requires N % (devices * tile) == 0 after padding (done here),
    window <= N/devices, and tile | N/devices.
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
    rows = n // d
    if window > rows:
        raise ValueError(
            f"window ({window}) must not exceed rows per shard ({rows}): "
            "the halo reaches one ring neighbor only"
        )

    num_tiles = n // tile
    tiles_per_shard = num_tiles // d
    wt = min(tile + 2 * window, n)
    needs_delta = tuple(c for c in range(3) if strategy[c] in ("flat", "new"))

    def body(pts_l, nrm_l):
        pos0, nrm0, gid = _sort_body(pts_l, nrm_l, nv, axis, d)

        sid = jax.lax.axis_index(axis)
        lo = sid * rows  # first global sorted row of this shard
        my_tiles = sid * tiles_per_shard + jnp.arange(
            tiles_per_shard, dtype=jnp.int32
        )
        # Global window starts, identical clip to fused_sharded.py:107.
        starts = jnp.clip(my_tiles * tile - window, 0, n - wt)
        ext_off = starts - lo + window  # offsets into halo-extended rows
        col_of = jnp.arange(wt, dtype=jnp.int32)

        def tiles_map(fn, *ext_arrays, locals_=()):
            """fn(t, start, tile_slices_of_locals, window_slices_of_ext).

            ``ext_arrays`` carry (window + rows + window) halo-extended
            rows; ``locals_`` carry plain (rows,) shard-local rows for
            tile-row operands (thresholds, classes, edge frames)."""

            def one(i):
                t = my_tiles[i]
                tl = [
                    jax.lax.dynamic_slice_in_dim(a, i * tile, tile)
                    for a in locals_
                ]
                wn = [
                    jax.lax.dynamic_slice_in_dim(a, ext_off[i], wt)
                    for a in ext_arrays
                ]
                return fn(t, starts[i], tl, wn)

            return jax.lax.map(
                one, jnp.arange(tiles_per_shard, dtype=jnp.int32)
            )

        pos0_ext = _halo_exchange(pos0, window, axis, d)

        # Stale per-row kNN thresholds + global d threshold — frozen
        # before the iteration loop (fused_sharded.py:127-150).
        def thr_tile(t, start, _tl, wn):
            (wp,) = wn
            tp = jax.lax.dynamic_slice_in_dim(wp, t * tile - start, tile)
            dmat = _dist_tile(tp, wp, start + col_of < nv)
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

        rkf_l, rk8_l, ssum, cnt = tiles_map(thr_tile, pos0_ext)

        rk_feat = rkf_l.reshape(-1) * threshold_slack  # (rows,) local
        rk_step = rk8_l.reshape(-1) * threshold_slack
        d_thr = cfg.d_scale * jax.lax.psum(jnp.sum(ssum), axis) / jnp.maximum(
            jax.lax.psum(jnp.sum(cnt), axis), 1
        )

        def one_iteration(carry, _):
            pos, nrm = carry  # (rows, 3) shard-local, sorted order
            pos_ext = _halo_exchange(pos, window, axis, d)
            nrm_ext = _halo_exchange(nrm, window, axis, d)

            def tile_rows(wp, t, start):
                return jax.lax.dynamic_slice_in_dim(
                    wp, t * tile - start, tile
                )

            def pass_a(t, start, tl, wn):
                (trk,) = tl
                wp, wnm = wn
                tp = tile_rows(wp, t, start)
                dm = _dist_tile(tp, wp, start + col_of < nv)
                mk = (dm <= trk[:, None]) & (dm < _INF)
                dec = _nvt_tile(tp, wp, wnm, dm, mk, cfg.angle)
                tn = tile_rows(wnm, t, start)
                return voting.vu_smoothed_normals(
                    dec, tn, cfg.vu_tau, cfg.vu_damping
                )

            f_n = tiles_map(
                pass_a, pos_ext, nrm_ext, locals_=(rk_feat,)
            ).reshape(-1, 3)
            f_n_ext = _halo_exchange(f_n, window, axis, d)

            def pass_b(t, start, tl, wn):
                trk, trk8 = tl
                wp, wf = wn
                tp = tile_rows(wp, t, start)
                dm = _dist_tile(tp, wp, start + col_of < nv)
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
                pass_b, pos_ext, f_n_ext, locals_=(rk_feat, rk_step)
            )
            cls_l = cls_l.reshape(-1)
            edge_l = edge_l.reshape(-1, 3)
            centers = jax.lax.psum(jnp.sum(psums, axis=0), axis) / jnp.maximum(
                jax.lax.psum(jnp.sum(pcnts, axis=0), axis), 1.0
            )[:, None]

            deltas = {}
            if needs_delta:
                def pass_c(t, start, tl, wn):
                    tc, trk8 = tl
                    (wp,) = wn
                    tp = tile_rows(wp, t, start)
                    dm = _dist_tile(tp, wp, start + col_of < nv)
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

                dmax = tiles_map(
                    pass_c, pos_ext, locals_=(cls_l, rk_step)
                )
                for ci, c in enumerate(needs_delta):
                    deltas[c] = jax.lax.pmax(jnp.max(dmax[:, ci]), axis)

            def pass_d(t, start, tl, wn):
                tc, te, trk8 = tl
                wp, wf = wn
                tp = tile_rows(wp, t, start)
                tf = tile_rows(wf, t, start)
                dm = _dist_tile(tp, wp, start + col_of < nv)
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

            new_l = tiles_map(
                pass_d, pos_ext, f_n_ext, locals_=(cls_l, edge_l, rk_step)
            ).reshape(-1, 3)
            srow = lo + jnp.arange(rows)
            new_l = jnp.where((srow < nv)[:, None], new_l, pos)
            return (new_l, f_n), cls_l

        (pos_f, nrm_f), cls_hist = jax.lax.scan(
            one_iteration, (pos0, nrm0), None, length=iters
        )
        return pos_f, nrm_f, cls_hist[-1], gid

    f = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None)),
        out_specs=(P(axis, None), P(axis, None), P(axis), P(axis)),
        check_vma=False,
    )
    out_pos, out_nrm, out_cls, orig_idx = f(points, normals)
    # Valid rows are the first n_in of the SORTED order (pads carry the
    # max Morton code); trimming is a sharded slice, not a gather.
    return (
        out_pos[:n_in], out_nrm[:n_in], out_cls[:n_in], orig_idx[:n_in]
    )
