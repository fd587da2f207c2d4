"""Pallas fused denoise — the speed-of-light iteration on TPU.

core/fused.py already removed every random gather by reformulating the
pipeline over Morton windows, but in XLA each (T, W_t) intermediate
materializes in HBM between fusions (~20 GB of tile traffic per pass at
1M points). These kernels keep the entire per-tile computation in VMEM:
HBM traffic collapses to the packed window streams (~50x less), and the
per-pass cost drops to the VPU/MXU floor.

Same four-pass structure and identical math as fused.py (which is
parity-tested against the reference pipeline); neighbor thresholds are
the stale-mode per-point k-th distances (computed once on the noisy
input — matching the reference's KD-tree frozen at noisy positions,
Selector.py:141).

Layout contract (everything SoA, component rows over the point axis):
  GQ (16, N): 0-2 p | 3 one | 4 |p|^2 | 5-7 n | 8 rk_feat | 9 rk_step
  GR (24, N): 0-2 -2p | 3 |p|^2 | 4 one | 5-7 n | 8 p.n | 9-14 sym6(n)
              | 15-17 p
  so the distance tile is ONE MXU contraction:
  d = GQ[0:5]^T @ GR[0:5] = |q|^2 + |p|^2 - 2 q.p, and every neighbor
  sum is dot(weights (T, W_t), GR rows (R, W_t)).
Window starts are 128-aligned (pl.multiple_of) for legal dynamic DMA;
Mosaic has no acos, so the eigensolver runs with the Hastings
polynomial (ops/fastmath.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import DenoiseConfig
from ..ops.eigh3 import eigh3x3_components, vu_filter_components
from ..ops.fastmath import acos_poly
from ..ops.morton import morton_sort, unsort
from ..ops.solve3 import solve3x3_components
from .pipeline import DEFAULT_STRATEGY

_HI = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# Component-math helpers (all elementwise on (T,) arrays)
# ---------------------------------------------------------------------------


def _dot_c(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _norm_c(a):
    return jnp.sqrt(jnp.maximum(_dot_c(a, a), 0.0))


def _vu_smooth_c(w, v, n, tau, damping):
    """VU-smoothed normals, component form (Decompositionor.py:92-106)."""
    acc = [damping * n[c] for c in range(3)]
    for i in range(3):
        keep = w[i] > tau
        proj = _dot_c(v[i], n)
        for c in range(3):
            acc[c] = acc[c] + jnp.where(keep, proj * v[i][c], 0.0)
    inv = 1.0 / jnp.maximum(_norm_c(acc), 1e-12)
    return tuple(a * inv for a in acc)


def _classes_c(w, scale):
    """argmax of [scale*planarity, linearity, sphericity]
    (Decompositionor.py:65-69), first-max-wins like torch argmax."""
    lam1, lam2, lam3 = w[2], w[1], w[0]
    safe = jnp.where(jnp.abs(lam1) > 1e-30, lam1, 1e-30)
    plan = (lam1 - lam2) / safe * scale
    lin = (lam2 - lam3) / safe
    sph = lam3 / safe
    cls = jnp.zeros_like(plan)
    best = plan
    cls = jnp.where(lin > best, 1.0, cls)
    best = jnp.maximum(best, lin)
    cls = jnp.where(sph > best, 2.0, cls)
    return cls


# ---------------------------------------------------------------------------
# In-kernel tile primitives
# ---------------------------------------------------------------------------


def _mmT(a, b):
    """(R, T) x (R, W) -> (T, W) contraction over the component rows."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), precision=_HI,
        preferred_element_type=jnp.float32,
    )


def _wsum(w, row):
    """(T, W) x (W,) -> (T,): one weighted window-column sum (VPU lane
    reduce; Mosaic cannot lane-slice small MXU dot outputs)."""
    return jnp.sum(w * row[None, :], axis=1)


def _wsum_rows(w, rows, count):
    return tuple(_wsum(w, rows[r]) for r in range(count))


def _dist(tq, wr):
    return jnp.maximum(_mmT(tq[0:5], wr[0:5]), 0.0)


def _dist_slim(tq, wr):
    """Squared distances from SLIM packs (rows 0-2 = positions): build
    the 5-row [p,1,p2] x [-2p,p2,1] operands in VMEM. The (wt,)-wide
    derivations are ~20 VPU ops — far cheaper than DMAing precomputed
    rows from HBM."""
    pq, pw = tq[0:3], wr[0:3]
    p2q = jnp.sum(pq * pq, axis=0, keepdims=True)
    p2w = jnp.sum(pw * pw, axis=0, keepdims=True)
    aq = jnp.concatenate([pq, jnp.ones_like(p2q), p2q], axis=0)
    bw = jnp.concatenate([-2.0 * pw, p2w, jnp.ones_like(p2w)], axis=0)
    return jnp.maximum(_mmT(aq, bw), 0.0)


def _subtile_window(sub_starts_ref, off, wr, t, s, sub, wt_c):
    """Slice subtile ``s``'s IDEAL +-window span out of the shared DMA
    slab — boundary pairs have clipped slab starts, so the per-subtile
    start is prefetched separately (bit-identical to per-tile DMA;
    every quantity involved is a multiple of 128, keeping the
    lane-dim dynamic slice aligned)."""
    s_off = pl.multiple_of(sub_starts_ref[t * sub + s], 128)
    rel = pl.multiple_of(s_off - off, 128)
    wrs = wr[:, pl.ds(rel, wt_c)]
    return s_off, wrs


def _derive_window(wr):
    """Window features from a slim pack slice: pn, sym6 rows."""
    nw = wr[3:6]
    pn = jnp.sum(wr[0:3] * nw, axis=0)
    sym6 = (
        nw[0] * nw[0], nw[0] * nw[1], nw[0] * nw[2],
        nw[1] * nw[1], nw[1] * nw[2], nw[2] * nw[2],
    )
    return pn, sym6


def _col_valid(off, nv, wt):
    j = jax.lax.broadcasted_iota(jnp.int32, (1, wt), 1)
    return (off + j) < nv


def _nvt_eigh(tq, wr, d, mask_k, cos_rho, cross=None):
    """Filtered NVT + eigendecomposition on one tile
    (fused.py _nvt_tile, component output). ``cross`` (p_i . n_j) can be
    supplied from a shared batched dot."""
    if cross is None:
        cross = _mmT(tq[0:3], wr[5:8])  # p_i . n_j
    num = jnp.abs(wr[8][None, :] - cross)
    cosang = num * jax.lax.rsqrt(jnp.maximum(d, 1e-24))
    wf0 = ((cosang < cos_rho) & mask_k).astype(jnp.float32)
    mkf = mask_k.astype(jnp.float32)
    wsum0 = jnp.sum(wf0, axis=1, keepdims=True)
    # Zero-weight rescue; f32 select (Mosaic cannot select bools with a
    # broadcast predicate).
    wf = jnp.where(wsum0 == 0.0, mkf, wf0)
    wsum = jnp.maximum(jnp.sum(wf, axis=1), 1.0)  # (T,)
    t6 = tuple(_wsum(wf, wr[9 + r]) / wsum for r in range(6))
    return eigh3x3_components(*t6, acos_fn=acos_poly)


def _pipelined_load(
    starts_ref, gq_ref, gr_ref, t, t_sz, wt, num_tiles, tq2, wr2, sems,
    window_as_ref=False,
):
    """Double-buffered tile/window loads: issue tile t+1's DMA before
    waiting on tile t's (scratch and semaphores persist across the
    sequential grid loop, hiding the ~3.5 us DMA latency floor)."""
    slot = jax.lax.rem(t, 2)
    nxt = jax.lax.rem(t + 1, 2)

    def copies(idx, sl):
        off = pl.multiple_of(starts_ref[idx], 128)
        return (
            pltpu.make_async_copy(
                gq_ref.at[:, pl.ds(idx * t_sz, t_sz)], tq2.at[sl],
                sems.at[sl, 0],
            ),
            pltpu.make_async_copy(
                gr_ref.at[:, pl.ds(off, wt)], wr2.at[sl], sems.at[sl, 1]
            ),
        )

    @pl.when(t == 0)
    def _():
        for c in copies(t, slot):
            c.start()

    @pl.when(t + 1 < num_tiles)
    def _():
        for c in copies(jnp.minimum(t + 1, num_tiles - 1), nxt):
            c.start()

    for c in copies(t, slot):
        c.wait()
    # window_as_ref: the hybrid's shared-window subtiles slice the slab
    # with a DYNAMIC lane offset, and Mosaic lowers dynamic slices only
    # as ref loads (pl.ds), not on values — so they take a ref view.
    return tq2[slot], (wr2.at[slot] if window_as_ref else wr2[slot])


def _dma_in(refs_slices, scratches, sems):
    copies = [
        pltpu.make_async_copy(src, dst, sems.at[i])
        for i, (src, dst) in enumerate(zip(refs_slices, scratches))
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()


# ---------------------------------------------------------------------------
# Pass kernels
# ---------------------------------------------------------------------------


def _make_pass_a(t_sz, wt, nv_total, cfg: DenoiseConfig, num_tiles=None):
    import math

    cos_rho = math.cos(cfg.angle)

    def kernel(starts_ref, meta_ref, gq_ref, gr_ref, gq2_ref, gr2_ref,
               tq2_s, wr2_s, sems):
        t = pl.program_id(0)
        off = pl.multiple_of(starts_ref[t], 128)
        nv = meta_ref[0]
        tq, wr = _pipelined_load(
            starts_ref, gq_ref, gr_ref, t, t_sz, wt, num_tiles, tq2_s,
            wr2_s, sems,
        )
        d = _dist(tq, wr)
        d = jnp.where(_col_valid(off, nv, wt), d, jnp.float32(1e30))
        rkf = jnp.transpose(tq[8:9, :])  # (T, 1)
        mk = (d <= rkf) & (d < 1e30)
        w, v = _nvt_eigh(tq, wr, d, mk, cos_rho)
        n_i = (tq[5], tq[6], tq[7])
        f = _vu_smooth_c(w, v, n_i, cfg.vu_tau, cfg.vu_damping)
        # Emit next-stage packs directly (no XLA repack between passes):
        # GQ2 = pos rows of GQ with normals replaced by f_n; GR2 likewise
        # with the derived rows (p.n, sym6) rebuilt in-register.
        gq2 = jnp.concatenate(
            [tq[0:5],
             f[0][None, :], f[1][None, :], f[2][None, :],
             tq[8:16]],
            axis=0,
        )
        p = (tq[0], tq[1], tq[2])
        pn = _dot_c(p, f)
        gr2 = jnp.concatenate(
            [-2.0 * tq[0:3], tq[4:5], tq[3:4],
             f[0][None, :], f[1][None, :], f[2][None, :],
             pn[None, :],
             (f[0] * f[0])[None, :], (f[0] * f[1])[None, :],
             (f[0] * f[2])[None, :], (f[1] * f[1])[None, :],
             (f[1] * f[2])[None, :], (f[2] * f[2])[None, :],
             tq[0:3],
             jnp.zeros((6, t_sz), jnp.float32)],
            axis=0,
        )
        gq2_ref[...] = gq2
        gr2_ref[...] = gr2

    return kernel


def _make_pass_b(t_sz, wt, cfg: DenoiseConfig, needs_delta, lagged=False):
    import math

    cos_rho = math.cos(cfg.angle)

    def kernel(starts_ref, meta_ref, gq_ref, gr_ref, scal_ref, cls_ref,
               part_ref, tq_s, wr_s, sems):
        t = pl.program_id(0)
        off = pl.multiple_of(starts_ref[t], 128)
        nv = meta_ref[0]
        _dma_in(
            (gq_ref.at[:, pl.ds(t * t_sz, t_sz)], gr_ref.at[:, pl.ds(off, wt)]),
            (tq_s, wr_s),
            sems,
        )
        tq, wr = tq_s[...], wr_s[...]
        d = _dist(tq, wr)
        d = jnp.where(_col_valid(off, nv, wt), d, jnp.float32(1e30))
        rkf = jnp.transpose(tq[8:9, :])
        mk = (d <= rkf) & (d < 1e30)
        w, v = _nvt_eigh(tq, wr, d, mk, cos_rho)
        cls = _classes_c(w, cfg.class_scale)
        edge = v[0]  # smallest-eigenvalue eigenvector

        out = jnp.concatenate(
            [cls[None, :], edge[0][None, :], edge[1][None, :],
             edge[2][None, :], jnp.zeros((4, t_sz), jnp.float32)],
            axis=0,
        )
        cls_ref[...] = out

        # Delta mean partials per class needing one.
        rk8 = jnp.transpose(tq[9:10, :])
        m8 = ((d <= rk8) & (d < 1e30)).astype(jnp.float32)
        row_valid = (
            t * t_sz + jax.lax.broadcasted_iota(jnp.int32, (t_sz, 1), 0)
        ) < nv
        # Per-tile scalars are encoded in lane 0 of a (16, T) block
        # (Mosaic requires lane-dim blocks of 128+; the XLA glue reads
        # parts.reshape(16, num_tiles, T)[..., 0]).
        lane0 = (
            jax.lax.broadcasted_iota(jnp.int32, (1, t_sz), 1) == 0
        ).astype(jnp.float32)
        rows = []
        for ci, c in enumerate(needs_delta):
            mrow = jnp.where(
                (cls[:, None] == float(c)) & row_valid, 1.0, 0.0
            )
            mc = m8 * mrow  # (T, W)
            # Full-reduce per component (lane-sliced reduces of a dot
            # output hit Mosaic's "offset change" limitation).
            for comp in range(3):
                rows.append(jnp.sum(mc * wr[15 + comp][None, :]) * lane0)
            rows.append(jnp.sum(mc) * lane0)
            if lagged:
                # Max distance^2 to the PREVIOUS iteration's class
                # center (one-iteration lag folds pass C away; the
                # delta is a slowly-varying global scale).
                cen = (
                    scal_ref[4 + ci, 0], scal_ref[4 + ci, 1],
                    scal_ref[4 + ci, 2],
                )
                dist2 = (
                    wr[3]
                    + (wr[0] * cen[0] + wr[1] * cen[1] + wr[2] * cen[2])
                    + (cen[0] ** 2 + cen[1] ** 2 + cen[2] ** 2)
                )
                rows.append(jnp.max(mc * dist2[None, :]) * lane0)
        while len(rows) < 16:
            rows.append(jnp.zeros((1, t_sz), jnp.float32))
        part_ref[...] = jnp.concatenate(rows, axis=0)

    return kernel


def _make_pass_c(t_sz, wt, cfg: DenoiseConfig, needs_delta):
    def kernel(starts_ref, meta_ref, gq_ref, gr_ref, cls_in_ref, scal_ref,
               maxp_ref, tq_s, wr_s, tc_s, sems):
        t = pl.program_id(0)
        off = pl.multiple_of(starts_ref[t], 128)
        nv = meta_ref[0]
        _dma_in(
            (
                gq_ref.at[:, pl.ds(t * t_sz, t_sz)],
                gr_ref.at[:, pl.ds(off, wt)],
                cls_in_ref.at[:, pl.ds(t * t_sz, t_sz)],
            ),
            (tq_s, wr_s, tc_s),
            sems,
        )
        tq, wr, tc = tq_s[...], wr_s[...], tc_s[...]
        d = _dist(tq, wr)
        d = jnp.where(_col_valid(off, nv, wt), d, jnp.float32(1e30))
        rk8 = jnp.transpose(tq[9:10, :])
        m8 = (d <= rk8) & (d < 1e30)
        row_valid = (
            t * t_sz + jax.lax.broadcasted_iota(jnp.int32, (t_sz, 1), 0)
        ) < nv
        cls = tc[0]
        lane0 = (
            jax.lax.broadcasted_iota(jnp.int32, (1, t_sz), 1) == 0
        ).astype(jnp.float32)
        rows = []
        for ci, c in enumerate(needs_delta):
            cen = (scal_ref[4 + ci, 0], scal_ref[4 + ci, 1], scal_ref[4 + ci, 2])
            # ||p_j - cen||^2 per window col from pack rows.
            dist2 = (
                wr[3]
                + (wr[0] * cen[0] + wr[1] * cen[1] + wr[2] * cen[2])
                + (cen[0] ** 2 + cen[1] ** 2 + cen[2] ** 2)
            )  # |p|^2 - 2 p.c + |c|^2  (rows 0-2 are already -2p)
            m = m8 & (cls[:, None] == float(c)) & row_valid
            masked = jnp.where(m, dist2[None, :], 0.0)
            rows.append(jnp.max(masked) * lane0)
        while len(rows) < 8:
            rows.append(jnp.zeros((1, t_sz), jnp.float32))
        maxp_ref[...] = jnp.concatenate(rows, axis=0)

    return kernel


def _make_pass_d(t_sz, wt, cfg: DenoiseConfig, strategy, needs_delta):
    alphas = cfg.alphas
    delta_slot = {c: i for i, c in enumerate(needs_delta)}

    def kernel(starts_ref, meta_ref, gq_ref, gr_ref, cls_in_ref, scal_ref,
               out_ref, tq_s, wr_s, tc_s, sems):
        t = pl.program_id(0)
        off = pl.multiple_of(starts_ref[t], 128)
        nv = meta_ref[0]
        _dma_in(
            (
                gq_ref.at[:, pl.ds(t * t_sz, t_sz)],
                gr_ref.at[:, pl.ds(off, wt)],
                cls_in_ref.at[:, pl.ds(t * t_sz, t_sz)],
            ),
            (tq_s, wr_s, tc_s),
            sems,
        )
        tq, wr, tc = tq_s[...], wr_s[...], tc_s[...]
        d = _dist(tq, wr)
        d = jnp.where(_col_valid(off, nv, wt), d, jnp.float32(1e30))
        rk8 = jnp.transpose(tq[9:10, :])
        m8f = ((d <= rk8) & (d < 1e30)).astype(jnp.float32)

        d_thr = scal_ref[0, 0]
        p_i = (tq[0], tq[1], tq[2])
        n_i = (tq[5], tq[6], tq[7])
        cls = tc[0]

        deg = jnp.sum(m8f, axis=1)  # (T,)
        s6 = _wsum_rows(m8f, wr[9:15], 6)  # 6 x (T,)
        # n (n.p) window rows built in-register.
        nnv = wr[5:8] * wr[8][None, :]  # (3, W)
        b_nv = _wsum_rows(m8f, nnv, 3)  # 3 x (T,)
        sv = _wsum_rows(m8f, wr[15:18], 3)
        pdotn = _mmT(tq[0:3], wr[5:8])  # (T, W) p_i . n_j
        dotj = wr[8][None, :] - pdotn  # n_j . (p_j - p_i)

        def srow(t6):
            return (
                (t6[0], t6[1], t6[2]),
                (t6[1], t6[3], t6[4]),
                (t6[2], t6[4], t6[5]),
            )

        def clamp(opt, alpha, strict=True):
            di = tuple((o - p) * alpha for o, p in zip(opt, p_i))
            nrm = _norm_c(di)
            ok = nrm < d_thr if strict else nrm <= d_thr
            return tuple(
                jnp.where(ok, p + dd, p) for p, dd in zip(p_i, di)
            )

        def three_term(s6_w, b_nv_w, sv_w):
            """feature/new system (Denoiser.py:144-162); deg stays raw."""
            nio = (
                (n_i[0] * n_i[0], n_i[0] * n_i[1], n_i[0] * n_i[2]),
                (n_i[0] * n_i[1], n_i[1] * n_i[1], n_i[1] * n_i[2]),
                (n_i[0] * n_i[2], n_i[1] * n_i[2], n_i[2] * n_i[2]),
            )
            sr = srow(s6_w)
            rows = tuple(
                tuple(
                    (1.0 if a == b else 0.0)
                    + nio[a][b] * (1.0 + deg)
                    + sr[a][b]
                    for b in range(3)
                )
                for a in range(3)
            )
            niv = _dot_c(nio[0], p_i), _dot_c(nio[1], p_i), _dot_c(nio[2], p_i)
            nisv = _dot_c(nio[0], sv_w), _dot_c(nio[1], sv_w), _dot_c(nio[2], sv_w)
            b = tuple(
                p_i[c] + niv[c] + nisv[c] + b_nv_w[c] for c in range(3)
            )
            opt, _ = solve3x3_components(rows, b, p_i)
            return opt

        results = {}
        for cid in range(3):
            name = strategy[cid]
            key = cid  # alphas are per-class; never share across classes
            if name == "flat":
                delta = scal_ref[1 + delta_slot[cid], 0]
                d2 = jnp.maximum(delta * delta, 1e-30)
                ninj = _mmT(tq[5:8], wr[5:8])
                sim = jnp.exp(-16.0 * (2.0 - 2.0 * ninj) / d2)
                close = jnp.exp(-4.0 * jnp.where(d < 1e30, d, 0.0) / d2)
                wb = sim * close * m8f
                num = jnp.sum(wb * dotj, axis=1)
                wsum = jnp.maximum(jnp.sum(wb, axis=1), 1e-30)
                scalef = num / wsum * alphas[cid]
                di = tuple(scalef * n for n in n_i)
                nrm = _norm_c(di)
                results[key] = tuple(
                    jnp.where(nrm <= d_thr, p + dd, p)
                    for p, dd in zip(p_i, di)
                )
            elif name == "edge":
                y = (tc[1], tc[2], tc[3])
                ny = _mmT(tc[1:4], wr[5:8])  # (T, W) n_j . y_i
                py = _mmT(tc[1:4], wr[15:18])  # (T, W) p_j . y_i
                q_yy = _wsum_rows(m8f * ny * py, wr[5:8], 3)
                sr = srow(s6)
                sy = tuple(_dot_c(sr[a], y) for a in range(3))
                ysy = _dot_c(sy, y)
                rows = tuple(
                    tuple(
                        sr[a][b]
                        - y[a] * sy[b]
                        - sy[a] * y[b]
                        + ysy * y[a] * y[b]
                        + deg * y[a] * y[b]
                        for b in range(3)
                    )
                    for a in range(3)
                )
                z = tuple(b_nv[c] - q_yy[c] for c in range(3))
                yz = _dot_c(y, z)
                yp = _dot_c(y, p_i)
                b = tuple(
                    z[c] - yz * y[c] + deg * yp * y[c] for c in range(3)
                )
                opt, _ = solve3x3_components(rows, b, p_i)
                results[key] = clamp(opt, alphas[cid])
            elif name == "corner":
                opt, _ = solve3x3_components(srow(s6), b_nv, p_i)
                results[key] = clamp(opt, alphas[cid])
            elif name == "feature":
                results[key] = clamp(three_term(s6, b_nv, sv), alphas[cid])
            elif name == "new":
                delta = scal_ref[1 + delta_slot[cid], 0]
                d2 = jnp.maximum(delta * delta, 1e-30)
                like = jnp.exp(-9.0 * dotj * dotj / d2) * m8f
                s6w = _wsum_rows(like, wr[9:15], 6)
                b_nvw = _wsum_rows(like, nnv, 3)
                svw = _wsum_rows(like, wr[15:18], 3)
                results[key] = clamp(
                    three_term(s6w, b_nvw, svw), alphas[cid]
                )
            elif name == "dummy":
                results[key] = p_i
            else:
                raise ValueError(name)

        out = [results[0], results[1], results[2]]
        new_p = tuple(
            jnp.where(
                cls == 0.0, out[0][c], jnp.where(cls == 1.0, out[1][c], out[2][c])
            )
            for c in range(3)
        )
        out_ref[...] = jnp.concatenate(
            [new_p[0][None, :], new_p[1][None, :], new_p[2][None, :],
             jnp.zeros((5, t_sz), jnp.float32)],
            axis=0,
        )

    return kernel




def _make_pass_bd(t_sz, wt, cfg: DenoiseConfig, strategy, needs_delta,
                  num_tiles=None):
    """Fused pass B+D for lagged-delta mode: one distance tile feeds
    NVT2 -> classification -> the vertex updates, plus next-iteration
    delta partials — two passes' work, one window stream."""
    import math

    cos_rho = math.cos(cfg.angle)
    alphas = cfg.alphas
    delta_slot = {c: i for i, c in enumerate(needs_delta)}

    def kernel(starts_ref, meta_ref, gq_ref, gr_ref, scal_ref,
               gq_ref_out, gr_ref_out, part_ref, tq2_s, wr2_s, sems):
        t = pl.program_id(0)
        off = pl.multiple_of(starts_ref[t], 128)
        nv = meta_ref[0]
        tq, wr = _pipelined_load(
            starts_ref, gq_ref, gr_ref, t, t_sz, wt, num_tiles, tq2_s,
            wr2_s, sems,
        )
        d = _dist(tq, wr)
        d = jnp.where(_col_valid(off, nv, wt), d, jnp.float32(1e30))

        # ---- B part: NVT2 -> classes + edge directions ---------------
        rkf = jnp.transpose(tq[8:9, :])
        mk = (d <= rkf) & (d < 1e30)
        cross0 = _mmT(tq[0:3], wr[5:8])
        w, v = _nvt_eigh(tq, wr, d, mk, cos_rho, cross=cross0)
        cls = _classes_c(w, cfg.class_scale)
        edge = v[0]
        e2d = jnp.concatenate(
            [edge[0][None, :], edge[1][None, :], edge[2][None, :]], axis=0
        )  # (3, T) for the edge-step MXU products

        # ---- D part: class-dispatched updates -------------------------
        rk8 = jnp.transpose(tq[9:10, :])
        m8f = ((d <= rk8) & (d < 1e30)).astype(jnp.float32)
        d_thr = scal_ref[0, 0]
        p_i = (tq[0], tq[1], tq[2])
        n_i = (tq[5], tq[6], tq[7])

        deg = jnp.sum(m8f, axis=1)
        s6 = _wsum_rows(m8f, wr[9:15], 6)
        nnv = wr[5:8] * wr[8][None, :]
        b_nv = _wsum_rows(m8f, nnv, 3)
        sv = _wsum_rows(m8f, wr[15:18], 3)
        # pdotn == cross0 (shared with the NVT weight computation).
        dotj = wr[8][None, :] - cross0
        lhs_b = jnp.stack([tq[5:8], e2d, e2d], axis=0)  # (3, 3, T)
        rhs_b = jnp.stack([wr[5:8], wr[5:8], wr[15:18]], axis=0)
        bdots = jax.lax.dot_general(
            lhs_b, rhs_b, (((1,), (1,)), ((0,), (0,))), precision=_HI,
            preferred_element_type=jnp.float32,
        )  # (3, T, W): ninj, ny, py
        ninj_b, ny_b, py_b = bdots[0], bdots[1], bdots[2]

        def srow(t6):
            return (
                (t6[0], t6[1], t6[2]),
                (t6[1], t6[3], t6[4]),
                (t6[2], t6[4], t6[5]),
            )

        def clamp(opt, alpha, strict=True):
            di = tuple((o - p) * alpha for o, p in zip(opt, p_i))
            nrm = _norm_c(di)
            ok = nrm < d_thr if strict else nrm <= d_thr
            return tuple(jnp.where(ok, p + dd, p) for p, dd in zip(p_i, di))

        def three_term(s6_w, b_nv_w, sv_w):
            nio = (
                (n_i[0] * n_i[0], n_i[0] * n_i[1], n_i[0] * n_i[2]),
                (n_i[0] * n_i[1], n_i[1] * n_i[1], n_i[1] * n_i[2]),
                (n_i[0] * n_i[2], n_i[1] * n_i[2], n_i[2] * n_i[2]),
            )
            sr = srow(s6_w)
            rows = tuple(
                tuple(
                    (1.0 if a == b else 0.0)
                    + nio[a][b] * (1.0 + deg)
                    + sr[a][b]
                    for b in range(3)
                )
                for a in range(3)
            )
            niv = _dot_c(nio[0], p_i), _dot_c(nio[1], p_i), _dot_c(nio[2], p_i)
            nisv = _dot_c(nio[0], sv_w), _dot_c(nio[1], sv_w), _dot_c(nio[2], sv_w)
            b = tuple(p_i[c] + niv[c] + nisv[c] + b_nv_w[c] for c in range(3))
            opt, _ = solve3x3_components(rows, b, p_i)
            return opt

        results = {}
        for cid in range(3):
            name = strategy[cid]
            key = cid
            if name == "flat":
                delta = scal_ref[1 + delta_slot[cid], 0]
                d2 = jnp.maximum(delta * delta, 1e-30)
                sim = jnp.exp(-16.0 * (2.0 - 2.0 * ninj_b) / d2)
                close = jnp.exp(-4.0 * jnp.where(d < 1e30, d, 0.0) / d2)
                wb = sim * close * m8f
                num = jnp.sum(wb * dotj, axis=1)
                wsum = jnp.maximum(jnp.sum(wb, axis=1), 1e-30)
                scalef = num / wsum * alphas[cid]
                di = tuple(scalef * n for n in n_i)
                nrm = _norm_c(di)
                results[key] = tuple(
                    jnp.where(nrm <= d_thr, p + dd, p)
                    for p, dd in zip(p_i, di)
                )
            elif name == "edge":
                y = edge
                q_yy = _wsum_rows(m8f * ny_b * py_b, wr[5:8], 3)
                sr = srow(s6)
                sy = tuple(_dot_c(sr[a], y) for a in range(3))
                ysy = _dot_c(sy, y)
                rows = tuple(
                    tuple(
                        sr[a][b]
                        - y[a] * sy[b]
                        - sy[a] * y[b]
                        + ysy * y[a] * y[b]
                        + deg * y[a] * y[b]
                        for b in range(3)
                    )
                    for a in range(3)
                )
                z = tuple(b_nv[c] - q_yy[c] for c in range(3))
                yz = _dot_c(y, z)
                yp = _dot_c(y, p_i)
                b = tuple(z[c] - yz * y[c] + deg * yp * y[c] for c in range(3))
                opt, _ = solve3x3_components(rows, b, p_i)
                results[key] = clamp(opt, alphas[cid])
            elif name == "corner":
                opt, _ = solve3x3_components(srow(s6), b_nv, p_i)
                results[key] = clamp(opt, alphas[cid])
            elif name == "feature":
                results[key] = clamp(three_term(s6, b_nv, sv), alphas[cid])
            elif name == "new":
                delta = scal_ref[1 + delta_slot[cid], 0]
                d2 = jnp.maximum(delta * delta, 1e-30)
                like = jnp.exp(-9.0 * dotj * dotj / d2) * m8f
                s6w = _wsum_rows(like, wr[9:15], 6)
                b_nvw = _wsum_rows(like, nnv, 3)
                svw = _wsum_rows(like, wr[15:18], 3)
                results[key] = clamp(three_term(s6w, b_nvw, svw), alphas[cid])
            elif name == "dummy":
                results[key] = p_i
            else:
                raise ValueError(name)

        out = [results[0], results[1], results[2]]
        new_p = tuple(
            jnp.where(
                cls == 0.0, out[0][c], jnp.where(cls == 1.0, out[1][c], out[2][c])
            )
            for c in range(3)
        )
        # Pin padding rows (sorted padding sits past nv).
        rv = (
            t * t_sz + jax.lax.broadcasted_iota(jnp.int32, (t_sz,), 0)
        ) < nv
        new_p = tuple(
            jnp.where(rv, np_, p0_) for np_, p0_ in zip(new_p, p_i)
        )
        # Emit next iteration's packs: pos = new_p, normals = f_n (the
        # smoothed normals this iteration ran with, GQ rows 5-7).
        np2 = new_p[0] ** 2 + new_p[1] ** 2 + new_p[2] ** 2
        fn = n_i
        pn_next = new_p[0] * fn[0] + new_p[1] * fn[1] + new_p[2] * fn[2]
        gq_next = jnp.concatenate(
            [new_p[0][None, :], new_p[1][None, :], new_p[2][None, :],
             tq[3:4], np2[None, :],
             fn[0][None, :], fn[1][None, :], fn[2][None, :],
             tq[8:16]],
            axis=0,
        )
        gr_next = jnp.concatenate(
            [(-2.0 * new_p[0])[None, :], (-2.0 * new_p[1])[None, :],
             (-2.0 * new_p[2])[None, :],
             np2[None, :], tq[3:4],
             fn[0][None, :], fn[1][None, :], fn[2][None, :],
             pn_next[None, :],
             (fn[0] * fn[0])[None, :], (fn[0] * fn[1])[None, :],
             (fn[0] * fn[2])[None, :], (fn[1] * fn[1])[None, :],
             (fn[1] * fn[2])[None, :], (fn[2] * fn[2])[None, :],
             new_p[0][None, :], new_p[1][None, :], new_p[2][None, :],
             jnp.zeros((6, t_sz), jnp.float32)],
            axis=0,
        )
        gq_ref_out[...] = gq_next
        gr_ref_out[...] = gr_next

        # ---- next-iteration delta partials ----------------------------
        row_valid = (
            t * t_sz + jax.lax.broadcasted_iota(jnp.int32, (t_sz, 1), 0)
        ) < nv
        lane0 = (
            jax.lax.broadcasted_iota(jnp.int32, (1, t_sz), 1) == 0
        ).astype(jnp.float32)
        rows_out = []
        for ci, c in enumerate(needs_delta):
            mrow = jnp.where((cls[:, None] == float(c)) & row_valid, 1.0, 0.0)
            mc = m8f * mrow
            for comp in range(3):
                rows_out.append(jnp.sum(mc * wr[15 + comp][None, :]) * lane0)
            rows_out.append(jnp.sum(mc) * lane0)
            cen = (
                scal_ref[4 + ci, 0], scal_ref[4 + ci, 1], scal_ref[4 + ci, 2],
            )
            dist2 = (
                wr[3]
                + (wr[0] * cen[0] + wr[1] * cen[1] + wr[2] * cen[2])
                + (cen[0] ** 2 + cen[1] ** 2 + cen[2] ** 2)
            )
            rows_out.append(jnp.max(mc * dist2[None, :]) * lane0)
        while len(rows_out) < 15:
            rows_out.append(jnp.zeros((1, t_sz), jnp.float32))
        # Row 15 carries the per-point classes for the caller.
        rows_out.append(cls[None, :])
        part_ref[...] = jnp.concatenate(rows_out, axis=0)

    return kernel


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------


def _build_packs(pos, nrm):
    """pos, nrm: (3, N) SoA rows -> (GQ (16,N), GR (24,N)) minus rk rows
    (filled by the caller)."""
    n = pos.shape[1]
    one = jnp.ones((1, n), jnp.float32)
    zero = jnp.zeros((1, n), jnp.float32)
    p2 = jnp.sum(pos * pos, axis=0, keepdims=True)
    pn = jnp.sum(pos * nrm, axis=0, keepdims=True)
    sym6 = jnp.concatenate(
        [
            (nrm[0] * nrm[0])[None], (nrm[0] * nrm[1])[None],
            (nrm[0] * nrm[2])[None], (nrm[1] * nrm[1])[None],
            (nrm[1] * nrm[2])[None], (nrm[2] * nrm[2])[None],
        ],
        axis=0,
    )
    gq = jnp.concatenate(
        [pos, one, p2, nrm, zero, zero, jnp.zeros((6, n), jnp.float32)], axis=0
    )
    gr = jnp.concatenate(
        [-2.0 * pos, p2, one, nrm, pn, sym6, pos, jnp.zeros((6, n), jnp.float32)],
        axis=0,
    )
    return gq, gr


def _set_rk(gq, rk_feat, rk_step):
    return gq.at[8].set(rk_feat).at[9].set(rk_step)


def _build_pack_slim(pos, nrm):
    """The hybrid engine's 8-row pack [p(3), n(3), rk_feat, rk_step]:
    every derived window feature (p^2, pn, n (x) n, ...) is computed
    in-VMEM by the kernels instead of being DMA'd — 16-vs-40 rows of
    HBM traffic per point per iteration, and the tile/window loads both
    slice this ONE array."""
    n = pos.shape[1]
    return jnp.concatenate([pos, nrm, jnp.zeros((2, n), jnp.float32)], axis=0)


def _set_rk_slim(pk, rk_feat, rk_step):
    return pk.at[6].set(rk_feat).at[7].set(rk_step)


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "strategy", "iterations", "tile", "window",
        "threshold_method", "delta_mode", "interpret",
    ),
)
def pallas_denoise(
    points: jnp.ndarray,
    normals: jnp.ndarray,
    cfg: DenoiseConfig = DenoiseConfig(),
    strategy: tuple[str, str, str] = DEFAULT_STRATEGY,
    iterations: Optional[int] = None,
    num_valid: Optional[jnp.ndarray] = None,
    tile: int = 256,
    window: int = 128,
    threshold_method: str = "approx",
    threshold_slack: float = 1.05,
    delta_mode: str = "exact",
    interpret: bool = False,
):
    """Pallas twin of fused.fused_denoise in stale-threshold mode.

    ``delta_mode``: "exact" runs a dedicated pass for the flat-step
    spread scale; "lagged" reuses the previous iteration's class centers
    (initialized from the cloud centroid/radius), folding that pass
    away — the scale varies slowly, so the lag is negligible against
    the stale-threshold approximation already in effect.

    Returns (points, normals, classes) in original order.
    """
    iters = cfg.iterations if iterations is None else iterations
    n_in = points.shape[0]
    nv = jnp.asarray(n_in if num_valid is None else num_valid, jnp.int32)

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
    meta = jnp.asarray([nv], jnp.int32)
    needs_delta = tuple(c for c in range(3) if strategy[c] in ("flat", "new"))

    # ---- one-time XLA prologue: d_thr and stale k-th thresholds --------
    from .fused import _dist_tile, _kth_smallest

    col_of = jnp.arange(wt, dtype=jnp.int32)

    def prologue(t):
        off = starts[t]
        tp = jax.lax.dynamic_slice_in_dim(sc.pos, t * tile, tile)
        wp = jax.lax.dynamic_slice_in_dim(sc.pos, off, wt)
        d = _dist_tile(tp, wp, off + col_of < nv)
        rkf = _kth_smallest(d, cfg.feature_k, threshold_method)
        rk8 = _kth_smallest(d, cfg.step_k, threshold_method)
        d6 = -jax.lax.top_k(-d, 6)[0]
        dist6 = jnp.sqrt(jnp.where(jnp.isfinite(d6), d6, 0.0))
        row_ok = (t * tile + jnp.arange(tile)) < nv
        ssum = jnp.sum(jnp.where(row_ok[:, None], dist6, 0.0))
        cnt = jnp.sum(row_ok) * 6
        return rkf, rk8, ssum, cnt

    rkf, rk8, ssums, cnts = jax.lax.map(
        prologue, jnp.arange(num_tiles, dtype=jnp.int32)
    )
    rk_feat = rkf.reshape(n) * threshold_slack
    rk_step = rk8.reshape(n) * threshold_slack
    d_thr = cfg.d_scale * jnp.sum(ssums) / jnp.maximum(jnp.sum(cnts), 1)

    # ---- pallas_call wrappers ------------------------------------------
    def gridspec(n_in_specs, extra_scratch=()):
        return pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(num_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_in_specs,
            out_specs=None,  # set per call
            scratch_shapes=list(extra_scratch),
        )

    sem2 = pltpu.SemaphoreType.DMA((2,))
    sem22 = pltpu.SemaphoreType.DMA((2, 2))
    sem3 = pltpu.SemaphoreType.DMA((3,))
    scr_tq = pltpu.VMEM((16, tile), jnp.float32)
    scr_wr = pltpu.VMEM((24, wt), jnp.float32)
    scr_tq2 = pltpu.VMEM((2, 16, tile), jnp.float32)
    scr_wr2 = pltpu.VMEM((2, 24, wt), jnp.float32)
    scr_tc = pltpu.VMEM((8, tile), jnp.float32)

    pass_a = pl.pallas_call(
        _make_pass_a(tile, wt, n, cfg, num_tiles=num_tiles),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(num_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
            out_specs=(
                pl.BlockSpec((16, tile), lambda t, *_: (0, t)),
                pl.BlockSpec((24, tile), lambda t, *_: (0, t)),
            ),
            scratch_shapes=[scr_tq2, scr_wr2, sem22],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((16, n), jnp.float32),
            jax.ShapeDtypeStruct((24, n), jnp.float32),
        ),
        interpret=interpret,
    )

    lagged = delta_mode == "lagged"
    pass_bd = pl.pallas_call(
        _make_pass_bd(tile, wt, cfg, strategy, needs_delta,
                      num_tiles=num_tiles),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((8, 128), lambda t, *_: (0, 0)),
            ],
            out_specs=(
                pl.BlockSpec((16, tile), lambda t, *_: (0, t)),
                pl.BlockSpec((24, tile), lambda t, *_: (0, t)),
                pl.BlockSpec((16, tile), lambda t, *_: (0, t)),
            ),
            scratch_shapes=[scr_tq2, scr_wr2, sem22],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((16, n), jnp.float32),
            jax.ShapeDtypeStruct((24, n), jnp.float32),
            jax.ShapeDtypeStruct((16, n), jnp.float32),
        ),
        interpret=interpret,
    ) if lagged else None
    pass_b = pl.pallas_call(
        _make_pass_b(tile, wt, cfg, needs_delta, lagged=lagged),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((8, 128), lambda t, *_: (0, 0)),
            ],
            out_specs=(
                pl.BlockSpec((8, tile), lambda t, *_: (0, t)),
                pl.BlockSpec((16, tile), lambda t, *_: (0, t)),
            ),
            scratch_shapes=[scr_tq, scr_wr, sem2],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((8, n), jnp.float32),
            jax.ShapeDtypeStruct((16, n), jnp.float32),
        ),
        interpret=interpret,
    )

    pass_c = pl.pallas_call(
        _make_pass_c(tile, wt, cfg, needs_delta),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((8, 128), lambda t, *_: (0, 0)),
            ],
            out_specs=pl.BlockSpec((8, tile), lambda t, *_: (0, t)),
            scratch_shapes=[scr_tq, scr_wr, scr_tc, sem3],
        ),
        out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
        interpret=interpret,
    )

    pass_d = pl.pallas_call(
        _make_pass_d(tile, wt, cfg, strategy, needs_delta),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((8, 128), lambda t, *_: (0, 0)),
            ],
            out_specs=pl.BlockSpec((8, tile), lambda t, *_: (0, t)),
            scratch_shapes=[scr_tq, scr_wr, scr_tc, sem3],
        ),
        out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
        interpret=interpret,
    )

    pos0 = sc.pos.T  # (3, N) SoA
    nrm0 = sc.nrm.T

    # Initial lag state: cloud centroid + radius for every delta class.
    valid_cols = (jnp.arange(n) < nv)[None, :]
    vcnt = jnp.maximum(jnp.sum(valid_cols), 1)
    centroid = jnp.sum(jnp.where(valid_cols, pos0, 0.0), axis=1) / vcnt
    radius0 = jnp.sqrt(
        jnp.max(
            jnp.where(
                valid_cols[0],
                jnp.sum((pos0 - centroid[:, None]) ** 2, axis=0),
                0.0,
            )
        )
    )
    scal0 = jnp.zeros((8, 128), jnp.float32).at[0, 0].set(d_thr)
    for ci in range(len(needs_delta)):
        scal0 = scal0.at[1 + ci, 0].set(radius0)
        scal0 = scal0.at[4 + ci, 0:3].set(centroid)

    gq0, gr0 = _build_packs(pos0, nrm0)
    gq0 = _set_rk(gq0, rk_feat, rk_step)

    def one_iteration(carry, _):
        gq, gr, scal_prev = carry  # (16,N), (24,N), (8,128)

        gq2, gr2 = pass_a(starts, meta, gq, gr)

        scal = jnp.zeros((8, 128), jnp.float32).at[0, 0].set(d_thr)
        if lagged:
            # Single fused B+D pass using the PREVIOUS iteration's
            # centers/deltas; emits next iteration's packs directly.
            gq_n, gr_n, parts = pass_bd(starts, meta, gq2, gr2, scal_prev)
            cls_row = parts[15]
            ptile = parts.reshape(16, num_tiles, tile)[:, :, 0]
            for ci, _c in enumerate(needs_delta):
                base = 5 * ci
                psum = jnp.sum(ptile[base : base + 3], axis=1)
                cnt = jnp.maximum(jnp.sum(ptile[base + 3]), 1.0)
                scal = scal.at[4 + ci, 0:3].set(psum / cnt)
                delta = jnp.sqrt(jnp.maximum(jnp.max(ptile[base + 4]), 0.0))
                scal = scal.at[1 + ci, 0].set(delta)
            return (gq_n, gr_n, scal), cls_row

        cls_pack, parts = pass_b(starts, meta, gq2, gr2, scal_prev)
        cls_row = cls_pack[0]
        if needs_delta:
            # parts rows per class ci: [psum(3), cnt]; tile scalars
            # in lane 0 of each (16, T) block.
            ptile = parts.reshape(16, num_tiles, tile)[:, :, 0]
            for ci, _c in enumerate(needs_delta):
                base = 4 * ci
                psum = jnp.sum(ptile[base : base + 3], axis=1)
                cnt = jnp.maximum(jnp.sum(ptile[base + 3]), 1.0)
                scal = scal.at[4 + ci, 0:3].set(psum / cnt)
            maxp = pass_c(starts, meta, gq2, gr2, cls_pack, scal)
            mtile = maxp.reshape(8, num_tiles, tile)[:, :, 0]
            for ci, _c in enumerate(needs_delta):
                delta = jnp.sqrt(jnp.maximum(jnp.max(mtile[ci]), 0.0))
                scal = scal.at[1 + ci, 0].set(delta)
        newp = pass_d(starts, meta, gq2, gr2, cls_pack, scal)
        new_pos = jnp.where(valid_cols, newp[0:3], gq[0:3])
        f_n = gq2[5:8]
        gq_n, gr_n = _build_packs(new_pos, f_n)
        gq_n = _set_rk(gq_n, rk_feat, rk_step)
        return (gq_n, gr_n, scal), cls_row

    (gq_f, gr_f, _), cls_hist = jax.lax.scan(
        one_iteration, (gq0, gr0, scal0), None, length=iters
    )
    out_pos = unsort(gq_f[0:3].T, sc.orig_idx)[:n_in]
    out_nrm = unsort(gq_f[5:8].T, sc.orig_idx)[:n_in]
    out_cls = unsort(
        cls_hist[-1].astype(jnp.int32)[:, None], sc.orig_idx
    )[:n_in, 0]
    return out_pos, out_nrm, out_cls


# ---------------------------------------------------------------------------
# Hybrid driver: kernels reduce windows, XLA does per-point math
# ---------------------------------------------------------------------------
#
# Ablation on v5e: the in-kernel eigensolver costs ~8.5 us of the
# ~12.8 us tile budget — ~200 vector instructions on (256,)-wide data
# use a quarter of each vreg. The per-point elementwise chains (eigh,
# VU smoothing, the 3x3 step solves, class dispatch) run at full vector
# width and fuse into a handful of HBM passes when done in XLA over
# (N,) rows; only the (tile, window) reductions need Pallas. The edge
# step's y-dependent sums decompose through the third-order tensor
# Q[c,a,b] = sum_j m n_c n_a p_b (27 window sums), contracted with y
# afterwards.


def _make_k1(t_sz, wt, num_tiles, cfg: DenoiseConfig, sub=1):
    """Window reductions for NVT1 from SLIM packs [p, n, rkf, rks]:
    outputs t6 sums only.

    ``sub`` > 1 shares one DMA'd window across several t_sz-wide
    compute subtiles (each reading its own wt_c-wide slice) — per-tile
    DMA latency is the kernel floor, and window sharing halves the
    number of DMAs for identical FLOPs."""
    import math

    cos_rho = math.cos(cfg.angle)
    wt_c = wt - (sub - 1) * t_sz  # per-subtile window width

    def compute(tqs, wrs, off_s, nv):
        d = _dist_slim(tqs, wrs)
        d = jnp.where(_col_valid(off_s, nv, wt_c), d, jnp.float32(1e30))
        rkf = jnp.transpose(tqs[6:7, :])
        mk = (d <= rkf) & (d < 1e30)
        pn, sym6 = _derive_window(wrs)
        cross = _mmT(tqs[0:3], wrs[3:6])
        num = jnp.abs(pn[None, :] - cross)
        cosang = num * jax.lax.rsqrt(jnp.maximum(d, 1e-24))
        wf0 = ((cosang < cos_rho) & mk).astype(jnp.float32)
        mkf = mk.astype(jnp.float32)
        wsum0 = jnp.sum(wf0, axis=1, keepdims=True)
        wf = jnp.where(wsum0 == 0.0, mkf, wf0)
        wsum = jnp.maximum(jnp.sum(wf, axis=1), 1.0)
        rows = [(_wsum(wf, sym6[r]) / wsum)[None, :] for r in range(6)]
        rows.append(jnp.zeros((2, t_sz), jnp.float32))
        return jnp.concatenate(rows, axis=0)

    def kernel(starts_ref, sub_starts_ref, meta_ref, gq_ref, gr_ref,
               out_ref, tq2, wr2, sems):
        t = pl.program_id(0)
        off = pl.multiple_of(starts_ref[t], 128)
        nv = meta_ref[0]
        tq, wr = _pipelined_load(
            starts_ref, gq_ref, gr_ref, t, t_sz * sub, wt, num_tiles,
            tq2, wr2, sems, window_as_ref=True,
        )
        blocks = []
        for s in range(sub):
            s_off, wrs = _subtile_window(
                sub_starts_ref, off, wr, t, s, sub, wt_c
            )
            blocks.append(
                compute(tq[:, s * t_sz : (s + 1) * t_sz], wrs, s_off, nv)
            )
        out_ref[...] = (
            blocks[0] if sub == 1 else jnp.concatenate(blocks, axis=1)
        )

    return kernel


def _make_k2(t_sz, wt, num_tiles, cfg: DenoiseConfig, strategy, needs_delta,
             sub=1):
    """All class-independent window sums for the update stage.

    ``sub``: window-sharing subtiles, see _make_k1."""
    import math

    cos_rho = math.cos(cfg.angle)
    use_flat = "flat" in strategy
    use_new = "new" in strategy
    use_edge = "edge" in strategy
    wt_c = wt - (sub - 1) * t_sz

    def compute(tq, wr, off, nv, scal_ref):
        d = _dist_slim(tq, wr)
        d = jnp.where(_col_valid(off, nv, wt_c), d, jnp.float32(1e30))

        # NVT2 weights -> t6 sums (for classes/edge dirs, eigh in XLA).
        rkf = jnp.transpose(tq[6:7, :])
        mk = (d <= rkf) & (d < 1e30)
        pn, sym6 = _derive_window(wr)
        cross = _mmT(tq[0:3], wr[3:6])
        numer = jnp.abs(pn[None, :] - cross)
        cosang = numer * jax.lax.rsqrt(jnp.maximum(d, 1e-24))
        wf0 = ((cosang < cos_rho) & mk).astype(jnp.float32)
        mkf = mk.astype(jnp.float32)
        wsum0 = jnp.sum(wf0, axis=1, keepdims=True)
        wf = jnp.where(wsum0 == 0.0, mkf, wf0)
        wsumn = jnp.maximum(jnp.sum(wf, axis=1), 1.0)
        rows = [(_wsum(wf, sym6[r]) / wsumn)[None, :] for r in range(6)]

        # Step-kNN mask and the shared sums.
        rk8 = jnp.transpose(tq[7:8, :])
        m8f = ((d <= rk8) & (d < 1e30)).astype(jnp.float32)
        nnv = wr[3:6] * pn[None, :]
        for r in range(6):  # s6
            rows.append(_wsum(m8f, sym6[r])[None, :])
        for r in range(3):  # b_nv
            rows.append(_wsum(m8f, nnv[r])[None, :])
        for r in range(3):  # sv
            rows.append(_wsum(m8f, wr[r])[None, :])
        if use_edge:
            # Q[c,a,b] = sum_j m8 n_c n_a p_b, symmetric in (c,a) —
            # 18 unique rows (pairs c<=a, 3 p-components each).
            for c, a in ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)):
                base = wr[3 + c] * wr[3 + a]
                for b in range(3):
                    rows.append(_wsum(m8f, base * wr[b])[None, :])
        dotj = pn[None, :] - cross  # n_j . (p_j - p_i)
        if use_flat:
            delta = scal_ref[1, 0]
            d2 = jnp.maximum(delta * delta, 1e-30)
            ninj = _mmT(tq[3:6], wr[3:6])
            sim = jnp.exp(-16.0 * (2.0 - 2.0 * ninj) / d2)
            close = jnp.exp(-4.0 * jnp.where(d < 1e30, d, 0.0) / d2)
            wb = sim * close * m8f
            rows.append(jnp.sum(wb * dotj, axis=1)[None, :])
            rows.append(jnp.sum(wb, axis=1)[None, :])
        if use_new:
            delta = scal_ref[2, 0]
            d2 = jnp.maximum(delta * delta, 1e-30)
            like = jnp.exp(-9.0 * dotj * dotj / d2) * m8f
            for r in range(6):
                rows.append(_wsum(like, sym6[r])[None, :])
            for r in range(3):
                rows.append(_wsum(like, nnv[r])[None, :])
            for r in range(3):
                rows.append(_wsum(like, wr[r])[None, :])
        # deg + per-point delta ingredients. (sum_j m8 p_j is already
        # emitted above as the sv rows — the lag-state stage reuses it.)
        rows.append(jnp.sum(m8f, axis=1)[None, :])
        for ci in range(len(needs_delta)):
            cen = (scal_ref[4 + ci, 0], scal_ref[4 + ci, 1], scal_ref[4 + ci, 2])
            p2w = jnp.sum(wr[0:3] * wr[0:3], axis=0)
            dist2 = (
                p2w
                - 2.0 * (wr[0] * cen[0] + wr[1] * cen[1] + wr[2] * cen[2])
                + (cen[0] ** 2 + cen[1] ** 2 + cen[2] ** 2)
            )
            rows.append(jnp.max(m8f * dist2[None, :], axis=1)[None, :])
        total = len(rows)
        pad = (-total) % 8
        if pad:
            rows.append(jnp.zeros((pad, t_sz), jnp.float32))
        return jnp.concatenate(rows, axis=0)

    def kernel(starts_ref, sub_starts_ref, meta_ref, gq_ref, gr_ref,
               scal_ref, out_ref, tq2, wr2, sems):
        t = pl.program_id(0)
        off = pl.multiple_of(starts_ref[t], 128)
        nv = meta_ref[0]
        tq, wr = _pipelined_load(
            starts_ref, gq_ref, gr_ref, t, t_sz * sub, wt, num_tiles,
            tq2, wr2, sems, window_as_ref=True,
        )
        blocks = []
        for s in range(sub):
            s_off, wrs = _subtile_window(
                sub_starts_ref, off, wr, t, s, sub, wt_c
            )
            blocks.append(
                compute(
                    tq[:, s * t_sz : (s + 1) * t_sz], wrs, s_off, nv,
                    scal_ref,
                )
            )
        out_ref[...] = (
            blocks[0] if sub == 1 else jnp.concatenate(blocks, axis=1)
        )

    return kernel


def _k2_layout(strategy, needs_delta):
    """Row offsets of the K2 output pack."""
    lay = {}
    o = 0
    lay["t6"] = o; o += 6
    lay["s6"] = o; o += 6
    lay["b_nv"] = o; o += 3
    lay["sv"] = o; o += 3
    if "edge" in strategy:
        lay["q18"] = o; o += 18  # sym (c,a) pairs x 3 p-components
    if "flat" in strategy:
        lay["flat"] = o; o += 2
    if "new" in strategy:
        lay["new"] = o; o += 12
    lay["deg"] = o; o += 1
    lay["jp"] = lay["sv"]  # sum_j m8 p_j — same rows as sv, not re-emitted
    lay["maxd"] = o; o += len(needs_delta)
    lay["_total"] = o + ((-o) % 8)
    return lay


def _xla_vu_stage(t6, gq, cfg: DenoiseConfig):
    """VU smoothing + slim-pack rebuild, one XLA fusion over (N,) rows.

    t6: (8, N) from K1; gq: (8, N) slim pack [p, n, rkf, rks]. Returns
    the post-VU pack [p, f, rkf, rks]. Uses the projector-form VU
    filter (no eigenvectors): the explicit eigh graph was big enough
    that XLA split it into ~12 loop kernels, each a full HBM
    round-trip.
    """
    n_i = (gq[3], gq[4], gq[5])
    f = vu_filter_components(
        (t6[0], t6[1], t6[2], t6[3], t6[4], t6[5]),
        n_i, cfg.vu_tau, cfg.vu_damping,
    )
    return jnp.concatenate(
        [gq[0:3], f[0][None], f[1][None], f[2][None], gq[6:8]], axis=0
    )


def _xla_update_stage(
    k2, gq2, scal_prev, d_thr, cfg: DenoiseConfig, strategy, needs_delta,
    lay, nv,
):
    """Classify + solve + dispatch + next-pack build, XLA over (N,) rows.

    gq2 is the slim post-VU pack [p, f, rkf, rks]."""
    n = gq2.shape[1]
    p_i = (gq2[0], gq2[1], gq2[2])
    n_i = (gq2[3], gq2[4], gq2[5])
    alphas = cfg.alphas
    delta_slot = {c: i for i, c in enumerate(needs_delta)}

    t6 = k2[lay["t6"] : lay["t6"] + 6]
    w, v = eigh3x3_components(t6[0], t6[1], t6[2], t6[3], t6[4], t6[5])
    cls = _classes_c(w, cfg.class_scale)
    y = v[0]

    s6 = tuple(k2[lay["s6"] + r] for r in range(6))
    b_nv = tuple(k2[lay["b_nv"] + r] for r in range(3))
    sv = tuple(k2[lay["sv"] + r] for r in range(3))
    deg = k2[lay["deg"]]

    def srow(t):
        return ((t[0], t[1], t[2]), (t[1], t[3], t[4]), (t[2], t[4], t[5]))

    def clamp(opt, alpha, strict=True):
        di = tuple((o - p) * alpha for o, p in zip(opt, p_i))
        nrm = _norm_c(di)
        ok = nrm < d_thr if strict else nrm <= d_thr
        return tuple(jnp.where(ok, p + dd, p) for p, dd in zip(p_i, di))

    def three_term(s6_w, b_nv_w, sv_w):
        nio = (
            (n_i[0] * n_i[0], n_i[0] * n_i[1], n_i[0] * n_i[2]),
            (n_i[0] * n_i[1], n_i[1] * n_i[1], n_i[1] * n_i[2]),
            (n_i[0] * n_i[2], n_i[1] * n_i[2], n_i[2] * n_i[2]),
        )
        sr = srow(s6_w)
        rows = tuple(
            tuple(
                (1.0 if a == b else 0.0) + nio[a][b] * (1.0 + deg) + sr[a][b]
                for b in range(3)
            )
            for a in range(3)
        )
        niv = tuple(_dot_c(nio[a], p_i) for a in range(3))
        nisv = tuple(_dot_c(nio[a], sv_w) for a in range(3))
        b = tuple(p_i[c] + niv[c] + nisv[c] + b_nv_w[c] for c in range(3))
        opt, _ = solve3x3_components(rows, b, p_i)
        return opt

    results = {}
    for cid in range(3):
        name = strategy[cid]
        if name == "flat":
            num = k2[lay["flat"]]
            wsum = jnp.maximum(k2[lay["flat"] + 1], 1e-30)
            scalef = num / wsum * alphas[cid]
            di = tuple(scalef * nc for nc in n_i)
            nrm = _norm_c(di)
            results[cid] = tuple(
                jnp.where(nrm <= d_thr, p + dd, p) for p, dd in zip(p_i, di)
            )
        elif name == "edge":
            q = k2[lay["q18"] : lay["q18"] + 18]
            # Symmetric-pair storage: row index of Q[c,a,:].
            pidx = {(0, 0): 0, (0, 1): 1, (0, 2): 2,
                    (1, 1): 3, (1, 2): 4, (2, 2): 5}
            pidx.update({(a, c): i for (c, a), i in list(pidx.items())})
            q_yy = tuple(
                sum(
                    q[pidx[(c, a)] * 3 + b] * y[a] * y[b]
                    for a in range(3)
                    for b in range(3)
                )
                for c in range(3)
            )
            sr = srow(s6)
            sy = tuple(_dot_c(sr[a], y) for a in range(3))
            ysy = _dot_c(sy, y)
            rows = tuple(
                tuple(
                    sr[a][b] - y[a] * sy[b] - sy[a] * y[b]
                    + ysy * y[a] * y[b] + deg * y[a] * y[b]
                    for b in range(3)
                )
                for a in range(3)
            )
            z = tuple(b_nv[c] - q_yy[c] for c in range(3))
            yz = _dot_c(y, z)
            yp = _dot_c(y, p_i)
            b = tuple(z[c] - yz * y[c] + deg * yp * y[c] for c in range(3))
            opt, _ = solve3x3_components(rows, b, p_i)
            results[cid] = clamp(opt, alphas[cid])
        elif name == "corner":
            opt, _ = solve3x3_components(srow(s6), b_nv, p_i)
            results[cid] = clamp(opt, alphas[cid])
        elif name == "feature":
            results[cid] = clamp(three_term(s6, b_nv, sv), alphas[cid])
        elif name == "new":
            s6w = tuple(k2[lay["new"] + r] for r in range(6))
            b_nvw = tuple(k2[lay["new"] + 6 + r] for r in range(3))
            svw = tuple(k2[lay["new"] + 9 + r] for r in range(3))
            results[cid] = clamp(three_term(s6w, b_nvw, svw), alphas[cid])
        elif name == "dummy":
            results[cid] = p_i
        else:
            raise ValueError(name)

    new_p = tuple(
        jnp.where(
            cls == 0.0, results[0][c],
            jnp.where(cls == 1.0, results[1][c], results[2][c]),
        )
        for c in range(3)
    )
    valid = jnp.arange(n) < nv
    new_p = tuple(jnp.where(valid, np_, p0) for np_, p0 in zip(new_p, p_i))

    # Next-iteration lag state.
    scal = jnp.zeros((8, 128), jnp.float32).at[0, 0].set(d_thr)
    jp = k2[lay["jp"] : lay["jp"] + 3]
    for ci, c in enumerate(needs_delta):
        mask_c = ((cls == float(c)) & valid).astype(jnp.float32)
        cnt = jnp.maximum(jnp.sum(deg * mask_c), 1.0)
        center = jnp.sum(jp * mask_c[None, :], axis=1) / cnt
        scal = scal.at[4 + ci, 0:3].set(center)
        delta = jnp.sqrt(
            jnp.maximum(jnp.max(k2[lay["maxd"] + ci] * mask_c), 0.0)
        )
        scal = scal.at[1 + ci, 0].set(delta)

    gq_n = jnp.concatenate(
        [new_p[0][None], new_p[1][None], new_p[2][None],
         n_i[0][None], n_i[1][None], n_i[2][None], gq2[6:8]],
        axis=0,
    )
    return gq_n, scal, cls


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "strategy", "iterations", "tile", "window",
        "threshold_method", "interpret", "sub", "lagged_nvt1",
    ),
)
def pallas_denoise_hybrid(
    points: jnp.ndarray,
    normals: jnp.ndarray,
    cfg: DenoiseConfig = DenoiseConfig(),
    strategy: tuple[str, str, str] = DEFAULT_STRATEGY,
    iterations: Optional[int] = None,
    num_valid: Optional[jnp.ndarray] = None,
    tile: int = 256,
    window: int = 128,
    threshold_method: str = "approx",
    threshold_slack: float = 1.05,
    interpret: bool = False,
    sub: int = 8,
    lagged_nvt1: bool = False,
):
    """Hybrid engine: Pallas window reductions + XLA per-point math.

    Lagged-delta, stale-threshold semantics (see pallas_denoise); the
    fastest configuration for large clouds. ``threshold_method`` is kept
    for API symmetry but unused: the prologue always runs the exact
    in-VMEM counting search (K0).

    ``lagged_nvt1`` drops the per-iteration K1 kernel: K2 already
    computes the identical filtered-NVT t6 sums (same weight formula,
    same thresholds) on the post-VU normals that BECOME the next
    iteration's input normals — the only difference from a fresh K1 is
    that the weight masks see positions one clamped half-step stale.
    The t6 summands themselves are neighbor-normal outer products
    (positions enter only the masks), so this is the same approximation
    family as the frozen-KD-tree thresholds (Selector.py:141) and the
    lagged global deltas. Iteration 0 still runs a fresh K1.
    """
    iters = cfg.iterations if iterations is None else iterations
    n_in = points.shape[0]
    nv = jnp.asarray(n_in if num_valid is None else num_valid, jnp.int32)

    # One DMA serves `sub` compute subtiles (window sharing): pad to the
    # DMA-tile multiple. On clouds too small to fit a full shared
    # window, fall back to per-tile DMA so every subtile keeps the
    # complete +-window span.
    dma = tile * sub
    n = -(-n_in // dma) * dma
    if n < dma + 2 * window and sub > 1:
        sub = 1
        dma = tile
        n = -(-n_in // dma) * dma
    if n != n_in:
        points = jnp.pad(points, ((0, n - n_in), (0, 0)))
        normals = jnp.pad(normals, ((0, n - n_in), (0, 0)))
    sc = morton_sort(points, normals, nv)

    wt = min(dma + 2 * window, n)
    wt_c = wt - (sub - 1) * tile
    num_tiles = n // dma
    starts = jnp.clip(
        jnp.arange(num_tiles, dtype=jnp.int32) * dma - window, 0, n - wt
    )
    # Per-SUBTILE ideal window starts: boundary pairs clip the shared
    # slab, so each subtile slices its exact +-window span by offset.
    sub_starts = jnp.clip(
        jnp.arange(num_tiles * sub, dtype=jnp.int32) * tile - window,
        0, n - wt_c,
    )
    meta = jnp.asarray([nv], jnp.int32)
    needs_delta = tuple(c for c in range(3) if strategy[c] in ("flat", "new"))
    lay = _k2_layout(strategy, needs_delta)

    sem22 = pltpu.SemaphoreType.DMA((2, 2))
    scr_tq2 = pltpu.VMEM((2, 8, dma), jnp.float32)
    scr_wr2 = pltpu.VMEM((2, 8, wt), jnp.float32)

    # Prologue: k-th distances + 6-NN edge sums via the counting-search
    # kernel. One slim pack serves as BOTH the tile and window source.
    pos0 = sc.pos.T
    nrm0 = sc.nrm.T
    gq0 = _build_pack_slim(pos0, nrm0)
    k0 = pl.pallas_call(
        _make_k0(tile, wt, num_tiles, cfg, sub=sub),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(num_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
            out_specs=pl.BlockSpec((8, dma), lambda t, *_: (0, t)),
            scratch_shapes=[scr_tq2, scr_wr2, sem22],
        ),
        out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
        interpret=interpret,
    )
    pro = k0(starts, sub_starts, meta, gq0, gq0)
    rk_feat = pro[0] * threshold_slack
    rk_step = pro[1] * threshold_slack
    d_thr = cfg.d_scale * jnp.sum(pro[2]) / jnp.maximum(jnp.sum(pro[3]), 1.0)

    k1 = pl.pallas_call(
        _make_k1(tile, wt, num_tiles, cfg, sub=sub),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(num_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
            out_specs=pl.BlockSpec((8, dma), lambda t, *_: (0, t)),
            scratch_shapes=[scr_tq2, scr_wr2, sem22],
        ),
        out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
        interpret=interpret,
    )
    k2 = pl.pallas_call(
        _make_k2(tile, wt, num_tiles, cfg, strategy, needs_delta, sub=sub),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((8, 128), lambda t, *_: (0, 0)),
            ],
            out_specs=pl.BlockSpec((lay["_total"], dma), lambda t, *_: (0, t)),
            scratch_shapes=[scr_tq2, scr_wr2, sem22],
        ),
        out_shape=jax.ShapeDtypeStruct((lay["_total"], n), jnp.float32),
        interpret=interpret,
    )

    valid_cols = (jnp.arange(n) < nv)[None, :]
    vcnt = jnp.maximum(jnp.sum(valid_cols), 1)
    centroid = jnp.sum(jnp.where(valid_cols, pos0, 0.0), axis=1) / vcnt
    radius0 = jnp.sqrt(
        jnp.max(
            jnp.where(
                valid_cols[0],
                jnp.sum((pos0 - centroid[:, None]) ** 2, axis=0),
                0.0,
            )
        )
    )
    scal0 = jnp.zeros((8, 128), jnp.float32)
    for ci in range(len(needs_delta)):
        scal0 = scal0.at[1 + ci, 0].set(radius0)
        scal0 = scal0.at[4 + ci, 0:3].set(centroid)

    gq0 = _set_rk_slim(gq0, rk_feat, rk_step)

    if lagged_nvt1:
        # K2's t6 rows (filtered NVT of the post-VU normals) double as
        # the NEXT iteration's K1 output — see the docstring. Only the
        # first iteration pays for a fresh K1.
        t6_0 = k1(starts, sub_starts, meta, gq0, gq0)[0:6]

        def one_iteration_lag(carry, _):
            gq, scal_prev, t6 = carry
            gq2 = _xla_vu_stage(t6, gq, cfg)
            k2out = k2(starts, sub_starts, meta, gq2, gq2, scal_prev)
            gq_n, scal, cls = _xla_update_stage(
                k2out, gq2, scal_prev, d_thr, cfg, strategy,
                needs_delta, lay, nv,
            )
            return (gq_n, scal, k2out[lay["t6"] : lay["t6"] + 6]), cls

        (gq_f, _, _), cls_hist = jax.lax.scan(
            one_iteration_lag, (gq0, scal0, t6_0), None, length=iters
        )
    else:
        def one_iteration(carry, _):
            gq, scal_prev = carry
            t6 = k1(starts, sub_starts, meta, gq, gq)
            gq2 = _xla_vu_stage(t6, gq, cfg)
            k2out = k2(starts, sub_starts, meta, gq2, gq2, scal_prev)
            gq_n, scal, cls = _xla_update_stage(
                k2out, gq2, scal_prev, d_thr, cfg, strategy, needs_delta,
                lay, nv,
            )
            return (gq_n, scal), cls

        (gq_f, _), cls_hist = jax.lax.scan(
            one_iteration, (gq0, scal0), None, length=iters
        )
    out_pos = unsort(gq_f[0:3].T, sc.orig_idx)[:n_in]
    out_nrm = unsort(gq_f[3:6].T, sc.orig_idx)[:n_in]
    out_cls = unsort(
        cls_hist[-1].astype(jnp.int32)[:, None], sc.orig_idx
    )[:n_in, 0]
    return out_pos, out_nrm, out_cls


def _make_k0(t_sz, wt, num_tiles, cfg: DenoiseConfig, search_iters=24,
             sub=1):
    """Prologue kernel: per-point k-th distances (feature_k, step_k) and
    the 6-NN edge-length sums — via in-VMEM binary counting search
    instead of top_k (the XLA approx_min_k prologue costs ~0.25 s at 1M;
    this runs at the distance-tile floor)."""

    def kth_by_count(d, k, dmax):
        lo = jnp.zeros((t_sz, 1), jnp.float32)
        hi = dmax
        for _ in range(search_iters):
            mid = 0.5 * (lo + hi)
            cnt = jnp.sum((d <= mid).astype(jnp.float32), axis=1, keepdims=True)
            ge = cnt >= float(k)
            hi = jnp.where(ge, mid, hi)
            lo = jnp.where(ge, lo, mid)
        return hi

    wt_c = wt - (sub - 1) * t_sz

    def compute(tq, wr, off, nv, row0):
        d = _dist_slim(tq, wr)
        valid = _col_valid(off, nv, wt_c)
        dmax = jnp.max(jnp.where(valid, d, 0.0), axis=1, keepdims=True) + 1.0
        d = jnp.where(valid, d, dmax)  # padding cols above every threshold
        rkf = kth_by_count(d, cfg.feature_k, dmax)
        rk8 = kth_by_count(d, cfg.step_k, dmax)
        rk6 = kth_by_count(d, 6, dmax)
        in6 = (d <= rk6).astype(jnp.float32)
        sum6 = jnp.sum(jnp.sqrt(jnp.maximum(d, 0.0)) * in6, axis=1)
        cnt6 = jnp.sum(in6, axis=1)
        row_valid = (
            (row0 + jax.lax.broadcasted_iota(jnp.int32, (t_sz,), 0)) < nv
        ).astype(jnp.float32)
        return jnp.concatenate(
            [rkf.T, rk8.T, (sum6 * row_valid)[None, :],
             (cnt6 * row_valid)[None, :],
             jnp.zeros((4, t_sz), jnp.float32)],
            axis=0,
        )

    def kernel(starts_ref, sub_starts_ref, meta_ref, pq_ref, pr_ref,
               out_ref, tq2, wr2, sems):
        t = pl.program_id(0)
        off = pl.multiple_of(starts_ref[t], 128)
        nv = meta_ref[0]
        tq, wr = _pipelined_load(
            starts_ref, pq_ref, pr_ref, t, t_sz * sub, wt, num_tiles,
            tq2, wr2, sems, window_as_ref=True,
        )
        blocks = []
        for s in range(sub):
            s_off, wrs = _subtile_window(
                sub_starts_ref, off, wr, t, s, sub, wt_c
            )
            blocks.append(
                compute(
                    tq[:, s * t_sz : (s + 1) * t_sz], wrs, s_off, nv,
                    t * (t_sz * sub) + s * t_sz,
                )
            )
        out_ref[...] = (
            blocks[0] if sub == 1 else jnp.concatenate(blocks, axis=1)
        )

    return kernel
