"""Fused Pallas TPU kernel for flow-guided local attention (ExtractorAttn).

The XLA gather engine (models/generator.py:_gather_engine) is HBM-bound:
36 corner gathers of the full C-wide source per phase, their scatter-add
VJP transposes, and the materialized attention intermediates dominated the
r2 TPU profile (PERF.md: 190 ms/step gather+scatter on a 457 ms step).

This kernel exploits the boundedness of the HOGAN flow (the normalized
T-delta interpreted in pixels, generator.py:480-491: floor(flow) is
always in {-3..2} per axis) to keep EVERYTHING in VMEM:

  * the source tile plus a +-5 halo is loaded once per (batch, row-tile);
  * each bilinear corner sample is a per-pixel 2-term combination of
    bounded integer shifts of the halo — VMEM slices, not HBM gathers;
  * fc_0's source half pre-projects the halo through the 25 offset weight
    slices on the MXU ((wf.G)@W = wf.(G@W)) and accumulates the 25x49
    shifted coefficient-field FMAs on the VPU — cheap at VMEM bandwidth,
    catastrophic at HBM bandwidth (which is why the pure-XLA "shift
    engine" version of this same algebra measured SLOWER than gathers);
  * the output phase regroups mean_t attn_t * s_t by total shift d:
    out[p] = (1/25) sum_d V_d[p] * src[p+d], V_d = sum_e Cyx[e]*attn_{d-e}
    — 121 C-wide FMAs per pixel;
  * the custom VJP re-reads the same halos instead of storing 36 corner
    tensors, and replaces every backward scatter-add with the reverse
    bounded shifts (gradient of shift = opposite shift).

Reference semantics (HOIG_HOv3/models/networks/extract_attn.py:8-37 +
block_extractor_kernel.cu:58-68) are preserved exactly: flow in pixel
units, border-clamped corner indices with unclamped bilinear weights
(= edge-padded source), softmax over the k^2=25 offsets in f32.

Numerics: MXU matmuls in the input dtype with f32 accumulation; all
coefficient-field FMAs in f32; softmax in f32.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 5  # kernel_size (static: the only value the HOGAN family uses)
R = K // 2  # 2
FLOOR_LO = -3  # floor(flow) bounds per axis (see generator.py engines)
FLOOR_HI = 2
EY_LO, EY_HI = FLOOR_LO, FLOOR_HI + 1  # corner-offset range: -3..3 (7)
PAD = R + FLOOR_HI + 1  # 5: max |total shift| per axis
NSHIFT = 2 * PAD + 1  # 11 total shifts per axis, 121 in 2D
F = 128  # fc_0 hidden width (reference fc_0 out_channels)
K2 = K * K  # 25


def _round8(x: int) -> int:
    return -(-x // 8) * 8


# Scoped-VMEM ceiling for the kernels: the compiler's 16MB default
# rejects the C=512 tiles, but the ceiling also feeds Mosaic's scheduler
# appetite — 100MB let the backward schedule 152MB total (over the v5e's
# 128MB capacity once buffers are added). 64MB forces tighter sequencing
# while still fitting every tile the row-tiler emits.
_VMEM_LIMIT = 64 * 1024 * 1024


def _params():
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _row_tile(h: int, w: int, c: int = 128) -> int:
    """Rows per grid step, channel-aware: per-program working set (halo
    band + 25 projected slices + accumulators) scales with W*C, and both
    Mosaic compile time and the scoped-VMEM stack grow with it — wide
    channels get shorter tiles. Multi-tile TH must be a multiple of 8:
    the backward band DMAs index 2D field arrays at row i*TH, and DMA
    offsets in a tiled (sublane) dim must be 8-aligned."""
    budget = max(256, 1024 * 128 // max(c, 128))  # pixels per tile
    if h * w <= budget:
        return h
    cap = max(8, budget // w)
    cands = [d for d in range(8, h + 1, 8) if h % d == 0 and d <= cap]
    return max(cands) if cands else h


def _offsets():
    return [(ty, tx) for ty in range(-R, R + 1) for tx in range(-R, R + 1)]


def _corner_shifts():
    return [
        (ey, ex)
        for ey in range(EY_LO, EY_HI + 1)
        for ex in range(EY_LO, EY_HI + 1)
    ]


def _coeff_axes(fy_rel, fx_rel, wy, wx):
    """Per-axis bilinear coefficient fields ay[e], ax[e] (f32).

    A bilinear sample with per-pixel floor f and fraction w puts weight
    (1-w)*[f==e] + w*[f==e-1] on integer shift e (per axis). Only 2 of
    the 7 are nonzero per pixel per axis."""
    ay = {}
    ax = {}
    for e in range(EY_LO, EY_HI + 1):
        t0y = jnp.where(fy_rel == e, 1.0 - wy, 0.0) if FLOOR_LO <= e <= FLOOR_HI else 0.0
        t1y = jnp.where(fy_rel == e - 1, wy, 0.0) if FLOOR_LO <= e - 1 <= FLOOR_HI else 0.0
        ay[e] = t0y + t1y
        t0x = jnp.where(fx_rel == e, 1.0 - wx, 0.0) if FLOOR_LO <= e <= FLOOR_HI else 0.0
        t1x = jnp.where(fx_rel == e - 1, wx, 0.0) if FLOOR_LO <= e - 1 <= FLOOR_HI else 0.0
        ax[e] = t0x + t1x
    return ay, ax


def _vx_fields(attn_of, ax):
    """Separable V build, x-axis half: Vx[(ty, dx)] = sum_ex ax[ex] *
    attn_{(ty, dx-ex)} — 55 fields, <=7 terms each. The caller contracts
    the y axis per total shift d (one V live at a time):
    V_(dy,dx) = sum_ey ay[ey] * Vx[(dy-ey, dx)]."""
    vx = {}
    for ti, (ty, tx) in enumerate(_offsets()):
        at = attn_of(ti)
        for ex in range(EY_LO, EY_HI + 1):
            key = (ty, tx + ex)
            term = at * ax[ex]
            vx[key] = term if key not in vx else vx[key] + term
    return vx


def _v_of(vx, ay, dy, dx, window=None):
    """V_(dy,dx) from the separable halves; None when no term exists.
    `window=(r0, c0, nrows, ncols)` builds only that slice (cheaper when
    the caller immediately slices anyway)."""
    vd = None
    for ey in range(EY_LO, EY_HI + 1):
        key = (dy - ey, dx)
        if key in vx:
            a_, v_ = ay[ey], vx[key]
            if window is not None:
                r0, c0, nr, nc = window
                a_ = jax.lax.slice(a_, (r0, c0), (r0 + nr, c0 + nc))
                v_ = jax.lax.slice(v_, (r0, c0), (r0 + nr, c0 + nc))
            t2 = a_ * v_
            vd = t2 if vd is None else vd + t2
    return vd


_TIE = True  # set per-call by the pallas_call wrappers (see _tie)


def _tie(x, dep):
    """Serialize an accumulation loop: make the freshly-loaded operand `x`
    depend on the running accumulator `dep` via an optimization barrier.

    Without this, Mosaic treats the loop's loads as free to hoist and the
    `acc = acc + term` chain as free to reassociate into a balanced tree
    — every term stays live at once and the kernel needs >100MB of
    register spill slots (measured, pre-channel-chunking). The barrier
    forces one term in flight; VMEM loads are fast enough that the lost
    overlap is noise.

    Caveat: `lax.optimization_barrier` has NO Mosaic TC lowering (jax
    0.9.0 raises NotImplementedError), so on the real-TPU path the call
    wrappers disable the tie via the module switch `_TIE` — the
    channel-chunked kernels keep few enough values live to fit VMEM
    without it — and keep it only under interpret mode, where the
    barrier lowers through XLA and the test suite exercises the same
    accumulation structure."""
    if not _TIE:
        return x
    x, _ = jax.lax.optimization_barrier((x, dep))
    return x


def _set_tie(interpret: bool) -> None:
    """Enable the serialization barrier only when the kernel will run in
    interpret mode. Kernel tracing happens synchronously inside
    pallas_call, and every call wrapper sets the switch before its
    pallas_call, so the module global cannot go stale between calls."""
    global _TIE
    _TIE = bool(interpret)


def _flow_fields(flow):
    """Per-pixel integer relative floors (clipped to the bounded range) and
    bilinear fractions, mirroring _gather_engine's index math (f32)."""
    f32 = jnp.float32
    b, h, w = flow.shape[:3]
    xf = jax.lax.broadcasted_iota(f32, (h, w), 1)
    yf = jax.lax.broadcasted_iota(f32, (h, w), 0)
    fx = flow[..., 0].astype(f32) + xf
    fy = flow[..., 1].astype(f32) + yf
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = fx - x0
    wy = fy - y0
    # kept in f32 (exact small integers) so the custom_vjp can hand back
    # zero cotangents without float0 bookkeeping
    fx_rel = jnp.clip(x0 - xf, FLOOR_LO, FLOOR_HI)
    fy_rel = jnp.clip(y0 - yf, FLOOR_LO, FLOOR_HI)
    return fy_rel, fx_rel, wy.astype(f32), wx.astype(f32)


# --------------------------------------------------------------------- fwd


def _fwd_kernel(src_hbm, acc0_ref, fy_ref, fx_ref, wy_ref, wx_ref,
                w0s_ref, w1_ref, b1_ref, out_ref, acc_ref, attn_ref,
                src_vmem, dma_sem,
                *, th: int, h: int, w: int, wp: int, c: int):
    """One (batch, row-tile) program.

    src_hbm: (B, H+2P, WP, C) edge-padded source, resident in HBM; the
      (TH+2P)-row halo band for this tile is DMA'd to src_vmem (halo rows
      OVERLAP between tiles, which BlockSpec cannot express)
    acc0_ref: (1, TH, W, F) f32 — target half + fc_0 bias, precomputed
    fy/fx/wy/wx: (1, TH, W) flow fields
    w0s_ref: (K2, C, F) fc_0 source-half weights (input dtype)
    w1_ref: (F, K2) f32; b1_ref: (1, K2) f32
    out_ref: (1, TH, W, C); acc_ref: (1, TH, W, F) f32 (residual);
    attn_ref: (1, TH, W, K2) f32 (residual)
    """
    f32 = jnp.float32
    bb = pl.program_id(0)
    i = pl.program_id(1)
    thp = th + 2 * PAD
    dma = pltpu.make_async_copy(
        src_hbm.at[bb, pl.ds(i * th, thp)], src_vmem, dma_sem
    )
    dma.start()
    ay, ax = _coeff_axes(fy_ref[0], fx_ref[0], wy_ref[0], wx_ref[0])
    dma.wait()

    # NOTE (register pressure): every loop below reads its slice THROUGH
    # the VMEM ref at the use site instead of slicing one big loaded
    # value — value slices get hoisted by the scheduler, keeping all 121
    # shifted copies live at once (measured: 150MB of register spill
    # slots in the backward's equivalent loop).

    # phase A: acc[p] += sum_t sum_e Cyx[e][p] * (src @ W_t)[p + t + e].
    # Cyx does not depend on t, so the t-sum collapses FIRST:
    #   G[q] = sum_t (src @ W_t)[q + t]   (a 5x5 correlation, pure MXU)
    #   acc[p] += sum_e Cyx[e][p] * G[p + e]
    # — 25 matmuls + 49 F-wide FMAs instead of 25 matmuls + 1225 FMAs.
    # G is needed on the +-HALO neighborhood of the tile (e in [-3,3]^2).
    halo = EY_HI  # 3: corner shifts span [-EY_HI, EY_HI] per axis
    g_t = jnp.zeros((th + 2 * halo, w + 2 * halo, F), f32)
    for ti, (ty, tx) in enumerate(_offsets()):
        sy = PAD - halo + ty
        sx = PAD - halo + tx
        sl = _tie(
            src_vmem[pl.ds(sy, th + 2 * halo), pl.ds(sx, w + 2 * halo), :],
            g_t,
        )
        g_t = g_t + jax.lax.dot_general(
            sl, w0s_ref[ti],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
    acc = acc0_ref[0]  # (TH, W, F) f32
    for (ey, ex) in _corner_shifts():
        sl = jax.lax.slice(
            g_t, (halo + ey, halo + ex, 0), (halo + ey + th, halo + ex + w, F)
        )
        acc = acc + (ay[ey] * ax[ex])[:, :, None] * sl
    acc_ref[0] = acc

    # phase B: leaky_relu -> 1x1 conv to K2 logits -> softmax (f32)
    hdn = jnp.where(acc >= 0, acc, 0.01 * acc)
    logits = jax.lax.dot_general(
        hdn, w1_ref[:],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=f32,
    ) + b1_ref[0]
    m = jnp.max(logits, axis=-1, keepdims=True)
    ex_ = jnp.exp(logits - m)
    attn = ex_ / jnp.sum(ex_, axis=-1, keepdims=True)
    attn_ref[0] = attn

    # phase C: out[p] = (1/25) sum_d V_d[p] * src[p + d],
    #          V_d = sum_e Cyx[e] * attn_{d-e}
    # built separably (x then y) with ONE V field live at a time — ~780
    # scalar-field ops instead of 25*49, and a 10x smaller live set (the
    # dense 121-field build made the Mosaic compile blow up)
    # every load is _tie'd to the running accumulator: one term in
    # flight instead of a reassociated tree with all 121 terms live
    vx = _vx_fields(lambda ti: attn[:, :, ti], ax)
    out = jnp.zeros((th, w, c), f32)
    for dy in range(-PAD, PAD + 1):
        for dx in range(-PAD, PAD + 1):
            vd = _v_of(vx, ay, dy, dx)
            if vd is None:
                continue
            sl = _tie(src_vmem[pl.ds(PAD + dy, th), pl.ds(PAD + dx, w), :],
                      out)
            # product in the source dtype (bf16 in production): halves the
            # vreg footprint; accumulation stays f32
            out = out + vd[:, :, None].astype(sl.dtype) * sl
    out_ref[0] = (out / (K * K)).astype(out_ref.dtype)


def _pad_halo(x, h_axis: int, w_axis: int, wp: int, mode: str):
    """Pad spatial axes by PAD (edge for src, zeros for cotangents) and the
    width up to WP (zeros; never read) so sublane dims stay /8-aligned."""
    cfg = [(0, 0)] * x.ndim
    cfg[h_axis] = (PAD, PAD)
    cfg[w_axis] = (PAD, PAD)
    x = jnp.pad(x, cfg, mode=mode)
    extra = wp - x.shape[w_axis]
    if extra:
        cfg = [(0, 0)] * x.ndim
        cfg[w_axis] = (0, extra)
        x = jnp.pad(x, cfg)
    return x


def _bwd_a_gsrc_kernel(gacc_hbm, fy_hbm, fx_hbm, wy_hbm, wx_hbm, w0s_ref,
                       gsrc_ref,
                       gacc_buf, fy_buf, fx_buf, wy_buf, wx_buf, sems,
                       *, th: int, h: int, w: int, wp: int, c: int):
    """Phase-A backward w.r.t. the source:

    g_srcpad[m'] = sum_t dG[m' - t] @ W_t^T,
    dG[q] = sum_e (Cyx . g_acc)_pad[q - e]

    — the reverse bounded shifts of the coefficient-weighted hidden
    cotangent (dG, shared by all 25 offsets — the transpose of the
    forward's collapsed correlation), projected back through each
    offset's weight slice.

    Channel-chunked over grid dim 2: `c` is the CHUNK width; the w0s
    block and the gsrc output block are chunk-indexed by the BlockSpecs,
    and dG (F-wide, channel-independent) is recomputed per chunk (49
    cheap FMAs — far below the register/VMEM cost of a full-width body).
    """
    f32 = jnp.float32
    bb = pl.program_id(0)
    i = pl.program_id(1)
    n_i = pl.num_programs(1)

    dmas = [
        _margin_dma(gacc_hbm, bb, i, th, gacc_buf, sems.at[0]),
        _margin_dma(fy_hbm, bb, i, th, fy_buf, sems.at[1]),
        _margin_dma(fx_hbm, bb, i, th, fx_buf, sems.at[2]),
        _margin_dma(wy_hbm, bb, i, th, wy_buf, sems.at[3]),
        _margin_dma(wx_hbm, bb, i, th, wx_buf, sems.at[4]),
    ]
    for d in dmas:
        d.wait()

    # field buffers are (8,128)-rounded for DMA legality; slice back to
    # the common margined-band extent shared with the 4D bands
    mr = th + 4 * PAD
    w2 = _round8(wp + 2 * PAD)
    ay, ax = _coeff_axes(
        fy_buf[:mr, :w2].astype(jnp.int32), fx_buf[:mr, :w2].astype(jnp.int32),
        wy_buf[:mr, :w2], wx_buf[:mr, :w2],
    )

    def gsp_rows(row0: int, nrows: int):
        # dG on the +-R neighborhood of the strip, shared by all offsets;
        # coefficient slices built inline, gacc read through the ref with
        # every load _tie'd to the accumulator (register pressure)
        wide = w + 2 * PAD + 2 * R
        dg = jnp.zeros((nrows + 2 * R, wide, F), f32)
        for (ey, ex) in _corner_shifts():
            r0 = row0 - R - ey
            c0 = PAD - R - ex
            lim = (r0 + nrows + 2 * R, c0 + wide)
            csl = (jax.lax.slice(ay[ey], (r0, c0), lim)
                   * jax.lax.slice(ax[ex], (r0, c0), lim))
            gsl = _tie(
                gacc_buf[pl.ds(r0, nrows + 2 * R), pl.ds(c0, wide), :], dg
            )
            dg = dg + csl[:, :, None] * gsl
        acc = jnp.zeros((nrows, w + 2 * PAD, c), f32)
        for ti, (ty, tx) in enumerate(_offsets()):
            sl = _tie(
                jax.lax.slice(dg, (R - ty, R - tx, 0),
                              (R - ty + nrows, R - tx + w + 2 * PAD, F)),
                acc,
            )
            acc = acc + jax.lax.dot_general(
                sl, w0s_ref[ti],
                dimension_numbers=(((2,), (1,)), ((), ())),
                preferred_element_type=f32,
            )
        return acc

    gsrc = _fold_cols(gsp_rows(2 * PAD, th), th, w)

    def row_margin(row0):
        return jnp.sum(_fold_cols(gsp_rows(row0, PAD), PAD, w), axis=0)

    first = jnp.where(i == 0, 1.0, 0.0).astype(f32)
    last = jnp.where(i == n_i - 1, 1.0, 0.0).astype(f32)
    top = row_margin(PAD) * first
    bot = row_margin(2 * PAD + th) * last
    gsrc = jnp.concatenate(
        [gsrc[:1] + top[None], gsrc[1:-1], gsrc[-1:] + bot[None]], axis=0
    )
    gsrc_ref[0] = gsrc.astype(gsrc_ref.dtype)


def _bwd_a_dw_kernel(src_hbm, gacc_hbm, fy_hbm, fx_hbm, wy_hbm, wx_hbm,
                     dw_ref,
                     src_vmem, gacc_buf, fy_buf, fx_buf, wy_buf, wx_buf, sems,
                     *, th: int, h: int, w: int, wp: int, c: int):
    """Phase-A backward w.r.t. the fc_0 source-half weights:

    dW_t = sum_{m'} src_pad[m'] (x) E_t[m'],  E_t as in _bwd_a_gsrc_kernel.

    Each tile owns the CENTERED padded rows [i*TH+P, (i+1)*TH+P) — the rows
    whose E_t reads (+-P) stay inside the tile's DMA band; the first tile
    additionally owns the top pad rows [0, P) and the last tile the bottom
    pad rows [H+P, H+2P) (their out-of-canvas reads hit the margin zeros,
    which are correct there). dW accumulates across grid steps in the
    revisited output block.

    Channel-chunked over grid dim 0 (OUTERMOST: the (b, i) accumulation
    sweep into each chunk's dw block must be the consecutive revisits);
    `c` is the CHUNK width.
    """
    f32 = jnp.float32
    cc = pl.program_id(0)
    bb = pl.program_id(1)
    i = pl.program_id(2)
    n_i = pl.num_programs(2)
    thp = th + 2 * PAD

    d0 = pltpu.make_async_copy(
        src_hbm.at[bb, pl.ds(i * th, thp), slice(None), pl.ds(cc * c, c)],
        src_vmem, sems.at[0],
    )
    d0.start()
    dmas = [
        _margin_dma(gacc_hbm, bb, i, th, gacc_buf, sems.at[1]),
        _margin_dma(fy_hbm, bb, i, th, fy_buf, sems.at[2]),
        _margin_dma(fx_hbm, bb, i, th, fx_buf, sems.at[3]),
        _margin_dma(wy_hbm, bb, i, th, wy_buf, sems.at[4]),
        _margin_dma(wx_hbm, bb, i, th, wx_buf, sems.at[5]),
    ]
    for d in dmas:
        d.wait()
    d0.wait()

    @pl.when(jnp.logical_and(bb == 0, i == 0))
    def _():
        dw_ref[:] = jnp.zeros(dw_ref.shape, dw_ref.dtype)

    # field buffers are (8,128)-rounded for DMA legality; slice back to
    # the common margined-band extent shared with the 4D bands
    mr = th + 4 * PAD
    w2 = _round8(wp + 2 * PAD)
    ay, ax = _coeff_axes(
        fy_buf[:mr, :w2].astype(jnp.int32), fx_buf[:mr, :w2].astype(jnp.int32),
        wy_buf[:mr, :w2], wx_buf[:mr, :w2],
    )

    def dg_rows(row0: int, nrows: int):
        """dG[q] = sum_e (Cyx.gacc)[q-e] on the strip's +-R neighborhood;
        E_t[m'] = dG[m'-t] for every offset (shared, as in the fwd);
        every gacc load _tie'd to the accumulator (register pressure)."""
        wide = wp + 2 * R
        dg = jnp.zeros((nrows + 2 * R, wide, F), f32)
        for (ey, ex) in _corner_shifts():
            r0 = row0 - R - ey
            c0 = PAD - R - ex
            lim = (r0 + nrows + 2 * R, c0 + wide)
            csl = (jax.lax.slice(ay[ey], (r0, c0), lim)
                   * jax.lax.slice(ax[ex], (r0, c0), lim))
            gsl = _tie(
                gacc_buf[pl.ds(r0, nrows + 2 * R), pl.ds(c0, wide), :], dg
            )
            dg = dg + csl[:, :, None] * gsl
        return dg

    def e_rows(dg, ty, tx, nrows: int):
        return jax.lax.slice(
            dg, (R - ty, R - tx, 0), (R - ty + nrows, R - tx + wp, F)
        )

    # owned rows m' = [i*TH+P, i*TH+TH+P): src band row offset P, margined
    # buffer row offset 2P
    src2d_main = src_vmem[pl.ds(PAD, th)].reshape(th * wp, c).astype(f32)
    dg_main = dg_rows(2 * PAD, th)
    for ti, (ty, tx) in enumerate(_offsets()):
        e_main = e_rows(dg_main, ty, tx, th).reshape(th * wp, F)
        dw_ref[ti] = dw_ref[ti] + jax.lax.dot_general(
            src2d_main, e_main,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )

    # the first tile additionally owns the top pad rows m' = [0, P)
    # (src band row offset 0, margined buffer row offset P)
    @pl.when(i == 0)
    def _():
        src2d_top = src_vmem[pl.ds(0, PAD)].reshape(PAD * wp, c).astype(f32)
        dg_top = dg_rows(PAD, PAD)
        for ti, (ty, tx) in enumerate(_offsets()):
            e_top = e_rows(dg_top, ty, tx, PAD).reshape(PAD * wp, F)
            dw_ref[ti] = dw_ref[ti] + jax.lax.dot_general(
                src2d_top, e_top,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=f32,
            )

    # the last tile additionally owns the bottom pad rows m' = [h+P, h+2P)
    # (src band row offset TH+P, margined buffer row offset TH+2P)
    @pl.when(i == n_i - 1)
    def _():
        src2d_tail = (
            src_vmem[pl.ds(th + PAD, PAD)].reshape(PAD * wp, c).astype(f32)
        )
        dg_tail = dg_rows(th + 2 * PAD, PAD)
        for ti, (ty, tx) in enumerate(_offsets()):
            e_tail = e_rows(dg_tail, ty, tx, PAD).reshape(PAD * wp, F)
            dw_ref[ti] = dw_ref[ti] + jax.lax.dot_general(
                src2d_tail, e_tail,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=f32,
            )


def _row_specs(th, w, lasts):
    """Row-tile BlockSpecs over (B, H, W[, last]) arrays for grid (b, i)."""
    out = []
    for last in lasts:
        if last is None:
            out.append(pl.BlockSpec(
                (1, th, w), lambda bb, i: (bb, i, 0),
                memory_space=pltpu.VMEM,
            ))
        else:
            out.append(pl.BlockSpec(
                (1, th, w, last),
                lambda bb, i: (bb, i, 0, 0),
                memory_space=pltpu.VMEM,
            ))
    return out


# --------------------------------------------------------------------- bwd
#
# Coordinate scheme shared by the backward kernels. "Padded" coords pr/px
# index the edge-padded canvas [0, H+2P) x [0, W+2P); image pixel (y, x)
# sits at (y+P, x+P). Cotangent fields ((V.g_out), (Cyx.g_acc)) are ZERO
# outside the image. Reverse-shift reads reach +-P beyond a tile's padded
# band, so band inputs arrive PRE-MARGINED from the host (_pad_margined:
# image content at offset (2P, 2P) inside (H+4P, WP2), zeros around) and
# each tile DMAs rows [i*TH, i*TH+THP+2P) as ONE contiguous offset-free
# copy — DMA destinations must be tile-aligned, so the old
# copy-into-(P,P)-offset scheme cannot lower.
# Buffer row br <-> pr = i*TH + (br - P); buffer col bc <-> px = bc - P.
#
# Gradient w.r.t. the un-padded source folds the edge-replicated margins
# onto the border pixels: rows only at the first/last tile (@pl.when),
# columns in every tile.


def _pad_margined(x, width: int, lane_to: int | None = None,
                  extra_rows: int = 0):
    """Host-side margined band source: image content at offset (2P, 2P)
    inside (..., H+4P+extra_rows, width[, last]) with zeros around
    (spatial axes 1, 2). `lane_to` additionally pads a trailing channel
    dim up to a DMA-legal lane extent (e.g. attn's 25 -> 128);
    `extra_rows` absorbs the 8-rounded field-buffer row count."""
    cfg = [(0, 0)] * x.ndim
    cfg[1] = (2 * PAD, 2 * PAD + extra_rows)
    cfg[2] = (2 * PAD, width - x.shape[2] - 2 * PAD)
    if lane_to is not None:
        cfg[3] = (0, lane_to - x.shape[3])
    return jnp.pad(x, cfg)


def _margin_dma(hbm, bb, i, th, buf, sem, cc=None):
    """DMA the tile's margined band (rows [i*TH, i*TH + THP + 2P) of the
    _pad_margined array) straight into `buf` (full-buffer destination).
    `cc` selects a channel chunk of buf.shape[-1] lanes (lane offsets are
    128-multiples by construction: chunks only exist when C % 128 == 0)."""
    if cc is None:
        src = hbm.at[bb, pl.ds(i * th, buf.shape[0])]
    else:
        src = hbm.at[
            bb, pl.ds(i * th, buf.shape[0]), slice(None),
            pl.ds(cc * buf.shape[2], buf.shape[2]),
        ]
    dma = pltpu.make_async_copy(src, buf, sem)
    dma.start()
    return dma


def _center(x, th, w):
    """Image-pixel block of a margined band buffer (rows rr=0..th-1 at
    br=rr+2P, cols x=0..w-1 at bc=x+2P)."""
    return jax.lax.slice(
        x, (2 * PAD, 2 * PAD) + (0,) * (x.ndim - 2),
        (2 * PAD + th, 2 * PAD + w) + x.shape[2:],
    )


def _fold_cols(gsp, th_rows, w):
    """Collapse padded cols [0,P) / [w+P, w+2P) of a (rows, w+2P, C) strip
    onto its border image columns; returns (rows, w, C)."""
    core = jax.lax.slice(gsp, (0, PAD, 0), (th_rows, PAD + w, gsp.shape[2]))
    left = jnp.sum(
        jax.lax.slice(gsp, (0, 0, 0), (th_rows, PAD, gsp.shape[2])),
        axis=1, keepdims=True,
    )
    right = jnp.sum(
        jax.lax.slice(gsp, (0, PAD + w, 0),
                      (th_rows, 2 * PAD + w, gsp.shape[2])),
        axis=1, keepdims=True,
    )
    zero = jnp.zeros((th_rows, w - 1, gsp.shape[2]), gsp.dtype)
    return (
        core
        + jnp.concatenate([left, zero], axis=1)
        + jnp.concatenate([zero, right], axis=1)
    )


def _bwd_c_kernel(src_hbm, gout_hbm, attn_hbm, fy_hbm, fx_hbm, wy_hbm, wx_hbm,
                  gsrc_ref, gattn_ref,
                  src_vmem, gout_buf, attn_buf, fy_buf, fx_buf, wy_buf, wx_buf,
                  sems,
                  *, th: int, h: int, w: int, wp: int, c: int):
    """Phase-C backward: g_src (output half) and g_attn.

    g_srcpad[q'] = (1/K2) sum_d (V_d . g_out)_pad[q' - d]
    g_attn_t[p]  = (1/K2) sum_e Cyx[e][p] . (g_out[p] . src[p + t + e])
    """
    f32 = jnp.float32
    bb = pl.program_id(0)
    i = pl.program_id(1)
    cc = pl.program_id(2)  # channel chunk (c is the CHUNK width here)
    n_i = pl.num_programs(1)
    thp = th + 2 * PAD

    d0 = pltpu.make_async_copy(
        src_hbm.at[bb, pl.ds(i * th, thp), slice(None), pl.ds(cc * c, c)],
        src_vmem, sems.at[0],
    )
    d0.start()
    dmas = [
        _margin_dma(gout_hbm, bb, i, th, gout_buf, sems.at[1], cc=cc),
        _margin_dma(attn_hbm, bb, i, th, attn_buf, sems.at[2]),
        _margin_dma(fy_hbm, bb, i, th, fy_buf, sems.at[3]),
        _margin_dma(fx_hbm, bb, i, th, fx_buf, sems.at[4]),
        _margin_dma(wy_hbm, bb, i, th, wy_buf, sems.at[5]),
        _margin_dma(wx_hbm, bb, i, th, wx_buf, sems.at[6]),
    ]
    for d in dmas:
        d.wait()
    d0.wait()

    # field buffers are (8,128)-rounded for DMA legality; slice back to
    # the common margined-band extent shared with the 4D bands
    mr = th + 4 * PAD
    w2 = _round8(wp + 2 * PAD)
    ay, ax = _coeff_axes(
        fy_buf[:mr, :w2].astype(jnp.int32), fx_buf[:mr, :w2].astype(jnp.int32),
        wy_buf[:mr, :w2], wx_buf[:mr, :w2],
    )  # margined (THP+2P, WP2); garbage at margins, nulled by attn=0 there

    # separable V build on the margined extent (zero wherever attn is
    # zero); one V_d live at a time — see the fwd kernel's phase C note.
    # gout/src are read through their refs at each use site: slicing a
    # loaded value let the scheduler hoist all 121 shifted copies and
    # spill 150MB of vregs.
    attn = attn_buf[:mr, :w2, :]  # one small load; per-ti value slices
    vx = _vx_fields(lambda ti: attn[:, :, ti], ax)

    def gsp_rows(row0: int, nrows: int):
        """g_srcpad strip for padded rows [i*TH + row0 - P, ...): row0 is
        the buffer-row offset of the strip (interior strip: row0=2P).
        Every gout load is _tie'd to the accumulator (register pressure);
        products in the stored dtype (bf16 in production), f32 sum."""
        acc = jnp.zeros((nrows, w + 2 * PAD, c), f32)
        for dy in range(-PAD, PAD + 1):
            for dx in range(-PAD, PAD + 1):
                r0 = row0 - dy
                c0 = PAD - dx
                vsl = _v_of(vx, ay, dy, dx,
                            window=(r0, c0, nrows, w + 2 * PAD))
                if vsl is None:
                    continue
                gsl = _tie(
                    gout_buf[pl.ds(r0, nrows), pl.ds(c0, w + 2 * PAD), :],
                    acc,
                )
                acc = acc + vsl[:, :, None].astype(gsl.dtype) * gsl
        return acc

    gsrc = _fold_cols(gsp_rows(2 * PAD, th), th, w)

    # fold the edge-replicated row margins onto the border rows: the
    # first/last-tile gate is a branch-free multiplier (the margin strips
    # are only P=5 rows; cheaper than @pl.when block duplication)
    def row_margin(row0):
        return jnp.sum(_fold_cols(gsp_rows(row0, PAD), PAD, w), axis=0)

    first = jnp.where(i == 0, 1.0, 0.0).astype(f32)
    last = jnp.where(i == n_i - 1, 1.0, 0.0).astype(f32)
    top = row_margin(PAD) * first  # padded rows [0, P) -> image row 0
    bot = row_margin(2 * PAD + th) * last  # [h+P, h+2P) -> image row h-1
    gsrc = jnp.concatenate(
        [gsrc[:1] + top[None], gsrc[1:-1], gsrc[-1:] + bot[None]], axis=0
    )
    gsrc_ref[0] = (gsrc / (K * K)).astype(gsrc_ref.dtype)

    # g_attn on the image tile:
    #   g_attn_t[p] = (1/K2) sum_e Cyx[e][p] . sdot[(t+e)][p],
    #   sdot[d][p] = g_out[p] . src[p + d]
    # contracted separably (x then y); sdots live one d-row at a time
    gout_c = gout_buf[pl.ds(2 * PAD, th), pl.ds(2 * PAD, w), :]
    ay_c = {e: _center(a, th, w) for e, a in ay.items()}
    ax_c = {e: _center(a, th, w) for e, a in ax.items()}
    sx = {}  # Sx[(ry, tx)] = sum_ex ax[ex] * sdot[(ry, tx+ex)]
    tok = gout_c  # serialization token: each src load _tie'd to the
    # previous reduction so only one C-wide product is in flight
    for ry in range(-PAD, PAD + 1):
        row = {}
        for dx in range(-PAD, PAD + 1):
            ssl = _tie(
                src_vmem[pl.ds(PAD + ry, th), pl.ds(PAD + dx, w), :], tok
            )
            # bf16 products, f32 reduction
            row[dx] = jnp.sum((gout_c * ssl).astype(f32), axis=-1)
            tok = row[dx]
        for tx in range(-R, R + 1):
            acc2 = None
            for ex in range(EY_LO, EY_HI + 1):
                t2 = ax_c[ex] * row[tx + ex]
                acc2 = t2 if acc2 is None else acc2 + t2
            sx[(ry, tx)] = acc2
    gattn = []
    for (ty, tx) in _offsets():
        g_ = None
        for ey in range(EY_LO, EY_HI + 1):
            t2 = ay_c[ey] * sx[(ty + ey, tx)]
            g_ = t2 if g_ is None else g_ + t2
        gattn.append(g_)
    # g_attn sums over ALL channels; partial (per-chunk) contributions
    # accumulate in the revisited output block (cc is the innermost grid
    # dim, so the revisits are consecutive)
    @pl.when(cc == 0)
    def _():
        gattn_ref[...] = jnp.zeros(gattn_ref.shape, gattn_ref.dtype)

    gattn_ref[0] = gattn_ref[0] + jnp.stack(gattn, axis=-1) / (K * K)


def _fwd_call(src, acc0, w0s, w1, b1, fy_rel, fx_rel, wy, wx,
              interpret=False):
    """Forward pallas_call: returns (out, acc, attn) — acc/attn are the
    f32 residuals consumed by the custom VJP."""
    _set_tie(interpret)
    b, h, w, c = src.shape
    th = _row_tile(h, w, c)
    wp = _round8(w + 2 * PAD)
    thp = th + 2 * PAD
    src_pad = _pad_halo(src, 1, 2, wp, "edge")
    grid = (b, h // th)

    kernel = functools.partial(_fwd_kernel, th=th, h=h, w=w, wp=wp, c=c)
    out, acc, attn = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # src_pad stays in HBM
            *_row_specs(th, w, [F, None, None, None, None]),
            pl.BlockSpec((K2, c, F), lambda bb, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, K2), lambda bb, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K2), lambda bb, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=_row_specs(th, w, [c, F, K2]),
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w, c), src.dtype),
            jax.ShapeDtypeStruct((b, h, w, F), jnp.float32),
            jax.ShapeDtypeStruct((b, h, w, K2), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((thp, wp, c), src.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
        compiler_params=_params(),
    )(src_pad, acc0, fy_rel, fx_rel, wy, wx, w0s, w1, b1)
    return out, acc, attn


def _geom(src):
    b, h, w, c = src.shape
    th = _row_tile(h, w, c)
    # backward kernels are channel-chunked: cw is the per-program chunk
    # width (full width when C is not a multiple of 128 — tiny CPU/test
    # configs — or C == 128)
    cw = 128 if (c % 128 == 0 and c > 128) else c
    return dict(
        b=b, h=h, w=w, c=c, th=th, cw=cw, n_cc=c // cw,
        wp=_round8(w + 2 * PAD),
        thp=th + 2 * PAD,
        grid=(b, h // th),
    )


def _round128(x: int) -> int:
    return -(-x // 128) * 128


def _field_bufs(g):
    """Margined-band buffer geometry. The 2D flow-field bands are widened
    to a 128-multiple and their row count rounded to 8 (width is their
    LANE dim and rows their SUBLANE dim; DMA'd memref slices must align
    to the (8,128) tiling). The 4D bands keep (mrows, wp2): their rows
    are an untiled outer dim and wp2 is already 8-aligned. The host pads
    _pad_margined arrays with the row surplus so the last tile's
    mrows8-row field copy stays in bounds."""
    mrows = g["thp"] + 2 * PAD
    wp2 = _round8(g["wp"] + 2 * PAD)
    wpl = _round128(wp2)
    mrows8 = _round8(mrows)
    f32 = jnp.float32
    bufs = [pltpu.VMEM((mrows8, wpl), f32) for _ in range(4)]
    return bufs, mrows, wp2, wpl, mrows8 - mrows


def _bwd_c_call(src, fy_rel, fx_rel, wy, wx, attn, g_out, interpret=False):
    """Phase-C backward kernels: (g_src_outputhalf, g_attn)."""
    _set_tie(interpret)
    g = _geom(src)
    f32 = jnp.float32
    fields, mrows, wp2, wpl, xr = _field_bufs(g)
    src_pad = _pad_halo(src, 1, 2, g["wp"], "edge")
    gout_pad = _pad_margined(g_out.astype(src.dtype), wp2, extra_rows=xr)
    attn_pad = _pad_margined(attn, wp2, lane_to=_round128(K2), extra_rows=xr)
    pads = [_pad_margined(x, wpl, extra_rows=xr)
            for x in (fy_rel, fx_rel, wy, wx)]
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    cw = g["cw"]
    return pl.pallas_call(
        functools.partial(
            _bwd_c_kernel, th=g["th"], h=g["h"], w=g["w"], wp=g["wp"],
            c=cw,
        ),
        grid=(*g["grid"], g["n_cc"]),  # cc innermost: gattn revisits
        in_specs=[any_spec] * 7,
        out_specs=[
            pl.BlockSpec((1, g["th"], g["w"], cw),
                         lambda bb, i, cc: (bb, i, 0, cc),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, g["th"], g["w"], K2),
                         lambda bb, i, cc: (bb, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g["b"], g["h"], g["w"], g["c"]), f32),
            jax.ShapeDtypeStruct((g["b"], g["h"], g["w"], K2), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((g["thp"], g["wp"], cw), src.dtype),
            pltpu.VMEM((mrows, wp2, cw), src.dtype),
            pltpu.VMEM((mrows, wp2, _round128(K2)), f32),
            *fields,
            pltpu.SemaphoreType.DMA((7,)),
        ],
        interpret=interpret,
        compiler_params=_params(),
    )(src_pad, gout_pad, attn_pad, *pads)


def _bwd_a_call(src, w0s, fy_rel, fx_rel, wy, wx, g_acc, interpret=False):
    """Phase-A backward kernels: (g_src_fc0half, dW)."""
    _set_tie(interpret)
    g = _geom(src)
    f32 = jnp.float32
    fields, mrows, wp2, wpl, xr = _field_bufs(g)
    src_pad = _pad_halo(src, 1, 2, g["wp"], "edge")
    gacc_pad = _pad_margined(g_acc, wp2, extra_rows=xr)
    pads = [_pad_margined(x, wpl, extra_rows=xr)
            for x in (fy_rel, fx_rel, wy, wx)]
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    cw = g["cw"]
    kw = dict(th=g["th"], h=g["h"], w=g["w"], wp=g["wp"], c=cw)
    gsrc_a = pl.pallas_call(
        functools.partial(_bwd_a_gsrc_kernel, **kw),
        grid=(*g["grid"], g["n_cc"]),
        in_specs=[any_spec] * 5 + [
            pl.BlockSpec((K2, cw, F), lambda bb, i, cc: (0, cc, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, g["th"], g["w"], cw),
                               lambda bb, i, cc: (bb, i, 0, cc),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g["b"], g["h"], g["w"], g["c"]), f32),
        scratch_shapes=[
            pltpu.VMEM((mrows, wp2, F), f32),
            *fields,
            pltpu.SemaphoreType.DMA((5,)),
        ],
        interpret=interpret,
        compiler_params=_params(),
    )(gacc_pad, *pads, w0s)
    fields2 = _field_bufs(g)[0]
    dw = pl.pallas_call(
        functools.partial(_bwd_a_dw_kernel, **kw),
        # cc OUTERMOST: each chunk's dw block accumulates over the (b, i)
        # sweep as consecutive revisits
        grid=(g["n_cc"], *g["grid"]),
        in_specs=[any_spec] * 6,
        out_specs=pl.BlockSpec((K2, cw, F), lambda cc, bb, i: (0, cc, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K2, g["c"], F), f32),
        scratch_shapes=[
            pltpu.VMEM((g["thp"], g["wp"], cw), src.dtype),
            pltpu.VMEM((mrows, wp2, F), f32),
            *fields2,
            pltpu.SemaphoreType.DMA((6,)),
        ],
        interpret=interpret,
        compiler_params=_params(),
    )(src_pad, gacc_pad, *pads)
    return gsrc_a, dw


# ------------------------------------------------------------- public op


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def flow_attention_fused(src, acc0, w0s, w1, b1, fy_rel, fx_rel, wy, wx,
                         interpret=False):
    """Fused flow-guided local attention (k=5).

    src:  (B, H, W, C) source features (compute dtype)
    acc0: (B, H, W, 128) f32 — fc_0 target half + bias (XLA conv outside)
    w0s:  (25, C, 128) fc_0 source-half weights (compute dtype)
    w1:   (128, 25) f32 fc_1 kernel; b1: (1, 25) f32 fc_1 bias
    fy_rel/fx_rel/wy/wx: (B, H, W) f32 flow fields (_flow_fields)

    Returns the attention output (B, H, W, C) in src.dtype. Flow fields
    receive zero cotangents (the HOGAN flow is data, not parameters).
    """
    out, _, _ = _fwd_call(src, acc0, w0s, w1, b1, fy_rel, fx_rel, wy, wx,
                          interpret=interpret)
    return out


def _faf_fwd(src, acc0, w0s, w1, b1, fy_rel, fx_rel, wy, wx, interpret):
    out, acc, attn = _fwd_call(src, acc0, w0s, w1, b1, fy_rel, fx_rel, wy, wx,
                               interpret=interpret)
    return out, (src, w0s, w1, fy_rel, fx_rel, wy, wx, acc, attn)


def _faf_bwd(interpret, res, g_out):
    src, w0s, w1, fy_rel, fx_rel, wy, wx, acc, attn = res
    f32 = jnp.float32
    b, h, w, _ = src.shape

    # phase C backward (kernel): g_src output-half + g_attn
    gsrc_c, g_attn = _bwd_c_call(
        src, fy_rel, fx_rel, wy, wx, attn, g_out, interpret=interpret
    )

    # phase B backward (XLA): softmax -> fc_1 -> leaky_relu (all cheap)
    g_logits = attn * (g_attn - jnp.sum(attn * g_attn, -1, keepdims=True))
    g_hdn = jnp.einsum("bhwk,fk->bhwf", g_logits, w1.astype(f32))
    hdn = jnp.where(acc >= 0, acc, 0.01 * acc)
    g_w1 = jnp.einsum("bhwf,bhwk->fk", hdn, g_logits)
    g_b1 = jnp.sum(g_logits, axis=(0, 1, 2))[None]
    g_acc = jnp.where(acc >= 0, g_hdn, 0.01 * g_hdn)

    # phase A backward (kernels): g_src fc_0-half + dW; g_acc0 = g_acc
    gsrc_a, dw = _bwd_a_call(
        src, w0s, fy_rel, fx_rel, wy, wx, g_acc, interpret=interpret
    )

    zeros = jnp.zeros((b, h, w), f32)
    return (
        (gsrc_c + gsrc_a).astype(src.dtype),
        g_acc,
        dw.astype(w0s.dtype),
        g_w1.astype(w1.dtype),
        g_b1.astype(f32),
        zeros, zeros, zeros, zeros,
    )


flow_attention_fused.defvjp(_faf_fwd, _faf_bwd)
