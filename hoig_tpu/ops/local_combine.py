"""Pallas TPU kernel: per-pixel weighted combination of bounded shifts.

    out[b, y, x, :] = sum_d  v[b, y, x, d] * src[b, y+dy_d, x+dx_d, :]

with the (2R+1)^2 static offsets (dy, dx) in [-R, R]^2 (row-major d) and
`src` pre-padded by R on each spatial side.

This is the bandwidth core of the flow-guided attention's shift engine
(models/generator.py::_shift_engine): the fc_0 source half combines 49
shifted reads of the projected source G, and the output phase combines
121 shifted reads of the source, each weighted by a per-pixel coefficient
field. XLA evaluates those as dozens of separate fusions that each
re-read the (B, H, W, C) operand from HBM — measured 29.3 ms fwd+bwd for
the single 128px attention layer (scripts/attn_ab.py, honest chained
timing). Here each grid program keeps one batch element's tile resident
in VMEM and the d-loop re-reads it at register speed; the custom VJP uses
the same structure with reversed shifts (dsrc) and per-offset channel
dots (dv) — no scatter, no HBM re-reads.

Replaces (performance only): the accumulation loops in
HOIG_HOv3/thirdparty/block_extractor/block_extractor_kernel.cu:20-170
served this role for the reference's CUDA attention.

All accumulation is f32 regardless of input dtype (a numerical
improvement over the XLA engine's compute-dtype chain, noted not hidden).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 48 * 1024 * 1024


def _params():
    return pltpu.CompilerParams(
        vmem_limit_bytes=_VMEM_LIMIT,
    )


def _round_up(x: int, n: int) -> int:
    return -(-x // n) * n


def _fwd_kernel(src_ref, v_ref, out_ref, *, radius, h, w):
    k = 2 * radius + 1
    c = src_ref.shape[-1]
    acc = jnp.zeros((h, w, c), jnp.float32)
    for d in range(k * k):
        dy, dx = d // k, d % k
        sl = src_ref[0, dy : dy + h, dx : dx + w, :]
        vd = v_ref[0, :, :, d : d + 1]
        acc = acc + sl.astype(jnp.float32) * vd.astype(jnp.float32)
    out_ref[0] = acc.astype(out_ref.dtype)


def _bwd_src_kernel(g_ref, v_ref, dsrc_ref, *, radius, h, w):
    """dsrc[q] = sum_d v[q - off_d, d] * g[q - off_d] — accumulate each
    offset's contribution into the padded-frame output slice."""
    k = 2 * radius + 1
    c = g_ref.shape[-1]
    dsrc_ref[0] = jnp.zeros(dsrc_ref.shape[1:], dsrc_ref.dtype)
    for d in range(k * k):
        dy, dx = d // k, d % k
        term = (
            g_ref[0].astype(jnp.float32)
            * v_ref[0, :, :, d : d + 1].astype(jnp.float32)
        )
        cur = dsrc_ref[0, dy : dy + h, dx : dx + w, :]
        dsrc_ref[0, dy : dy + h, dx : dx + w, :] = (
            cur + term.astype(dsrc_ref.dtype)
        )


def _bwd_v_kernel(src_ref, g_ref, dv_ref, *, radius, h, w):
    """dv[p, d] = <g[p], src[p + off_d]>_C."""
    k = 2 * radius + 1
    g = g_ref[0].astype(jnp.float32)
    for d in range(k * k):
        dy, dx = d // k, d % k
        sl = src_ref[0, dy : dy + h, dx : dx + w, :].astype(jnp.float32)
        dv_ref[0, :, :, d] = jnp.sum(g * sl, axis=-1).astype(dv_ref.dtype)


def _interp() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def local_combine(src_pad: jax.Array, v: jax.Array, radius: int) -> jax.Array:
    """out[b,y,x,:] = sum_d v[b,y,x,d] * src_pad[b, y+d//K, x+d%K, :].

    Args:
      src_pad: (B, H+2R, W+2R, C) — the source, pre-padded by R per side
        (any pad mode; its VJP is XLA's business outside this op).
      v: (B, H, W, D) with D >= (2R+1)^2; offset d = (dy+R)*(2R+1)+(dx+R).
        Columns beyond (2R+1)^2 are ignored.
      radius: R (static).

    Returns (B, H, W, C) in src_pad.dtype; f32 accumulation inside.
    """
    return _lc_fwd_impl(src_pad, v, radius)


def _lc_fwd_impl(src_pad, v, radius):
    b, hp, wp, c = src_pad.shape
    h, w = hp - 2 * radius, wp - 2 * radius
    d_pad = _round_up(v.shape[-1], 128)
    if v.shape[-1] != d_pad:
        v = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, d_pad - v.shape[-1])))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, radius=radius, h=h, w=w),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hp, wp, c), lambda bb: (bb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, d_pad), lambda bb: (bb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda bb: (bb, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), src_pad.dtype),
        interpret=_interp(),
        compiler_params=None if _interp() else _params(),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * c * (2 * radius + 1) ** 2,
            bytes_accessed=b * (hp * wp * c + h * w * d_pad + h * w * c) * 2,
            transcendentals=0,
        ),
    )(src_pad, v)
    return out


def _lc_fwd(src_pad, v, radius):
    return _lc_fwd_impl(src_pad, v, radius), (src_pad, v)


def _lc_bwd(radius, res, g):
    src_pad, v = res
    b, hp, wp, c = src_pad.shape
    h, w = hp - 2 * radius, wp - 2 * radius
    d_real = (2 * radius + 1) ** 2
    d_pad = _round_up(v.shape[-1], 128)
    v_p = v
    if v.shape[-1] != d_pad:
        v_p = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, d_pad - v.shape[-1])))

    dsrc = pl.pallas_call(
        functools.partial(_bwd_src_kernel, radius=radius, h=h, w=w),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda bb: (bb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, d_pad), lambda bb: (bb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hp, wp, c), lambda bb: (bb, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hp, wp, c), src_pad.dtype),
        interpret=_interp(),
        compiler_params=None if _interp() else _params(),
    )(g, v_p)

    dv = pl.pallas_call(
        functools.partial(_bwd_v_kernel, radius=radius, h=h, w=w),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hp, wp, c), lambda bb: (bb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, c), lambda bb: (bb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, d_pad), lambda bb: (bb, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, d_pad), jnp.float32),
        interpret=_interp(),
        compiler_params=None if _interp() else _params(),
    )(src_pad, g)
    dv = dv[..., : v.shape[-1]].astype(v.dtype)
    if v.shape[-1] > d_real:
        # ignored columns get zero gradient
        dv = dv.at[..., d_real:].set(0.0)
    return dsrc, dv


local_combine.defvjp(_lc_fwd, _lc_bwd)


def local_combine_reference(src_pad: jax.Array, v: jax.Array, radius: int):
    """Plain-XLA evaluation (the shift engine's original loop form), used
    as the numerical oracle in tests and on backends without the kernel."""
    b, hp, wp, c = src_pad.shape
    h, w = hp - 2 * radius, wp - 2 * radius
    k = 2 * radius + 1
    out = jnp.zeros((b, h, w, c), jnp.float32)
    for d in range(k * k):
        dy, dx = d // k, d % k
        sl = jax.lax.slice_in_dim(
            jax.lax.slice_in_dim(src_pad, dy, dy + h, axis=1), dx, dx + w, axis=2
        )
        out = out + sl.astype(jnp.float32) * v[..., d : d + 1].astype(jnp.float32)
    return out.astype(src_pad.dtype)
