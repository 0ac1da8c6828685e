"""MXU one-hot row gather from small per-sample tables.

Every fim-indexed lookup in the conditioning stage reads rows from a
table with at most a few thousand rows (per-face attributes: barycentric
planes, cond/sem values, atlas uv corners, projected face corners —
renderer.build_attr_table / the rasterizer finish). XLA lowers these to
HBM row gathers that run at ~26-33M rows/s on TPU (issue-rate-bound, ~1
row per ~30 cycles): at 256^2 pixels x batch 8 a single gather pass costs
~8-16 ms — the dominant share of the step's geometry bucket (PERF.md).

Because the tables are tiny, the gather is better spent on the MXU:
keep the table VMEM-resident, build a one-hot(idx) tile, and matmul —

    out[p, :] = one_hot(idx[p], R) @ table            (exactly a gather)

at ~60 GFLOP per full-image pass this is < 1 ms of MXU time instead of
>10 ms of gather issue. The kernel tiles pixels over a grid, builds the
(R, P_TILE) one-hot transposed in VMEM, and emits the output
CHANNEL-FIRST (B, A, P) so downstream NCHW consumers need no layout copy.

Exactness: the one-hot is exactly representable in bf16; the f32 table is
split into three bf16 planes t1 + t2 + t3 == t (8+8+8 mantissa bits >=
f32's 24), so three bf16 MXU passes accumulated in f32 reproduce the f32
row values bit-exactly (each output element is 1*t_k summed in f32 with
no rounding: the three addends are the exact split terms).

Replaces (performance only; semantics preserved): the reference gathers
these tables per-sample with `torch.gather`/indexing in
HOIG_HOv3/utils/nmr.py:567-595 (encode_fim/encode_sem) and :915-923
(barycentric warps).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P_TILE = 512


def _split3_bf16(t: jax.Array) -> jax.Array:
    """Exact 3-term bf16 split of an f32 array: sum(planes) == t, where
    the sum is evaluated left-to-right in f32 (as the kernel's pass
    accumulator does).

    Returns (3, *t.shape) bf16. TRUNCATION splitting (mask the low 16
    bits; bf16 is exactly the top 16 bits of f32), not round-to-nearest:
    truncation makes every partial sum t1, t1+t2, t1+t2+t3 a bit-prefix
    of t's mantissa, hence exactly representable — so the f32 additions
    themselves never round (round-to-nearest terms can sum exactly in
    reals yet round in f32, observed 1-ulp errors on ~88% of random
    values).
    """
    t = t.astype(jnp.float32)

    def trunc(x):
        return jax.lax.bitcast_convert_type(
            jax.lax.bitcast_convert_type(x, jnp.uint32) & jnp.uint32(0xFFFF0000),
            jnp.float32,
        )

    t1 = trunc(t)
    r1 = t - t1
    t2 = trunc(r1)
    r2 = r1 - t2  # <= 8 significant bits left: exact in bf16
    return jnp.stack(
        [t1.astype(jnp.bfloat16), t2.astype(jnp.bfloat16),
         r2.astype(jnp.bfloat16)],
        axis=0,
    )


def _gather_kernel(idx_ref, tab_ref, out_ref, *, r_pad):
    """One (batch, pixel-tile) program: out[A, P_TILE] = tab @ one_hot.

    idx_ref: (1, 1, 1, P_TILE) int32 (unit axes satisfy the Mosaic
    block-shape rule); tab_ref: (1, 3, A_pad, r_pad) bf16 (the 3 exact
    split planes); out_ref: (1, A_pad, P_TILE) f32.
    """
    idx = idx_ref[0, 0, 0, :]  # (P_TILE,)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (r_pad, P_TILE), 0)
    one_hot = (iota_r == idx[None, :]).astype(jnp.bfloat16)  # (R, P)
    acc = jnp.zeros(out_ref.shape[1:], jnp.float32)
    for k in range(3):
        acc = acc + jax.lax.dot_general(
            tab_ref[0, k],
            one_hot,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[0] = acc


def gather_rows_mxu(table: jax.Array, idx: jax.Array) -> jax.Array:
    """Row gather via MXU one-hot matmuls; channel-first output.

    Args:
      table: (B, R, A) float32 — small per-sample row table (R up to a few
        thousand; it must fit VMEM as (A_pad, R_pad) x 3 bf16 planes).
      idx: (B, P) int32 row indices in [0, R).

    Returns:
      (B, A, P) float32 with out[b, :, p] == table[b, idx[b, p], :] —
      bit-identical to take_along_axis, laid out channel-first.
    """
    b, r, a = table.shape
    p = idx.shape[1]
    r_pad = -(-r // 128) * 128
    a_pad = -(-a // 8) * 8
    p_pad = -(-p // P_TILE) * P_TILE

    tab = jnp.pad(table, ((0, 0), (0, r_pad - r), (0, a_pad - a)))
    tab_t = _split3_bf16(tab.transpose(0, 2, 1)).transpose(1, 0, 2, 3)
    # (B, 3, A_pad, R_pad) bf16
    idx_p = jnp.pad(idx, ((0, 0), (0, p_pad - p))).reshape(
        b, p_pad // P_TILE, 1, P_TILE
    )

    out = pl.pallas_call(
        functools.partial(_gather_kernel, r_pad=r_pad),
        grid=(b, p_pad // P_TILE),
        in_specs=[
            pl.BlockSpec((1, 1, 1, P_TILE), lambda bb, tp: (bb, tp, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, a_pad, r_pad), lambda bb, tp: (bb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, a_pad, P_TILE), lambda bb, tp: (bb, 0, tp),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, a_pad, p_pad), jnp.float32),
        interpret=jax.default_backend() != "tpu",
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * b * p_pad * r_pad * a_pad,
            bytes_accessed=b * (4 * p_pad + 3 * 2 * a_pad * r_pad
                                + 4 * a_pad * p_pad),
            transcendentals=0,
        ),
    )(idx_p, tab_t)
    return out[:, :a, :p]


def gather_rows(table: jax.Array, idx: jax.Array) -> jax.Array:
    """Backend-dispatched row gather, channel-first (B, A, P).

    TPU: MXU one-hot kernel. Elsewhere: plain take_along_axis (the
    interpret-mode kernel is exact but slow on CPU test meshes).
    """
    from hoig_tpu.ops import compile_lite

    if jax.default_backend() == "tpu" and not compile_lite():
        return gather_rows_mxu(table, idx)
    rows = jnp.take_along_axis(table, idx[..., None], axis=1)
    return rows.transpose(0, 2, 1)
