"""Flow-guided local attention primitives.

Capability parity with the reference's two bespoke CUDA extensions that
power `ExtractorAttn` (HOIG_HOv3/models/networks/extract_attn.py:8-37):

  * `block_extractor` — thirdparty/block_extractor/block_extractor_kernel.cu:
    for every output pixel of a k×k-expanded grid, offset the per-block flow
    vector by the in-block position and bilinearly sample the source.
    Out-of-range samples replicate the border (the CUDA kernel clamps the
    four corner indices but keeps the unclamped fractional weights).
    IMPORTANT quirk kept: flow is interpreted in *pixel units* and is added
    directly to the block index (kernel lines 58-68), even though the
    caller hands it a normalized-coordinate difference.

  * `local_attn_reshape` — thirdparty/local_attn_reshape/*.cu: scatter the
    k² channels of each spatial location into a k×k spatial block. On TPU
    this is literally a reshape+transpose, so no kernel exists.

TPU-native design notes: both ops are expressed as dense gathers /
transposes, so `jax.grad` reproduces the CUDA backward exactly —
d(bilinear)/d(flow) matches block_extractor_kernel.cu:163-168 because
`floor` has zero gradient, and the atomicAdd scatter of grad_source becomes
a deterministic XLA scatter-add (an improvement: the reference accepted
nondeterministic accumulation order).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("kernel_size",))
def block_extractor(source: jax.Array, flow: jax.Array, kernel_size: int) -> jax.Array:
    """Extract flow-offset k×k blocks from `source`.

    Args:
      source: (B, C, H, W).
      flow: (B, 2, H, W); channel 0 = x offset, 1 = y offset, pixel units.
      kernel_size: k.

    Returns:
      (B, C, k*H, k*W) array.
    """
    b, c, h, w = source.shape
    k = kernel_size

    # Block-relative offsets: y % k - k//2 (kernel :58-61).
    oy = jax.lax.broadcasted_iota(jnp.int32, (h * k, w * k), 0) % k - k // 2
    ox = jax.lax.broadcasted_iota(jnp.int32, (h * k, w * k), 1) % k - k // 2
    yf = jax.lax.broadcasted_iota(jnp.int32, (h * k, w * k), 0) // k
    xf = jax.lax.broadcasted_iota(jnp.int32, (h * k, w * k), 1) // k

    ft = flow.dtype
    flow_up = jnp.repeat(jnp.repeat(flow, k, axis=2), k, axis=3)  # (B,2,kh,kw)
    dx = flow_up[:, 0] + (ox + xf).astype(ft)  # (B, kh, kw)
    dy = flow_up[:, 1] + (oy + yf).astype(ft)

    x0 = jnp.floor(dx)
    y0 = jnp.floor(dy)
    tx = dx - x0
    ty = dy - y0

    src_flat = source.reshape(b, c, h * w)
    out = None
    for dyi, wy in ((0, 1.0 - ty), (1, ty)):
        ycl = jnp.clip(y0 + dyi, 0, h - 1).astype(jnp.int32)
        for dxi, wx in ((0, 1.0 - tx), (1, tx)):
            xcl = jnp.clip(x0 + dxi, 0, w - 1).astype(jnp.int32)
            idx = (ycl * w + xcl).reshape(b, 1, -1)
            vals = jnp.take_along_axis(src_flat, idx, axis=2)
            contrib = vals * (wy * wx).reshape(b, 1, -1).astype(source.dtype)
            out = contrib if out is None else out + contrib
    return out.reshape(b, c, h * k, w * k)


@functools.partial(jax.jit, static_argnames=("kernel_size",))
def local_attn_reshape(x: jax.Array, kernel_size: int) -> jax.Array:
    """Scatter k² channels into k×k spatial blocks.

    Args:
      x: (B, k*k, H, W); channel index = oy*k + ox in-block position.
      kernel_size: k.

    Returns:
      (B, 1, k*H, k*W) array.
    """
    b, kk, h, w = x.shape
    k = kernel_size
    if kk != k * k:
        raise ValueError(f"channel dim {kk} != kernel_size^2 {k * k}")
    x = x.reshape(b, k, k, h, w)  # (B, oy, ox, H, W)
    x = x.transpose(0, 3, 1, 4, 2)  # (B, H, oy, W, ox)
    return x.reshape(b, 1, h * k, w * k)


@functools.partial(jax.jit, static_argnames=("kernel_size",))
def block_extractor_nhwc(
    source: jax.Array, flow: jax.Array, kernel_size: int
) -> jax.Array:
    """NHWC layout block extractor (TPU-native for the conv nets).

    Args:
      source: (B, H, W, C).
      flow: (B, H, W, 2); [..., 0] = x offset, [..., 1] = y offset, in the
        reference's pixel-unit interpretation.
      kernel_size: k.

    Returns:
      (B, k*H, k*W, C) array.
    """
    b, h, w, c = source.shape
    k = kernel_size

    oy = jax.lax.broadcasted_iota(jnp.int32, (h * k, w * k), 0) % k - k // 2
    ox = jax.lax.broadcasted_iota(jnp.int32, (h * k, w * k), 1) % k - k // 2
    yf = jax.lax.broadcasted_iota(jnp.int32, (h * k, w * k), 0) // k
    xf = jax.lax.broadcasted_iota(jnp.int32, (h * k, w * k), 1) // k

    ft = flow.dtype
    flow_up = jnp.repeat(jnp.repeat(flow, k, axis=1), k, axis=2)  # (B,kh,kw,2)
    dx = flow_up[..., 0] + (ox + xf).astype(ft)
    dy = flow_up[..., 1] + (oy + yf).astype(ft)

    x0 = jnp.floor(dx)
    y0 = jnp.floor(dy)
    tx = dx - x0
    ty = dy - y0

    src_flat = source.reshape(b, h * w, c)
    out = None
    for dyi, wy in ((0, 1.0 - ty), (1, ty)):
        ycl = jnp.clip(y0 + dyi, 0, h - 1).astype(jnp.int32)
        for dxi, wx in ((0, 1.0 - tx), (1, tx)):
            xcl = jnp.clip(x0 + dxi, 0, w - 1).astype(jnp.int32)
            idx = (ycl * w + xcl).reshape(b, -1, 1)
            vals = jnp.take_along_axis(src_flat, idx, axis=1)
            contrib = vals * (wy * wx).reshape(b, -1, 1).astype(source.dtype)
            out = contrib if out is None else out + contrib
    return out.reshape(b, h * k, w * k, c)


@functools.partial(jax.jit, static_argnames=("kernel_size",))
def local_attn_reshape_nhwc(x: jax.Array, kernel_size: int) -> jax.Array:
    """NHWC layout scatter: (B, H, W, k*k) -> (B, k*H, k*W, 1)."""
    b, h, w, kk = x.shape
    k = kernel_size
    if kk != k * k:
        raise ValueError(f"channel dim {kk} != kernel_size^2 {k * k}")
    x = x.reshape(b, h, w, k, k)  # (B, H, W, oy, ox)
    x = x.transpose(0, 1, 3, 2, 4)  # (B, H, oy, W, ox)
    return x.reshape(b, h * k, w * k, 1)
