"""Bilinear warping / resampling primitives (torch-compatible semantics).

The reference drives all of its warps through `F.grid_sample` and
`F.interpolate` (HOIG_HOv3/models/networks/generator.py:466-491,
models/trainer.py:85-87, utils/nmr.py:1048). These are gather-style ops:
on TPU they lower to vectorized dynamic-gathers over a flattened image —
no kernel needed, XLA fuses the weight math into the gather consumers.

Conventions (matching torch):
  * images are NCHW,
  * grid is (N, Ho, Wo, 2) with grid[..., 0] = x (width coord),
    grid[..., 1] = y (height coord), both in [-1, 1],
  * padding_mode='zeros': out-of-range corners contribute 0,
  * align_corners=False maps -1/1 to the outer pixel *edges*
    (ix = ((x + 1) * W - 1) / 2); True maps to pixel *centers*
    (ix = (x + 1) / 2 * (W - 1)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _unnormalize(coord: jax.Array, size: int, align_corners: bool) -> jax.Array:
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def grid_sample(
    image: jax.Array, grid: jax.Array, align_corners: bool = False
) -> jax.Array:
    """Bilinear sample `image` at `grid` locations, zeros padding.

    Args:
      image: (N, C, H, W).
      grid: (N, Ho, Wo, 2); x = grid[..., 0], y = grid[..., 1] in [-1, 1].
      align_corners: torch semantics (see module docstring).

    Returns:
      (N, C, Ho, Wo) array, dtype of `image`.
    """
    n, c, h, w = image.shape
    gx = _unnormalize(grid[..., 0].astype(jnp.float32), w, align_corners)
    gy = _unnormalize(grid[..., 1].astype(jnp.float32), h, align_corners)

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    tx = gx - x0
    ty = gy - y0

    out = None
    img_flat = image.reshape(n, c, h * w)
    for dy, wy in ((0, 1.0 - ty), (1, ty)):
        yi = y0 + dy
        y_ok = (yi >= 0) & (yi <= h - 1)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        for dx, wx in ((0, 1.0 - tx), (1, tx)):
            xi = x0 + dx
            x_ok = (xi >= 0) & (xi <= w - 1)
            xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
            weight = jnp.where(y_ok & x_ok, wy * wx, 0.0)  # (N, Ho, Wo)
            idx = (yc * w + xc).reshape(n, 1, -1)  # (N, 1, Ho*Wo)
            vals = jnp.take_along_axis(img_flat, idx, axis=2)  # (N, C, Ho*Wo)
            contrib = vals * weight.reshape(n, 1, -1).astype(image.dtype)
            out = contrib if out is None else out + contrib
    ho, wo = grid.shape[1], grid.shape[2]
    return out.reshape(n, c, ho, wo)


def grid_sample_packed(
    image: jax.Array, grid: jax.Array, align_corners: bool = False
) -> jax.Array:
    """`grid_sample`, TPU-tuned: ONE wide-row gather instead of four.

    TPU gathers are issue-rate-bound on narrow rows (each fetched row of a
    3-channel image is 12 bytes). This packs the 2x2 bilinear footprint
    into rows of 4C up front (zero-padded, so out-of-range corners read 0
    exactly like padding_mode='zeros'), then fetches each output pixel
    with a single row gather. Identical values to `grid_sample`; ~4x fewer
    gather rows at 4x width. Worth it for small C (the conditioning
    texture warps); for wide-C images the plain version is already wide.

    image (N, C, H, W); grid (N, Ho, Wo, 2) -> (N, C, Ho, Wo).
    """
    n, c, h, w = image.shape
    gx = _unnormalize(grid[..., 0].astype(jnp.float32), w, align_corners)
    gy = _unnormalize(grid[..., 1].astype(jnp.float32), h, align_corners)
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    tx = gx - x0
    ty = gy - y0

    # packed[i, j] = [img[i,j], img[i,j+1], img[i+1,j], img[i+1,j+1]],
    # zero-padded; defined for i in [-1, H], j in [-1, W] (shifted by +1)
    imp = jnp.pad(
        image.transpose(0, 2, 3, 1), ((0, 0), (1, 1), (1, 1), (0, 0))
    )  # (N, H+2, W+2, C)
    packed = jnp.concatenate(
        [
            imp[:, :-1, :-1], imp[:, :-1, 1:],
            imp[:, 1:, :-1], imp[:, 1:, 1:],
        ],
        axis=-1,
    ).reshape(n, (h + 1) * (w + 1), 4 * c)

    # any base with at least one in-range corner lies in [-1, size-1];
    # fully out-of-range bases gather garbage that the zero weights kill
    yb = jnp.clip(y0, -1, h - 1).astype(jnp.int32) + 1
    xb = jnp.clip(x0, -1, w - 1).astype(jnp.int32) + 1
    idx = (yb * (w + 1) + xb).reshape(n, -1, 1)
    rows = jnp.take_along_axis(packed, idx, axis=1)  # (N, P, 4C)

    ho, wo = grid.shape[1], grid.shape[2]
    rows = rows.reshape(n, ho, wo, 4, c)
    wgt = []
    for dy, wyv in ((0, 1.0 - ty), (1, ty)):
        ok_y = (y0 + dy >= 0) & (y0 + dy <= h - 1)
        for dx, wxv in ((0, 1.0 - tx), (1, tx)):
            ok_x = (x0 + dx >= 0) & (x0 + dx <= w - 1)
            wgt.append(jnp.where(ok_y & ok_x, wyv * wxv, 0.0))
    wgt = jnp.stack(wgt, axis=-1)[..., None].astype(image.dtype)  # (N,Ho,Wo,4,1)
    out = jnp.sum(rows * wgt, axis=3)  # (N, Ho, Wo, C)
    return out.transpose(0, 3, 1, 2)


def _resize_axis_linear_ac(x: jax.Array, axis: int, out_size: int) -> jax.Array:
    """1-D linear resize along `axis` with align_corners=True."""
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    if in_size == 1:
        reps = [1] * x.ndim
        reps[axis] = out_size
        return jnp.tile(x, reps)
    pos = jnp.arange(out_size, dtype=jnp.float32) * ((in_size - 1) / (out_size - 1))
    i0 = jnp.floor(pos).astype(jnp.int32)
    i0 = jnp.clip(i0, 0, in_size - 2)
    t = pos - i0.astype(jnp.float32)
    a = jnp.take(x, i0, axis=axis)
    b = jnp.take(x, i0 + 1, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    t = t.reshape(shape).astype(x.dtype)
    return a * (1 - t) + b * t


def resize_bilinear_align_corners(image: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """torch `F.interpolate(mode='bilinear', align_corners=True)` on NCHW."""
    out = _resize_axis_linear_ac(image, image.ndim - 2, out_hw[0])
    return _resize_axis_linear_ac(out, image.ndim - 1, out_hw[1])


def resize_nearest(image: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """torch `F.interpolate(mode='nearest')` on NCHW (floor index mapping)."""
    h, w = image.shape[-2], image.shape[-1]
    rows = jnp.floor(jnp.arange(out_hw[0]) * (h / out_hw[0])).astype(jnp.int32)
    cols = jnp.floor(jnp.arange(out_hw[1]) * (w / out_hw[1])).astype(jnp.int32)
    out = jnp.take(image, jnp.clip(rows, 0, h - 1), axis=image.ndim - 2)
    return jnp.take(out, jnp.clip(cols, 0, w - 1), axis=image.ndim - 1)


def avg_pool(image: jax.Array, ks: int, stride: int | None = None) -> jax.Array:
    """torch `F.avg_pool2d` on NCHW (no padding)."""
    stride = stride or ks
    ndim = image.ndim
    window = [1] * (ndim - 2) + [ks, ks]
    strides = [1] * (ndim - 2) + [stride, stride]
    summed = jax.lax.reduce_window(
        image, jnp.asarray(0.0, image.dtype), jax.lax.add, window, strides, "VALID"
    )
    return summed / (ks * ks)


def grid_sample_nhwc(
    image: jax.Array, grid: jax.Array, align_corners: bool = False
) -> jax.Array:
    """Bilinear sample on NHWC images (TPU-native layout for the conv nets).

    Same semantics as `grid_sample` but image is (N, H, W, C). Channels-last
    keeps the gather contiguous over the channel (lane) dimension.
    """
    n, h, w, c = image.shape
    gx = _unnormalize(grid[..., 0].astype(jnp.float32), w, align_corners)
    gy = _unnormalize(grid[..., 1].astype(jnp.float32), h, align_corners)

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    tx = gx - x0
    ty = gy - y0

    out = None
    img_flat = image.reshape(n, h * w, c)
    for dy, wy in ((0, 1.0 - ty), (1, ty)):
        yi = y0 + dy
        y_ok = (yi >= 0) & (yi <= h - 1)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        for dx, wx in ((0, 1.0 - tx), (1, tx)):
            xi = x0 + dx
            x_ok = (xi >= 0) & (xi <= w - 1)
            xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
            weight = jnp.where(y_ok & x_ok, wy * wx, 0.0)  # (N, Ho, Wo)
            idx = (yc * w + xc).reshape(n, -1, 1)
            vals = jnp.take_along_axis(img_flat, idx, axis=1)  # (N, Ho*Wo, C)
            contrib = vals * weight.reshape(n, -1, 1).astype(image.dtype)
            out = contrib if out is None else out + contrib
    ho, wo = grid.shape[1], grid.shape[2]
    return out.reshape(n, ho, wo, c)
