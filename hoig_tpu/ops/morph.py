"""Binary-mask morphology as thresholded box filters.

Capability parity with the reference's `util.morph`
(HOIG_HOv3/utils/util.py:142-158): erode pads with 1s and requires a full
ks*ks window of 1s; dilate pads with 0s and fires on any 1 in the window.

TPU note: a ks*ks box sum over a {0,1} mask is a separable reduce-window,
which XLA lowers to two 1-D passes on the VPU — no conv needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def morph(mask: jax.Array, ks: int, mode: str = "erode") -> jax.Array:
    """Erode or dilate a {0,1} float mask with a ks x ks box.

    Args:
      mask: (..., H, W) float array with values in {0, 1}. The two trailing
        axes are spatial; any leading axes (batch, channel) are mapped over.
      ks: odd box size.
      mode: 'erode' or 'dilate'.

    Returns:
      float array of the same shape, values in {0.0, 1.0}.
    """
    if ks % 2 != 1:
        raise ValueError(f"morph kernel size must be odd, got {ks}")
    pad = ks // 2
    n_ks = ks * ks

    if mode == "erode":
        pad_value = 1.0
    elif mode == "dilate":
        pad_value = 0.0
    else:
        raise ValueError(f"unknown morph mode: {mode}")

    ndim = mask.ndim
    pad_cfg = [(0, 0, 0)] * (ndim - 2) + [(pad, pad, 0), (pad, pad, 0)]
    padded = jax.lax.pad(mask, jnp.asarray(pad_value, mask.dtype), pad_cfg)

    window = [1] * (ndim - 2) + [ks, ks]
    strides = [1] * ndim
    summed = jax.lax.reduce_window(
        padded, jnp.asarray(0.0, mask.dtype), jax.lax.add, window, strides, "VALID"
    )

    if mode == "erode":
        # full window of ones required (reference: out == ks*ks)
        return (summed >= n_ks - 0.5).astype(mask.dtype)
    return (summed >= 0.5).astype(mask.dtype)
