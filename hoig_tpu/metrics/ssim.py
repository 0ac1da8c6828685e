"""SSIM / MS-SSIM in JAX (reference metrics/ssim.py + pytorch_msssim).

Implements the standard Wang et al. SSIM with an 11-tap Gaussian window
(sigma 1.5, K1=0.01, K2=0.03) and the 5-scale MS-SSIM with weights
[0.0448, 0.2856, 0.3001, 0.2363, 0.1333] — the exact pytorch_msssim
semantics the reference evaluates with (metrics/ssim.py:50-52), including
valid-mode windowing and 2x2 average-pool downsampling with reflect-free
padding-ignored edges.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

MS_SSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    coords = np.arange(size, dtype=np.float64) - size // 2
    g = np.exp(-(coords**2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _blur(x: jax.Array, win: jax.Array) -> jax.Array:
    """Separable valid-mode Gaussian filter on (B, C, H, W)."""
    b, c, h, w = x.shape
    k = win.shape[0]
    kern_h = win.reshape(1, 1, k, 1)
    kern_w = win.reshape(1, 1, 1, k)
    dn = ("NCHW", "OIHW", "NCHW")
    x = x.reshape(b * c, 1, h, w)
    x = jax.lax.conv_general_dilated(x, kern_h, (1, 1), "VALID", dimension_numbers=dn)
    x = jax.lax.conv_general_dilated(x, kern_w, (1, 1), "VALID", dimension_numbers=dn)
    return x.reshape(b, c, h - k + 1, w - k + 1)


def _ssim_per_channel(x, y, win, data_range, k1=0.01, k2=0.03):
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mu_x = _blur(x, win)
    mu_y = _blur(y, win)
    sigma_x = _blur(x * x, win) - mu_x**2
    sigma_y = _blur(y * y, win) - mu_y**2
    sigma_xy = _blur(x * y, win) - mu_x * mu_y
    cs_map = (2 * sigma_xy + c2) / (sigma_x + sigma_y + c2)
    ssim_map = ((2 * mu_x * mu_y + c1) / (mu_x**2 + mu_y**2 + c1)) * cs_map
    # per-sample means over C, H, W
    return jnp.mean(ssim_map, axis=(1, 2, 3)), jnp.mean(cs_map, axis=(1, 2, 3))


def ssim(x: jax.Array, y: jax.Array, data_range: float = 255.0,
         size_average: bool = True, win_size: int = 11, win_sigma: float = 1.5):
    """SSIM on (B, C, H, W); matches pytorch_msssim.ssim defaults."""
    win = jnp.asarray(_gaussian_window(win_size, win_sigma))
    val, _ = _ssim_per_channel(
        x.astype(jnp.float32), y.astype(jnp.float32), win, data_range
    )
    return jnp.mean(val) if size_average else val


def _avg_pool2(x):
    b, c, h, w = x.shape
    pad_h, pad_w = h % 2, w % 2
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad_h), (0, pad_w)))
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
    )
    return summed / 4.0


def ms_ssim(x: jax.Array, y: jax.Array, data_range: float = 255.0,
            size_average: bool = True, win_size: int = 11, win_sigma: float = 1.5,
            weights=MS_SSIM_WEIGHTS):
    """Multi-scale SSIM; relu-clamped cs like pytorch_msssim."""
    win = jnp.asarray(_gaussian_window(win_size, win_sigma))
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    levels = len(weights)
    mcs = []
    val = None
    for i in range(levels):
        val, cs = _ssim_per_channel(x, y, win, data_range)
        if i < levels - 1:
            mcs.append(jax.nn.relu(cs))
            x = _avg_pool2(x)
            y = _avg_pool2(y)
    val = jax.nn.relu(val)
    out = val ** weights[-1]
    for i, cs in enumerate(mcs):
        out = out * cs ** weights[i]
    return jnp.mean(out) if size_average else out


def crop_image(img0, img1, pts):
    """Keypoint-bbox crop (reference metrics/ssim.py:11-34 capability)."""
    u, v = pts[:, 0], pts[:, 1]
    b = round(1.5 * max(u.max() - u.min(), v.max() - v.min()))
    us = int(max((u.min() + u.max() - b) / 2, 0))
    ue = int(min((u.min() + u.max() + b) / 2, 255))
    vs = int(max((v.min() + v.max() - b) / 2, 0))
    ve = int(min((v.min() + v.max() + b) / 2, 255))
    return img0[:, :, vs:ve + 1, us:ue + 1], img1[:, :, vs:ve + 1, us:ue + 1]


def calculate_ssim_given_paths(paths, img_size: int = 256, batch_size: int = 1):
    """Path-pair SSIM + MS-SSIM (reference metrics/ssim.py:37-59).

    Quirk replicated on purpose: the reference's get_eval_loader defaults
    to imagenet_normalize=True (299x299, ImageNet mean/std) while ssim is
    called with data_range=255 (ssim.py:40,50-52) — metric-level parity
    requires the same input distribution.
    """
    from hoig_tpu.metrics.image_loader import iter_eval_images

    print(f"Calculating SSIM given paths {paths[0]} and {paths[1]}...")
    ssim_vals, msssim_vals = [], []
    for img0, img1 in zip(
        iter_eval_images(paths[0], img_size, batch_size, imagenet_normalize=True),
        iter_eval_images(paths[1], img_size, batch_size, imagenet_normalize=True),
    ):
        a, bt = jnp.asarray(img0), jnp.asarray(img1)
        ssim_vals.append(np.asarray(ssim(a, bt, data_range=255, size_average=False)))
        msssim_vals.append(
            np.asarray(ms_ssim(a, bt, data_range=255, size_average=False))
        )
    return (
        float(np.concatenate(ssim_vals).mean()),
        float(np.concatenate(msssim_vals).mean()),
    )


if __name__ == "__main__":
    # reference ssim.py:61-66 runnable entry, with explicit dirs:
    #   python -m hoig_tpu.metrics.ssim <dir_a> <dir_b> [img_size]
    import sys

    path1 = sys.argv[1] if len(sys.argv) > 1 else "imitators/"
    path2 = sys.argv[2] if len(sys.argv) > 2 else "gt/"
    size = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    s, ms = calculate_ssim_given_paths([path1, path2], img_size=size)
    print(f"SSIM: {s}  MS-SSIM: {ms}")
