"""Loss functions for the HOGAN GAN objective.

Capability parity with the reference loss set
(HOIG_HOv3/models/trainer.py:292-481): LSGAN quadratic adversarial loss
with targets {0, 1, -1}, L1 reconstruction, BCE/MSE mask losses, and the
total-variation mask smoothness term. The VGG perceptual loss lives in
hoig_tpu.models.vgg.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def wmean(x: jax.Array, w: jax.Array | None) -> jax.Array:
    """mean(x), or — with per-sample weights w (B,) — the w-weighted mean
    of the per-sample means. Every sample has the same element count, so
    w=ones reproduces jnp.mean exactly; the eval path uses 0-weights to
    exclude pad-replica samples from metric reductions (a partial final
    val batch is padded to the data-mesh size, model_api.set_input)."""
    if w is None:
        return jnp.mean(x)
    per = jnp.mean(x.reshape(x.shape[0], -1).astype(jnp.float32), axis=1)
    return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1.0)


def lsgan_loss(logits: jax.Array, target: float, w=None) -> jax.Array:
    """mean((x - y)^2) (trainer.py:476-477); targets: G-fake 0 is the
    generator's target for D(fake) (trainer.py:439), D-real 1, D-fake -1
    (trainer.py:467-468)."""
    return wmean((logits - target) ** 2, w)


def l1_loss(x: jax.Array, y: jax.Array, w=None) -> jax.Array:
    return wmean(jnp.abs(x - y), w)


def mse_loss(x: jax.Array, y: jax.Array, w=None) -> jax.Array:
    return wmean((x - y) ** 2, w)


def bce_loss(pred: jax.Array, target: jax.Array, w=None) -> jax.Array:
    """torch.nn.BCELoss semantics: mean binary cross entropy on
    probabilities, with log values clamped at -100."""
    log_p = jnp.maximum(jnp.log(jnp.maximum(pred, 0.0)), -100.0)
    log_1p = jnp.maximum(jnp.log(jnp.maximum(1.0 - pred, 0.0)), -100.0)
    return -wmean(target * log_p + (1.0 - target) * log_1p, w)


def tv_smooth_loss(mat: jax.Array, w=None) -> jax.Array:
    """Mask smoothness (trainer.py:479-481): mean |dx| + mean |dy| on
    (B, C, H, W) or (B, H, W, C) — computed over the two spatial axes."""
    if mat.ndim != 4:
        raise ValueError(f"expected 4D mask, got {mat.shape}")
    # spatial axes: NCHW -> (2, 3); NHWC -> (1, 2). Channel dim is 1 for
    # masks either way; detect layout by which trailing dim is smallest.
    if mat.shape[1] <= mat.shape[-1]:
        ax_h, ax_w = 2, 3  # NCHW
    else:
        ax_h, ax_w = 1, 2  # NHWC
    dx = jnp.abs(
        jnp.take(mat, jnp.arange(mat.shape[ax_w] - 1), axis=ax_w)
        - jnp.take(mat, jnp.arange(1, mat.shape[ax_w]), axis=ax_w)
    )
    dy = jnp.abs(
        jnp.take(mat, jnp.arange(mat.shape[ax_h] - 1), axis=ax_h)
        - jnp.take(mat, jnp.arange(1, mat.shape[ax_h]), axis=ax_h)
    )
    return wmean(dx, w) + wmean(dy, w)
