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


def lsgan_loss(logits: jax.Array, target: float) -> jax.Array:
    """mean((x - y)^2) (trainer.py:476-477); targets: G-fake 0 is the
    generator's target for D(fake) (trainer.py:439), D-real 1, D-fake -1
    (trainer.py:467-468)."""
    return jnp.mean((logits - target) ** 2)


def l1_loss(x: jax.Array, y: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(x - y))


def mse_loss(x: jax.Array, y: jax.Array) -> jax.Array:
    return jnp.mean((x - y) ** 2)


def bce_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """torch.nn.BCELoss semantics: mean binary cross entropy on
    probabilities, with log values clamped at -100."""
    log_p = jnp.maximum(jnp.log(jnp.maximum(pred, 0.0)), -100.0)
    log_1p = jnp.maximum(jnp.log(jnp.maximum(1.0 - pred, 0.0)), -100.0)
    return -jnp.mean(target * log_p + (1.0 - target) * log_1p)


def tv_smooth_loss(mat: jax.Array) -> jax.Array:
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
    return jnp.mean(dx) + jnp.mean(dy)
