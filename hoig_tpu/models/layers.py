"""Shared flax building blocks for the HOGAN network family.

All modules are NHWC (the TPU-native conv layout; the reference is NCHW
torch). Convolution geometry matches the reference exactly — explicit
(1,1)/(3,3) paddings reproduce torch's `padding=N` including the
PatchGAN's shrinking stride-1 k=4 tail (discriminator.py:44-50).

Weight init is normal(0, 0.02) like the reference NetworkBase.init_weights
(models/networks/base_network.py:14-24).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

conv_init = nn.initializers.normal(stddev=0.02)

# Process-wide computation dtype for the conv stacks (params stay float32).
# bfloat16 halves HBM traffic for the bandwidth-bound 256px conv layers;
# normalization statistics are always taken in float32. Set BEFORE building
# (tracing) the networks via set_compute_dtype — reads happen at trace time.
_COMPUTE_DTYPE = [None]


def set_compute_dtype(dtype) -> None:
    _COMPUTE_DTYPE[0] = dtype


def compute_dtype():
    return _COMPUTE_DTYPE[0]


class InstanceNorm(nn.Module):
    """torch InstanceNorm2d on NHWC: per-sample, per-channel over H,W.

    torch defaults: eps=1e-5; affine toggles learnable scale/bias
    (generator blocks use affine=True, SPADE's param-free norm and the
    'instance' discriminator norm use affine=False).
    """

    affine: bool = True
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_dtype = x.dtype
        out_dtype = compute_dtype() or in_dtype
        x32 = x.astype(jnp.float32)  # stats always in f32
        mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
        var = jnp.var(x32, axis=(1, 2), keepdims=True)
        # fold the whole normalization into per-(sample,channel) scale and
        # offset computed in f32, applied as ONE fused x*a+b in the compute
        # dtype: under bf16 the big tensor is read/written once at half the
        # bytes (the f32 path materialized an f32 intermediate); the casts
        # fuse into the reduces, which XLA keeps in f32 regardless
        a = jax.lax.rsqrt(var + self.eps)
        b = -mean * a
        if self.affine:
            c = x.shape[-1]
            scale = self.param("scale", nn.initializers.ones, (c,))
            bias = self.param("bias", nn.initializers.zeros, (c,))
            a = a * scale
            b = b * scale + bias
        # name the folded stats so selective remat can STORE them: they are
        # (B,1,1,C) — negligible HBM — while recomputing each stats reduce
        # in the remat backward cost ~0.2-0.4 ms per IN instance on the
        # profile (~240 multiply_reduce fusions / 26 ms per step)
        from jax.ad_checkpoint import checkpoint_name

        a, b = checkpoint_name((a, b), "in_stats")
        return x.astype(out_dtype) * a.astype(out_dtype) + b.astype(out_dtype)


def conv(
    features: int,
    kernel: int,
    stride: int = 1,
    pad: int = 0,
    use_bias: bool = True,
    name: str | None = None,
) -> nn.Conv:
    """torch-geometry Conv2d: explicit symmetric padding."""
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        use_bias=use_bias,
        kernel_init=conv_init,
        dtype=compute_dtype(),
        name=name,
    )


def conv_transpose(
    features: int, kernel: int, use_bias: bool = False, name: str | None = None
) -> nn.ConvTranspose:
    """2x upsampling transposed conv, EXACT torch geometry.

    torch ConvTranspose2d(k, s=2, p=1, outp=k%2) pads the stride-dilated
    input with (k-1-p, k-1-p+outp) per side; flax's explicit padding pairs
    are exactly those dilated-input pads (verified numerically against
    torch). padding="SAME" would be the mirror image — one pixel off from
    the reference (generator.py:81,119,201), which matters for converted
    reference checkpoints.
    """
    lo = kernel - 2
    hi = kernel - 2 + (kernel % 2)
    return nn.ConvTranspose(
        features,
        (kernel, kernel),
        strides=(2, 2),
        padding=((lo, hi), (lo, hi)),
        use_bias=use_bias,
        kernel_init=conv_init,
        dtype=compute_dtype(),
        name=name,
    )


class ConvINReLU(nn.Module):
    """Conv -> InstanceNorm(affine) -> ReLU (the reference's basic stack)."""

    features: int
    kernel: int
    stride: int = 1
    pad: int = 0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = conv(self.features, self.kernel, self.stride, self.pad, use_bias=False)(x)
        x = InstanceNorm()(x)
        return nn.relu(x)


class UpConvINReLU(nn.Module):
    """ConvTranspose 2x -> InstanceNorm -> ReLU."""

    features: int
    kernel: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = conv_transpose(self.features, self.kernel)(x)
        x = InstanceNorm()(x)
        return nn.relu(x)


class SPADE(nn.Module):
    """Spatially-adaptive norm (models/networks/spade.py:10-38).

    InstanceNorm(affine=False) modulated by gamma/beta predicted from the
    nearest-resized condition map through a shared 128ch conv MLP.
    """

    @nn.compact
    def __call__(self, x: jax.Array, seg: jax.Array) -> jax.Array:
        normalized = InstanceNorm(affine=False)(x)
        h, w = x.shape[1], x.shape[2]
        if seg.shape[1] != h or seg.shape[2] != w:
            # nearest resize (F.interpolate mode='nearest' floor mapping)
            rows = (jnp.arange(h) * (seg.shape[1] / h)).astype(jnp.int32)
            cols = (jnp.arange(w) * (seg.shape[2] / w)).astype(jnp.int32)
            seg = jnp.take(jnp.take(seg, rows, axis=1), cols, axis=2)
        actv = nn.relu(conv(128, 3, 1, 1, name="mlp_shared")(seg))
        gamma = conv(x.shape[-1], 3, 1, 1, name="mlp_gamma")(actv)
        beta = conv(x.shape[-1], 3, 1, 1, name="mlp_beta")(actv)
        return normalized * (1.0 + gamma) + beta


class ResidualBlock(nn.Module):
    """Reference ResidualBlock (generator.py:9-32): conv-IN-ReLU-conv-IN
    with (optionally learned) shortcut."""

    features: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dim_in = x.shape[-1]
        if dim_in != self.features:
            s = InstanceNorm(name="norm_s")(x)
            s = conv(self.features, 1, use_bias=False, name="conv_s")(s)
        else:
            s = x
        y = conv(self.features, 3, 1, 1, use_bias=False)(x)
        y = InstanceNorm()(y)
        y = nn.relu(y)
        y = conv(self.features, 3, 1, 1, use_bias=False)(y)
        y = InstanceNorm()(y)
        return s + y


class SPADEResidualBlock(nn.Module):
    """Reference SPADEResidualBlock (generator.py:35-72)."""

    features: int

    @nn.compact
    def __call__(self, x: jax.Array, seg: jax.Array) -> jax.Array:
        dim_in = x.shape[-1]
        if dim_in != self.features:
            s = SPADE(name="norm_s")(x, seg)
            s = conv(self.features, 1, use_bias=False, name="conv_s")(s)
        else:
            s = x
        y = conv(self.features, 3, 1, 1, name="conv_0")(
            nn.relu(SPADE(name="norm_0")(x, seg))
        )
        y = conv(self.features, 3, 1, 1, name="conv_1")(
            nn.relu(SPADE(name="norm_1")(y, seg))
        )
        return s + y


class SPADEBlock(nn.Module):
    """Reference SPADEBlock (generator.py:75-91): strided (or transposed)
    conv -> SPADE -> ReLU."""

    features: int
    kernel: int
    downsample: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, seg: jax.Array) -> jax.Array:
        if self.downsample:
            x = conv(self.features, self.kernel, 2, 1, use_bias=False)(x)
        else:
            x = conv_transpose(self.features, self.kernel)(x)
        x = SPADE(name="norm")(x, seg)
        return nn.relu(x)
