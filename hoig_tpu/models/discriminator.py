"""PatchGAN discriminators in flax (NHWC).

Capability parity with HOIG_HOv3/models/networks/discriminator.py:
  * PatchDiscriminator — pix2pix 70x70-style PatchGAN: n_layers stride-2
    k=4 convs, then a stride-1 k=4 conv pair; LeakyReLU(0.2); no sigmoid
    (LSGAN). The stride-1 k=4 p=1 tail shrinks each spatial dim by 1,
    reproduced with explicit (1,1) padding.
  * MultiScaleDiscriminator — n_scales independent PatchDiscriminators over
    a provided input pyramid (unused by the reference trainer but part of
    the network zoo).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from hoig_tpu.models.layers import InstanceNorm, conv


class PatchDiscriminator(nn.Module):
    input_nc: int = 0  # kept for reference-signature parity; flax is lazy
    ndf: int = 64
    n_layers: int = 3
    norm_type: str = "instance"
    use_sigmoid: bool = False

    def _norm(self, x, train: bool):
        if self.norm_type == "instance":
            # torch InstanceNorm2d(affine=False) via functools.partial
            return InstanceNorm(affine=False)(x)
        if self.norm_type in ("batch", "batchnorm2d"):
            return nn.BatchNorm(use_running_average=not train)(x)
        raise NotImplementedError(f"norm [{self.norm_type}] not found")

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        x = conv(self.ndf, 4, 2, 1)(x)
        x = nn.leaky_relu(x, negative_slope=0.2)
        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_mult = min(2**n, 8)
            x = conv(self.ndf * nf_mult, 4, 2, 1, use_bias=self.norm_type != "batch")(x)
            x = self._norm(x, train)
            x = nn.leaky_relu(x, negative_slope=0.2)
        nf_mult = min(2**self.n_layers, 8)
        x = conv(self.ndf * nf_mult, 4, 1, 1, use_bias=self.norm_type != "batch")(x)
        x = self._norm(x, train)
        x = nn.leaky_relu(x, negative_slope=0.2)
        x = conv(1, 4, 1, 1)(x)
        if self.use_sigmoid:
            x = nn.sigmoid(x)
        return x


class MultiScaleDiscriminator(nn.Module):
    n_scales: int = 5
    ndf: int = 64
    n_layers: int = 3
    use_sigmoid: bool = False

    @nn.compact
    def __call__(self, pyramid: Sequence[jax.Array], train: bool = True):
        outs = []
        for i in range(self.n_scales):
            d = PatchDiscriminator(
                ndf=self.ndf, n_layers=self.n_layers, use_sigmoid=self.use_sigmoid,
                name=f"scale_{i}",
            )
            outs.append(d(pyramid[i], train=train))
        return outs
