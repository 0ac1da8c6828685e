"""VGG19 feature pyramid + perceptual loss (NHWC).

Capability parity with HOIG_HOv3/models/networks/vgg19.py: 5 feature
slices cut after the first ReLU of each conv stage (or before, with
before_relu), L1 feature distance with weights [1/32, 1/16, 1/8, 1/4, 1].

The reference pulls pretrained weights through torchvision (vgg19.py:58);
torchvision is a downloaded asset there and is not bundled here either.
`load_torch_weights` ingests a torchvision-format `vgg19` state dict
(.pth via torch, or an .npz export); without it the loss still functions
as a random-feature perceptual loss (documented, deterministic init).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# conv widths per stage of VGG19 'features'
_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
        512, 512, 512, 512, "M", 512)
# torchvision layer index of each conv in _CFG (for weight porting)
_TORCH_IDX = (0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28)


class Vgg19Features(nn.Module):
    """Runs VGG19 convs and returns the 5-slice pyramid.

    Slice boundaries at torchvision feature indices [2, 7, 12, 21, 30]
    (after-ReLU, vgg19.py:63-66) or [1, 6, 11, 20, 29] (before_relu).
    """

    before_relu: bool = False

    @nn.compact
    def __call__(self, x: jax.Array):
        from hoig_tpu.models.layers import compute_dtype

        outs = []
        conv_i = 0
        # slice_ids [2, 7, 12, 21, 30] cut after the ReLU of torchvision
        # feature indices 1, 6, 11, 20, 29 -> conv ordinals 1, 3, 5, 9, 13.
        slice_after = {1: 0, 3: 1, 5: 2, 9: 3, 13: 4}
        for item in _CFG:
            if item == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            pre = nn.Conv(
                item, (3, 3), padding=((1, 1), (1, 1)), name=f"conv_{conv_i}",
                dtype=compute_dtype(),
            )(x)
            x = nn.relu(pre)
            conv_i += 1
            if conv_i in slice_after:
                outs.append(pre if self.before_relu else x)
            if len(outs) == 5:
                break
        return outs


def init_vgg_params(rng: jax.Array, before_relu: bool = False):
    model = Vgg19Features(before_relu=before_relu)
    params = model.init(rng, jnp.zeros((1, 64, 64, 3)))
    return model, params


def load_torch_weights(params, state_dict) -> dict:
    """Populate flax params from a torchvision vgg19 state dict.

    Accepts either {'features.N.weight': tensor, ...} mappings (torch
    tensors or numpy arrays). OIHW -> HWIO transpose applied.
    """
    import copy

    out = copy.deepcopy(jax.tree.map(np.asarray, params))
    for ci, ti in enumerate(_TORCH_IDX):
        w = state_dict[f"features.{ti}.weight"]
        b = state_dict[f"features.{ti}.bias"]
        w = np.asarray(getattr(w, "numpy", lambda: w)())
        b = np.asarray(getattr(b, "numpy", lambda: b)())
        name = f"conv_{ci}"
        if name not in out["params"]:
            continue  # slices beyond conv 9 are never instantiated
        out["params"][name]["kernel"] = w.transpose(2, 3, 1, 0).astype(np.float32)
        out["params"][name]["bias"] = b.astype(np.float32)
    return jax.tree.map(jnp.asarray, out)


VGG_LOSS_WEIGHTS = (1.0 / 32, 1.0 / 16, 1.0 / 8, 1.0 / 4, 1.0)


def vgg_perceptual_loss(model, params, x: jax.Array, y: jax.Array,
                        valid=None) -> jax.Array:
    """VGGLoss (vgg19.py:94-109): weighted L1 over the 5 slices.

    x, y: (B, H, W, 3) NHWC images in the generator's [-1, 1] range (the
    reference feeds tanh outputs straight in, no ImageNet normalization).
    y is treated as a constant target (detach semantics). valid: optional
    per-sample weights (B,) — see losses.wmean.
    """
    from hoig_tpu.train.losses import wmean

    fx = model.apply(params, x)
    fy = model.apply(params, jax.lax.stop_gradient(y))
    loss = 0.0
    for w, a, b in zip(VGG_LOSS_WEIGHTS, fx, fy):
        # features may be bf16 under the compute dtype; accumulate in f32
        d = jnp.abs(a - jax.lax.stop_gradient(b))
        loss = loss + w * (
            wmean(d, valid) if valid is not None
            else jnp.mean(d, dtype=jnp.float32)
        )
    return loss
