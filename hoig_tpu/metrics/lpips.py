"""LPIPS (reference metrics/lpips.py parity): AlexNet ReLU features,
unit-normalized, squared differences through learned 1x1 weights
(lpips_weights.ckpt), averaged.

Weights are downloaded assets in the reference too (alexnet torchvision +
metrics/lpips_weights.ckpt); `load_weights` ports both. Quirk replicated:
the path API feeds 299x299 ImageNet-normalized images (get_eval_loader
defaults) even though LPIPS then applies its own [-1,1]-range mu/sigma.
"""

from __future__ import annotations

import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# (out_ch, kernel, stride, pad) of torchvision alexnet.features convs
_ALEX_CFG = (
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
)
# torchvision features indices of the convs (for weight porting)
_ALEX_TORCH_IDX = (0, 3, 6, 8, 10)
# maxpool after relu of conv ordinal (1-based)
_POOL_AFTER = {1, 2, 5}

LPIPS_MU = np.array([-0.03, -0.088, -0.188], np.float32)
LPIPS_SIGMA = np.array([0.458, 0.448, 0.450], np.float32)


class AlexNetFeatures(nn.Module):
    """The 5 post-ReLU feature maps of torchvision alexnet.features."""

    @nn.compact
    def __call__(self, x):
        fmaps = []
        for i, (c, k, s, p) in enumerate(_ALEX_CFG):
            x = nn.Conv(
                c, (k, k), strides=(s, s), padding=((p, p), (p, p)),
                name=f"conv_{i}",
            )(x)
            x = nn.relu(x)
            fmaps.append(x)
            if (i + 1) in _POOL_AFTER:
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
        return fmaps


class LPIPSNet(nn.Module):
    """AlexNet features + learned 1x1 weights -> scalar distance."""

    @nn.compact
    def __call__(self, x, y):
        mu = jnp.asarray(LPIPS_MU).reshape(1, 1, 1, 3)
        sigma = jnp.asarray(LPIPS_SIGMA).reshape(1, 1, 1, 3)
        x = (x - mu) / sigma
        y = (y - mu) / sigma
        alex = AlexNetFeatures(name="alexnet")
        fx = alex(x)
        fy = alex(y)

        def unit(v):
            return v * jax.lax.rsqrt(jnp.sum(v**2, axis=-1, keepdims=True) + 1e-10)

        val = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            d = (unit(a) - unit(b)) ** 2
            w = nn.Conv(1, (1, 1), use_bias=False, name=f"lin_{i}")(d)
            val = val + jnp.mean(w)
        return val


def make_lpips(alexnet_weights: str | None = None,
               lpips_weights: str | None = None):
    model = LPIPSNet()
    z = jnp.zeros((1, 64, 64, 3))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), z, z)
    if alexnet_weights or lpips_weights:
        params = load_weights(params, alexnet_weights, lpips_weights)
    else:
        print("[warn] LPIPS running with random init — values are NOT "
              "comparable (supply alexnet + lpips weights)")
    apply = jax.jit(model.apply)
    return lambda x, y: apply(params, x, y)


def load_weights(params, alexnet_path: str | None, lpips_path: str | None):
    import copy

    params = copy.deepcopy(jax.tree.map(np.asarray, params))
    tree = params["params"]

    def to_np(t):
        return np.asarray(getattr(t, "numpy", lambda: t)())

    if alexnet_path:
        state = _load(alexnet_path)
        for i, ti in enumerate(_ALEX_TORCH_IDX):
            w = to_np(state[f"features.{ti}.weight"])
            b = to_np(state[f"features.{ti}.bias"])
            tree["alexnet"][f"conv_{i}"]["kernel"] = w.transpose(2, 3, 1, 0)
            tree["alexnet"][f"conv_{i}"]["bias"] = b
    if lpips_path:
        state = _load(lpips_path)
        # reference names: lpips_weights.<i>.main.1.weight (lpips.py:45-47)
        for i in range(5):
            w = to_np(state[f"lpips_weights.{i}.main.1.weight"])
            tree[f"lin_{i}"]["kernel"] = w.transpose(2, 3, 1, 0)
    return jax.tree.map(jnp.asarray, params)


def _load(path):
    if path.endswith(".npz"):
        return dict(np.load(path))
    import torch

    return torch.load(path, map_location="cpu")


def calculate_lpips_given_images(gen_images, gt_images, lpips_fn=None):
    """(N,3,H,W) [-1,1] NCHW pairs -> per-frame LPIPS values."""
    lpips_fn = lpips_fn or make_lpips()
    vals = []
    for i in range(gen_images.shape[0]):
        a = jnp.asarray(gen_images[i : i + 1]).transpose(0, 2, 3, 1)
        b = jnp.asarray(gt_images[i : i + 1]).transpose(0, 2, 3, 1)
        vals.append(float(lpips_fn(a, b)))
    return np.asarray(vals)


def calculate_lpips_given_paths(paths, img_size: int = 256, batch_size: int = 50,
                                alexnet_weights=None, lpips_weights=None) -> float:
    from hoig_tpu.metrics.image_loader import iter_eval_images

    print(f"Calculating LPIPS given paths {paths[0]} and {paths[1]}...")
    lpips_fn = make_lpips(alexnet_weights, lpips_weights)
    vals = []
    for img0, img1 in zip(
        iter_eval_images(paths[0], img_size, batch_size, imagenet_normalize=True),
        iter_eval_images(paths[1], img_size, batch_size, imagenet_normalize=True),
    ):
        a = jnp.asarray(img0).transpose(0, 2, 3, 1)
        b = jnp.asarray(img1).transpose(0, 2, 3, 1)
        vals.append(float(lpips_fn(a, b)))
    return float(np.mean(vals))


if __name__ == "__main__":
    root_path = "results"
    print(
        calculate_lpips_given_paths(
            [os.path.join(root_path, "imitators"), os.path.join(root_path, "gt")]
        )
    )
