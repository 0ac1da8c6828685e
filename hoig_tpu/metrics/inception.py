"""FID InceptionV3 in flax (reference metrics/pytorch_fid/inception.py).

The FID-specific InceptionV3 (1008-class TF export: avg-pool branches with
count_include_pad=False in InceptionA/C and max-pool branch in the second
InceptionE) up to the pool3 2048-d features. Weights come from the same
pt_inception-2015-12-05 state dict the reference downloads
(inception.py:13, FID_WEIGHTS_URL) via `load_torch_weights`; without them
the net runs with deterministic random init (useful only for pipeline
tests, clearly not for comparable FID values).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class BasicConv2d(nn.Module):
    features: int
    kernel: tuple
    stride: int = 1
    pad: tuple = (0, 0)

    @nn.compact
    def __call__(self, x):
        ph, pw = self.pad
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=(self.stride, self.stride),
            padding=((ph, ph), (pw, pw)),
            use_bias=False,
            name="conv",
        )(x)
        # torchvision BN eps=0.001; inference-only (running stats ported)
        x = nn.BatchNorm(
            use_running_average=True, epsilon=0.001, momentum=0.1, name="bn"
        )(x)
        return nn.relu(x)


def _avgpool3_cip_false(x):
    """3x3 stride-1 pad-1 average pool with count_include_pad=False."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), ((0, 0), (1, 1), (1, 1), (0, 0))
    )
    ones = jnp.ones_like(x[..., :1])
    cnt = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    return s / cnt


def _maxpool(x, k, s):
    return nn.max_pool(x, (k, k), strides=(s, s))


class InceptionA(nn.Module):
    pool_features: int
    fid: bool = True

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), pad=(2, 2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), pad=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), pad=(1, 1), name="branch3x3dbl_3")(b3)
        bp = _avgpool3_cip_false(x) if self.fid else nn.avg_pool(
            x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1))
        )
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), pad=(1, 1), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        bp = _maxpool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int
    fid: bool = True

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), pad=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), pad=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), pad=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), pad=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), pad=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), pad=(0, 3), name="branch7x7dbl_5")(bd)
        bp = _avgpool3_cip_false(x) if self.fid else nn.avg_pool(
            x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1))
        )
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), pad=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), pad=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        bp = _maxpool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_mode: str = "avg_fid"  # 'avg_fid' (E_1) or 'max' (E_2)

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), pad=(0, 1), name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), pad=(1, 0), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), pad=(1, 1), name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), pad=(0, 1), name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), pad=(1, 0), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_mode == "max":
            bp = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 1, 1, 1),
                ((0, 0), (1, 1), (1, 1), (0, 0)),
            )
        else:
            bp = _avgpool3_cip_false(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class FIDInceptionV3(nn.Module):
    """Pool3 (2048-d) feature extractor, NHWC input in [0,1].

    Matches reference InceptionV3(resize_input=True, normalize_input=True)
    (inception.py:118-147): bilinear resize to 299 (align_corners=False),
    scale to [-1,1], blocks 0..3, global average pool.
    """

    resize_input: bool = True
    normalize_input: bool = True

    @nn.compact
    def __call__(self, x):
        if self.resize_input and (x.shape[1] != 299 or x.shape[2] != 299):
            x = jax.image.resize(
                x, (x.shape[0], 299, 299, x.shape[3]), method="bilinear"
            )
        if self.normalize_input:
            x = 2.0 * x - 1.0
        x = BasicConv2d(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), pad=(1, 1), name="Conv2d_2b_3x3")(x)
        x = _maxpool(x, 3, 2)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _maxpool(x, 3, 2)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg_fid", name="Mixed_7b")(x)
        x = InceptionE("max", name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # (B, 2048) global avg pool


def load_torch_weights(params, state_dict) -> dict:
    """Port a pytorch-fid pt_inception state dict into the flax params.

    Torch names: '<block>.<branch>.conv.weight', '<block>.<branch>.bn.*'.
    The torch model also has fc weights (1008 classes) — ignored, FID only
    needs pool3.
    """
    import copy

    params = copy.deepcopy(jax.tree.map(np.asarray, params))
    flat_p = params["params"]
    flat_b = params["batch_stats"]

    def to_np(t):
        return np.asarray(getattr(t, "numpy", lambda: t)())

    for name, tensor in state_dict.items():
        parts = name.split(".")
        if parts[-2] == "conv" and parts[-1] == "weight":
            node = _walk(flat_p, parts[:-2])
            if node is not None:
                node["conv"]["kernel"] = to_np(tensor).transpose(2, 3, 1, 0)
        elif parts[-2] == "bn":
            leaf = parts[-1]
            if leaf in ("weight", "bias"):
                node = _walk(flat_p, parts[:-2])
                if node is not None:
                    node["bn"]["scale" if leaf == "weight" else "bias"] = to_np(tensor)
            elif leaf in ("running_mean", "running_var"):
                node = _walk(flat_b, parts[:-2])
                if node is not None:
                    key = "mean" if leaf == "running_mean" else "var"
                    node["bn"][key] = to_np(tensor)
    return jax.tree.map(jnp.asarray, params)


def _walk(tree, parts):
    node = tree
    for p in parts:
        if p not in node:
            return None
        node = node[p]
    return node
