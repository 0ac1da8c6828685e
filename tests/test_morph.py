"""Morphology parity with the reference's thresholded box-conv morph
(HOIG_HOv3/utils/util.py:142-158): erode pads 1s / requires full window,
dilate pads 0s / fires on any hit."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from hoig_tpu.ops import morph


def torch_morph(src, ks, mode):
    # independent re-derivation of the reference semantics for testing
    n_ks = ks**2
    pad_s = ks // 2
    src_pad = F.pad(src, (pad_s, pad_s, pad_s, pad_s), value=1 if mode == "erode" else 0)
    kernel = torch.ones(1, 1, ks, ks, dtype=src.dtype)
    out = F.conv2d(src_pad, kernel)
    if mode == "erode":
        return (out == n_ks).to(src.dtype)
    return (out >= 1).to(src.dtype)


@pytest.mark.parametrize("mode", ["erode", "dilate"])
@pytest.mark.parametrize("ks", [3, 5, 15])
def test_morph_matches_reference_semantics(rng, mode, ks):
    mask = (rng.rand(2, 1, 32, 32) > 0.5).astype(np.float32)
    ours = np.asarray(morph(jnp.asarray(mask), ks, mode))
    theirs = torch_morph(torch.from_numpy(mask), ks, mode).numpy()
    np.testing.assert_array_equal(ours, theirs)


def test_morph_shapes_any_leading_dims(rng):
    mask = (rng.rand(4, 16, 16) > 0.5).astype(np.float32)
    assert morph(jnp.asarray(mask), 3).shape == (4, 16, 16)
    mask2 = (rng.rand(2, 3, 16, 16) > 0.5).astype(np.float32)
    assert morph(jnp.asarray(mask2), 3, "dilate").shape == (2, 3, 16, 16)


def test_morph_rejects_even_kernel():
    with pytest.raises(ValueError):
        morph(jnp.ones((1, 4, 4)), 4)
