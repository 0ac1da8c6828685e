"""Parity tests for warping primitives vs torch CPU reference semantics.

Mirrors how the reference exercises F.grid_sample / F.interpolate
(HOIG_HOv3/models/networks/generator.py:466-491, models/trainer.py:85-87).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from hoig_tpu.ops import (
    avg_pool,
    grid_sample,
    resize_bilinear_align_corners,
    resize_nearest,
)


@pytest.mark.parametrize("align_corners", [False, True])
def test_grid_sample_matches_torch(rng, align_corners):
    img = rng.randn(2, 3, 9, 7).astype(np.float32)
    grid = (rng.rand(2, 5, 6, 2).astype(np.float32) * 2.4) - 1.2  # incl. OOB

    ours = np.asarray(
        grid_sample(jnp.asarray(img), jnp.asarray(grid), align_corners=align_corners)
    )
    theirs = F.grid_sample(
        torch.from_numpy(img),
        torch.from_numpy(grid),
        mode="bilinear",
        padding_mode="zeros",
        align_corners=align_corners,
    ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_grid_sample_identity(rng):
    img = rng.randn(1, 2, 8, 8).astype(np.float32)
    ys, xs = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    grid = np.stack([(xs + 0.5) / 4 - 1, (ys + 0.5) / 4 - 1], axis=-1)[None].astype(
        np.float32
    )
    out = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid)))
    np.testing.assert_allclose(out, img, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("out_hw", [(16, 16), (5, 9), (64, 32)])
def test_resize_bilinear_align_corners_matches_torch(rng, out_hw):
    img = rng.randn(2, 4, 8, 12).astype(np.float32)
    ours = np.asarray(resize_bilinear_align_corners(jnp.asarray(img), out_hw))
    theirs = F.interpolate(
        torch.from_numpy(img), size=out_hw, mode="bilinear", align_corners=True
    ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("out_hw", [(4, 4), (16, 24)])
def test_resize_nearest_matches_torch(rng, out_hw):
    img = rng.randn(1, 3, 8, 12).astype(np.float32)
    ours = np.asarray(resize_nearest(jnp.asarray(img), out_hw))
    theirs = F.interpolate(torch.from_numpy(img), size=out_hw, mode="nearest").numpy()
    np.testing.assert_allclose(ours, theirs)


def test_avg_pool_matches_torch(rng):
    img = rng.randn(2, 3, 8, 8).astype(np.float32)
    ours = np.asarray(avg_pool(jnp.asarray(img), 2))
    theirs = F.avg_pool2d(torch.from_numpy(img), 2).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("align_corners", [False, True])
def test_grid_sample_packed_matches_plain(rng, align_corners):
    """The packed single-gather variant is value-identical to grid_sample
    (incl. zero padding of out-of-range corners)."""
    from hoig_tpu.ops.grid_sample import grid_sample_packed

    img = jnp.asarray(rng.randn(2, 3, 9, 13).astype(np.float32))
    grid = jnp.asarray((rng.rand(2, 7, 5, 2) * 3.0 - 1.5).astype(np.float32))
    a = grid_sample(img, grid, align_corners=align_corners)
    b = grid_sample_packed(img, grid, align_corners=align_corners)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
