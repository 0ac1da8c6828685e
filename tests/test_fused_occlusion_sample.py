"""Bit-exactness of the fused occlusion+bilinear gather
(renderer._occlusion_and_sample) against its two-source formulation
(_occlusion_from_fim + grid_sample_packed)."""

import jax.numpy as jnp
import numpy as np

from hoig_tpu.geometry.renderer import (
    _occlusion_and_sample,
    _occlusion_from_fim,
)
from hoig_tpu.ops.grid_sample import grid_sample_packed


def _case(rng, b=2, h=24, w=40, s=32, frac_noface=0.2, f=50):
    t = rng.uniform(-1.0, 1.0, (b, h, w, 2)).astype(np.float32)
    # exact +-1 edges and near-edge values stress the floor/offset math
    t[:, :2] = np.array([1.0, -1.0], np.float32).reshape(1, 2, 1, 1).transpose(0, 1, 3, 2)[..., :2]
    t[:, 2, :, 0] = 1.0 - 1e-6
    t[:, 3, :, 1] = -1.0 + 1e-6
    exist = rng.uniform(size=(b, h, w)) > frac_noface
    t = np.where(exist[..., None], t, -2.0).astype(np.float32)
    dst_fim = np.where(
        exist, rng.randint(0, f, (b, h, w)), -1
    ).astype(np.int32)
    src_fim = np.where(
        rng.uniform(size=(b, s, s)) > 0.3, rng.randint(0, f, (b, s, s)), -1
    ).astype(np.int32)
    im = rng.randn(b, 3, s, s).astype(np.float32)
    return (jnp.asarray(t), jnp.asarray(exist), jnp.asarray(dst_fim),
            jnp.asarray(src_fim), jnp.asarray(im))


def test_fused_matches_separate_ops():
    rng = np.random.RandomState(0)
    for _ in range(3):
        t, exist, dst_fim, src_fim, im = _case(rng)
        o_ref = _occlusion_from_fim(t, exist, dst_fim, src_fim)
        tex_ref = grid_sample_packed(im, t, align_corners=False)
        o, tex = _occlusion_and_sample(t, exist, dst_fim, src_fim, im)
        np.testing.assert_array_equal(np.asarray(o), np.asarray(o_ref))
        np.testing.assert_array_equal(np.asarray(tex), np.asarray(tex_ref))


def test_fused_out_of_range_flow():
    # barycentric warps can land slightly outside [-1, 1] when faces
    # project off-image; the fused op must agree there too (zero-weight
    # corners, clamped occlusion center)
    rng = np.random.RandomState(7)
    for _ in range(2):
        t, exist, dst_fim, src_fim, im = _case(rng)
        t = jnp.asarray(np.asarray(t) * 1.4)
        o_ref = _occlusion_from_fim(t, exist, dst_fim, src_fim)
        tex_ref = grid_sample_packed(im, t, align_corners=False)
        o, tex = _occlusion_and_sample(t, exist, dst_fim, src_fim, im)
        np.testing.assert_array_equal(np.asarray(o), np.asarray(o_ref))
        np.testing.assert_array_equal(np.asarray(tex), np.asarray(tex_ref))


def test_fused_all_background():
    rng = np.random.RandomState(1)
    t, exist, dst_fim, src_fim, im = _case(rng, frac_noface=1.0)
    o, tex = _occlusion_and_sample(t, exist, dst_fim, src_fim, im)
    assert float(jnp.abs(o).sum()) == 0.0
    assert float(jnp.abs(tex).sum()) == 0.0
