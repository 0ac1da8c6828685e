"""block_extractor / local_attn_reshape tests.

Mirrors the reference kernel test strategy
(thirdparty/block_extractor/test_block_extractor.py:44-78): zero-flow
forward identity + gradcheck, here as finite differences through jax.grad.
"""

import numpy as np
import jax
import jax.numpy as jnp

from hoig_tpu.ops import block_extractor, local_attn_reshape


def _reference_block_extractor(source, flow, k):
    """Straight numpy re-derivation of block_extractor_kernel.cu:20-85."""
    b, c, h, w = source.shape
    out = np.zeros((b, c, h * k, w * k), np.float32)
    for bi in range(b):
        for yo in range(h * k):
            for xo in range(w * k):
                yf, xf = yo // k, xo // k
                oy, ox = yo % k - k // 2, xo % k - k // 2
                fx = flow[bi, 0, yf, xf] + xf + ox
                fy = flow[bi, 1, yf, xf] + yf + oy
                x0, y0 = int(np.floor(fx)), int(np.floor(fy))
                tx, ty = fx - x0, fy - y0
                for dy, wy in ((0, 1 - ty), (1, ty)):
                    yc = min(max(y0 + dy, 0), h - 1)
                    for dx, wx in ((0, 1 - tx), (1, tx)):
                        xc = min(max(x0 + dx, 0), w - 1)
                        out[bi, :, yo, xo] += wy * wx * source[bi, :, yc, xc]
    return out


def test_block_extractor_zero_flow_center_identity(rng):
    src = rng.randn(1, 2, 6, 6).astype(np.float32)
    k = 3
    out = np.asarray(block_extractor(jnp.asarray(src), jnp.zeros((1, 2, 6, 6)), k))
    # center of each k-block equals the source pixel (reference test :44-55)
    np.testing.assert_allclose(out[:, :, 1::k, 1::k], src, rtol=1e-5, atol=1e-5)


def test_block_extractor_matches_reference_semantics(rng):
    src = rng.randn(2, 3, 5, 4).astype(np.float32)
    flow = (rng.randn(2, 2, 5, 4) * 1.5).astype(np.float32)
    out = np.asarray(block_extractor(jnp.asarray(src), jnp.asarray(flow), 3))
    ref = _reference_block_extractor(src, flow, 3)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_block_extractor_grad_finite_difference(rng):
    """Analog of torch.autograd.gradcheck in double precision
    (test_block_extractor.py:74-78)."""
    src = rng.randn(1, 1, 4, 4).astype(np.float64)
    flow = (rng.randn(1, 2, 4, 4) * 0.3 + 0.2).astype(np.float64)

    def loss_src(s):
        return jnp.sum(jnp.sin(block_extractor(s, jnp.asarray(flow), 3)))

    def loss_flow(f):
        return jnp.sum(jnp.sin(block_extractor(jnp.asarray(src), f, 3)))

    with jax.enable_x64(True):
        for fn, x in ((loss_src, src), (loss_flow, flow)):
            g = np.asarray(jax.grad(fn)(jnp.asarray(x)))
            eps = 1e-6
            for _ in range(10):
                idx = tuple(rng.randint(0, d) for d in x.shape)
                xp, xm = x.copy(), x.copy()
                xp[idx] += eps
                xm[idx] -= eps
                fd = (float(fn(jnp.asarray(xp))) - float(fn(jnp.asarray(xm)))) / (
                    2 * eps
                )
                np.testing.assert_allclose(g[idx], fd, rtol=1e-4, atol=1e-7)


def test_local_attn_reshape_scatter(rng):
    k, h, w = 3, 2, 2
    x = rng.randn(1, k * k, h, w).astype(np.float32)
    out = np.asarray(local_attn_reshape(jnp.asarray(x), k))
    assert out.shape == (1, 1, k * h, k * w)
    # channel oy*k+ox lands at in-block position (oy, ox)
    # (local_attn_reshape_kernel.cu:20-61 semantics)
    for oy in range(k):
        for ox in range(k):
            np.testing.assert_array_equal(out[0, 0, oy::k, ox::k], x[0, oy * k + ox])
