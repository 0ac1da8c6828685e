"""Correctness tests for the fused Pallas flow-attention kernel.

Oracle: a direct jnp transcription of the reference ExtractorAttn
semantics (HOIG_HOv3/models/networks/extract_attn.py:8-37 +
thirdparty/block_extractor/.../block_extractor_kernel.cu:58-68) —
per-offset bilinear samples with border-clamped corner indices and
unclamped weights, fc_0 source-half projection, softmax over the 25
offsets, attention-weighted mean. Written independently of both the
kernel and the generator engines; runs in f32 on CPU.

The Pallas kernel runs in interpret mode on CPU (same code path the TPU
lowering traces). Forward and every trainable gradient are compared.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hoig_tpu.ops import attn_pallas as ap

K = 5
R = K // 2
F = 128


def oracle(src, acc0, w0s, w1, b1, flow):
    """(B,H,W,C) f32 reference output via explicit clamped bilinear gathers."""
    b, h, w, c = src.shape
    f32 = jnp.float32
    xf = jax.lax.broadcasted_iota(f32, (h, w), 1)
    yf = jax.lax.broadcasted_iota(f32, (h, w), 0)
    fx = flow[..., 0] + xf
    fy = flow[..., 1] + yf
    x0 = jnp.floor(fx).astype(jnp.int32)
    y0 = jnp.floor(fy).astype(jnp.int32)
    wx1 = (fx - jnp.floor(fx))[..., None]
    wy1 = (fy - jnp.floor(fy))[..., None]

    def sample(dy, dx):
        out = 0.0
        for cy in (0, 1):
            for cx in (0, 1):
                yc = jnp.clip(y0 + dy + cy, 0, h - 1)
                xc = jnp.clip(x0 + dx + cx, 0, w - 1)
                idx = (yc * w + xc).reshape(b, h * w)
                g = jnp.take_along_axis(
                    src.reshape(b, h * w, c), idx[..., None], axis=1
                ).reshape(b, h, w, c)
                wgt = (wy1 if cy else 1.0 - wy1) * (wx1 if cx else 1.0 - wx1)
                out = out + wgt * g
        return out

    samples = [sample(dy, dx) for dy in range(-R, R + 1)
               for dx in range(-R, R + 1)]
    acc = acc0
    for t, s_t in enumerate(samples):
        acc = acc + s_t @ w0s[t]
    hdn = jnp.where(acc >= 0, acc, 0.01 * acc)
    logits = jnp.einsum("bhwf,fk->bhwk", hdn, w1) + b1[0]
    attn = jax.nn.softmax(logits, axis=-1)
    out = 0.0
    for t, s_t in enumerate(samples):
        out = out + attn[..., t : t + 1] * s_t
    return out / (K * K)


def make_inputs(rng, b, h, w, c, integer_flow=False):
    src = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    acc0 = jnp.asarray(0.1 * rng.randn(b, h, w, F), jnp.float32)
    w0s = jnp.asarray(rng.randn(K * K, c, F) / np.sqrt(c * K * K), jnp.float32)
    w1 = jnp.asarray(rng.randn(F, K * K) / np.sqrt(F), jnp.float32)
    b1 = jnp.asarray(0.1 * rng.randn(1, K * K), jnp.float32)
    # reference flow bound: T in [-2,1], idt in [-1,1) => flow in [-3,2)
    flow = rng.uniform(-2.95, 1.95, size=(b, h, w, 2))
    if integer_flow:
        flow = np.round(flow)
    flow = jnp.asarray(flow, jnp.float32)
    return src, acc0, w0s, w1, b1, flow


def fused(src, acc0, w0s, w1, b1, flow):
    fy_rel, fx_rel, wy, wx = ap._flow_fields(flow)
    return ap.flow_attention_fused(
        src, acc0, w0s, w1, b1, fy_rel, fx_rel, wy, wx, True
    )


@pytest.mark.parametrize("shape,int_flow", [
    ((2, 16, 24, 32), False),
    ((1, 16, 16, 8), True),   # exact-integer flows: frac == 0 edge
    ((1, 48, 40, 16), False),  # multi-tile grid (th < h)
])
def test_forward_matches_oracle(rng, shape, int_flow):
    b, h, w, c = shape
    args = make_inputs(rng, b, h, w, c, integer_flow=int_flow)
    got = fused(*args)
    want = oracle(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_gradients_match_oracle(rng):
    b, h, w, c = 1, 16, 16, 8
    src, acc0, w0s, w1, b1, flow = make_inputs(rng, b, h, w, c)
    cot = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)

    def loss(fn):
        def f(src, acc0, w0s, w1, b1):
            return jnp.sum(fn(src, acc0, w0s, w1, b1, flow) * cot)
        return f

    g_fused = jax.grad(loss(fused), argnums=(0, 1, 2, 3, 4))(
        src, acc0, w0s, w1, b1
    )
    g_ora = jax.grad(loss(oracle), argnums=(0, 1, 2, 3, 4))(
        src, acc0, w0s, w1, b1
    )
    names = ["src", "acc0", "w0s", "w1", "b1"]
    for n, gf, go in zip(names, g_fused, g_ora):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(go), rtol=2e-4, atol=2e-4,
            err_msg=f"grad mismatch: {n}",
        )


def test_gradients_match_oracle_multichunk(rng):
    # c=256 exercises the channel-chunked backward grid (two 128 chunks):
    # per-chunk gsrc blocks, dW accumulation over the (b, i) sweep per
    # chunk, and gattn accumulation over chunks
    b, h, w, c = 1, 8, 8, 256
    src, acc0, w0s, w1, b1, flow = make_inputs(rng, b, h, w, c)
    cot = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)

    def loss(fn):
        def f(src, acc0, w0s, w1, b1):
            return jnp.sum(fn(src, acc0, w0s, w1, b1, flow) * cot)
        return f

    g_fused = jax.grad(loss(fused), argnums=(0, 2, 3))(src, acc0, w0s, w1, b1)
    g_ora = jax.grad(loss(oracle), argnums=(0, 2, 3))(src, acc0, w0s, w1, b1)
    for n, gf, go in zip(["src", "w0s", "w1"], g_fused, g_ora):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(go), rtol=2e-4, atol=2e-4,
            err_msg=f"grad mismatch: {n}",
        )


def test_gradients_match_oracle_multitile(rng):
    # th < h exercises the cross-tile margin folds in every backward kernel
    b, h, w, c = 1, 48, 48, 8
    src, acc0, w0s, w1, b1, flow = make_inputs(rng, b, h, w, c)
    cot = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)

    def loss(fn):
        def f(src, acc0, w0s, w1, b1):
            return jnp.sum(fn(src, acc0, w0s, w1, b1, flow) * cot)
        return f

    g_fused = jax.grad(loss(fused), argnums=(0, 2))(src, acc0, w0s, w1, b1)
    g_ora = jax.grad(loss(oracle), argnums=(0, 2))(src, acc0, w0s, w1, b1)
    for n, gf, go in zip(["src", "w0s"], g_fused, g_ora):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(go), rtol=2e-4, atol=2e-4,
            err_msg=f"grad mismatch: {n}",
        )
