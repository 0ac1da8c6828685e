"""Metric-layer tests: SSIM/MS-SSIM invariants + a from-scratch numpy SSIM
cross-check, exact Fréchet math, inception/lpips port plumbing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hoig_tpu.metrics.fid import calculate_frechet_distance
from hoig_tpu.metrics.inception import FIDInceptionV3
from hoig_tpu.metrics.lpips import LPIPSNet, make_lpips
from hoig_tpu.metrics.ssim import ms_ssim, ssim


def _numpy_ssim(x, y, data_range):
    """Independent scalar SSIM implementation (valid-window Gaussian)."""
    from scipy.ndimage import convolve

    size, sigma = 11, 1.5
    coords = np.arange(size) - size // 2
    g = np.exp(-(coords**2) / (2 * sigma**2))
    g /= g.sum()
    win = np.outer(g, g)

    def blur(im):
        out = convolve(im, win, mode="constant")
        k = size // 2
        return out[k:-k, k:-k]

    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mx, my = blur(x), blur(y)
    sx = blur(x * x) - mx**2
    sy = blur(y * y) - my**2
    sxy = blur(x * y) - mx * my
    return np.mean(
        ((2 * mx * my + c1) * (2 * sxy + c2))
        / ((mx**2 + my**2 + c1) * (sx + sy + c2))
    )


def test_ssim_identity_and_noise(rng):
    x = rng.rand(2, 3, 64, 64).astype(np.float32) * 255
    assert float(ssim(jnp.asarray(x), jnp.asarray(x))) == pytest.approx(1.0, abs=1e-5)
    y = x + rng.randn(*x.shape).astype(np.float32) * 20
    v = float(ssim(jnp.asarray(x), jnp.asarray(y)))
    assert 0 < v < 1.0
    y2 = x + rng.randn(*x.shape).astype(np.float32) * 60
    assert float(ssim(jnp.asarray(x), jnp.asarray(y2))) < v


def test_ssim_matches_independent_numpy(rng):
    x = (rng.rand(1, 1, 48, 48) * 255).astype(np.float32)
    y = np.clip(x + rng.randn(1, 1, 48, 48) * 25, 0, 255).astype(np.float32)
    ours = float(ssim(jnp.asarray(x), jnp.asarray(y), data_range=255))
    ref = _numpy_ssim(x[0, 0], y[0, 0], 255)
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_ms_ssim_range(rng):
    x = rng.rand(1, 3, 180, 180).astype(np.float32) * 255
    assert float(ms_ssim(jnp.asarray(x), jnp.asarray(x))) == pytest.approx(
        1.0, abs=1e-4
    )
    y = np.clip(x + rng.randn(*x.shape) * 30, 0, 255).astype(np.float32)
    v = float(ms_ssim(jnp.asarray(x), jnp.asarray(y)))
    assert 0 < v < 1


def test_frechet_distance_exact():
    d = 8
    mu = np.zeros(d)
    sigma = np.eye(d)
    assert calculate_frechet_distance(mu, sigma, mu, sigma) == pytest.approx(0, abs=1e-8)
    # diagonal analytic case: d^2 = |dmu|^2 + sum(s1 + s2 - 2 sqrt(s1 s2))
    mu2 = np.full(d, 0.5)
    s1 = np.diag(np.arange(1, d + 1, dtype=np.float64))
    s2 = np.diag(np.arange(2, d + 2, dtype=np.float64))
    expected = (0.25 * d) + np.sum(
        np.arange(1, d + 1) + np.arange(2, d + 2)
        - 2 * np.sqrt(np.arange(1, d + 1) * np.arange(2, d + 2))
    )
    got = calculate_frechet_distance(mu, s1, mu2, s2)
    np.testing.assert_allclose(got, expected, rtol=1e-9)


def test_frechet_sample_statistics(rng):
    a = rng.randn(2000, 4)
    b = rng.randn(2000, 4) + 1.0
    d = calculate_frechet_distance(
        a.mean(0), np.cov(a, rowvar=False), b.mean(0), np.cov(b, rowvar=False)
    )
    assert d == pytest.approx(4.0, rel=0.15)  # |dmu|^2 = 4, covs equal


def test_inception_shapes():
    model = FIDInceptionV3()
    x = jnp.zeros((2, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, 2048)
    # param count sanity: FID inception conv stack is ~23.8M params
    n = sum(np.prod(p.shape) for p in jax.tree.leaves(params["params"]))
    assert 20e6 < n < 28e6


def test_inception_weight_port_roundtrip():
    """Fabricate a torch-format state dict from the flax tree and port it."""
    from hoig_tpu.metrics.inception import load_torch_weights

    model = FIDInceptionV3()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 75, 75, 3)))
    rng = np.random.RandomState(0)
    state = {}

    def walk(node, prefix):
        for k, v in node.items():
            if k == "conv":
                kern = np.asarray(v["kernel"])
                state[f"{prefix}.conv.weight"] = (
                    rng.randn(*kern.transpose(3, 2, 0, 1).shape) * 0.05
                ).astype(np.float32)
            elif k == "bn":
                c = np.asarray(v["scale"]).shape[0]
                state[f"{prefix}.bn.weight"] = rng.rand(c).astype(np.float32) + 0.5
                state[f"{prefix}.bn.bias"] = rng.randn(c).astype(np.float32)
                state[f"{prefix}.bn.running_mean"] = rng.randn(c).astype(np.float32)
                state[f"{prefix}.bn.running_var"] = rng.rand(c).astype(np.float32) + 0.5
            elif isinstance(v, dict):
                walk(v, f"{prefix}.{k}" if prefix else k)

    walk(params["params"], "")
    ported = load_torch_weights(params, state)
    k0 = np.asarray(ported["params"]["Conv2d_1a_3x3"]["conv"]["kernel"])
    np.testing.assert_allclose(
        k0, state["Conv2d_1a_3x3.conv.weight"].transpose(2, 3, 1, 0)
    )
    m0 = np.asarray(ported["batch_stats"]["Mixed_5b"]["branch1x1"]["bn"]["mean"])
    np.testing.assert_allclose(m0, state["Mixed_5b.branch1x1.bn.running_mean"])
    out = model.apply(ported, jnp.zeros((1, 75, 75, 3)))
    assert np.isfinite(np.asarray(out)).all()


def test_lpips_identity_and_port(rng):
    model = LPIPSNet()
    z = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32) * 2 - 1)
    params = model.init(jax.random.PRNGKey(0), z, z)
    assert float(model.apply(params, z, z)) == pytest.approx(0.0, abs=1e-6)

    from hoig_tpu.metrics.lpips import _ALEX_CFG, _ALEX_TORCH_IDX, load_weights

    state_a, in_c = {}, 3
    for (c, k, s, p), ti in zip(_ALEX_CFG, _ALEX_TORCH_IDX):
        state_a[f"features.{ti}.weight"] = rng.randn(c, in_c, k, k).astype(np.float32) * 0.05
        state_a[f"features.{ti}.bias"] = rng.randn(c).astype(np.float32) * 0.05
        in_c = c
    state_l = {
        f"lpips_weights.{i}.main.1.weight": np.abs(
            rng.randn(1, c, 1, 1)
        ).astype(np.float32)
        for i, (c, *_rest) in enumerate(_ALEX_CFG)
    }
    from hoig_tpu.metrics import lpips as lpips_mod

    # port via temp npz files
    import tempfile

    fa = tempfile.mktemp(suffix=".npz")
    fl = tempfile.mktemp(suffix=".npz")
    np.savez(fa, **state_a)
    np.savez(fl, **state_l)
    ported = lpips_mod.load_weights(params, fa, fl)
    w = np.asarray(ported["params"]["alexnet"]["conv_0"]["kernel"])
    np.testing.assert_allclose(
        w, state_a["features.0.weight"].transpose(2, 3, 1, 0)
    )
    y = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32) * 2 - 1)
    v = float(model.apply(ported, z, y))
    assert v > 0 and np.isfinite(v)
