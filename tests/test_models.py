"""Network-family tests: shapes, torch-parity of conv geometry/norms."""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from hoig_tpu.models import NetworksFactory
from hoig_tpu.models.generator import ExtractorAttn, ResUnetGenerator
from hoig_tpu.models.layers import InstanceNorm
from hoig_tpu.models.vgg import Vgg19Features, load_torch_weights


def test_instance_norm_matches_torch(rng):
    x = rng.randn(2, 8, 8, 5).astype(np.float32)
    m = InstanceNorm(affine=False)
    p = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = np.asarray(m.apply(p, jnp.asarray(x)))
    theirs = tnn.InstanceNorm2d(5, affine=False)(
        torch.from_numpy(x.transpose(0, 3, 1, 2))
    ).numpy()
    np.testing.assert_allclose(ours, theirs.transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5)


def _torch_patch_d(input_nc, ndf=64, n_layers=4):
    """Independent torch build of the reference PatchGAN layout
    (discriminator.py:8-57) for weight-copy parity testing."""
    layers = [tnn.Conv2d(input_nc, ndf, 4, 2, 1), tnn.LeakyReLU(0.2)]
    nf = 1
    for n in range(1, n_layers):
        nf_prev, nf = nf, min(2**n, 8)
        layers += [
            tnn.Conv2d(ndf * nf_prev, ndf * nf, 4, 2, 1, bias=True),
            tnn.InstanceNorm2d(ndf * nf, affine=False),
            tnn.LeakyReLU(0.2),
        ]
    nf_prev, nf = nf, min(2**n_layers, 8)
    layers += [
        tnn.Conv2d(ndf * nf_prev, ndf * nf, 4, 1, 1, bias=True),
        tnn.InstanceNorm2d(ndf * nf, affine=False),
        tnn.LeakyReLU(0.2),
        tnn.Conv2d(ndf * nf, 1, 4, 1, 1),
    ]
    return tnn.Sequential(*layers)


def test_patch_discriminator_torch_parity(rng):
    d = NetworksFactory.get_by_name(
        "discriminator_patch_gan", input_nc=7, norm_type="instance", ndf=8, n_layers=4
    )
    x = rng.randn(2, 64, 64, 7).astype(np.float32)
    params = d.init(jax.random.PRNGKey(0), jnp.asarray(x))

    td = _torch_patch_d(7, ndf=8, n_layers=4)
    # copy flax weights into the torch twin (HWIO -> OIHW)
    convs = [m for m in td if isinstance(m, tnn.Conv2d)]
    flax_convs = [params["params"][k] for k in sorted(
        params["params"], key=lambda s: int(s.split("_")[-1]))]
    assert len(convs) == len(flax_convs)
    with torch.no_grad():
        for tc, fc in zip(convs, flax_convs):
            tc.weight.copy_(torch.from_numpy(
                np.asarray(fc["kernel"]).transpose(3, 2, 0, 1)))
            tc.bias.copy_(torch.from_numpy(np.asarray(fc["bias"])))

    with jax.default_matmul_precision("highest"):
        ours = np.asarray(d.apply(params, jnp.asarray(x)))
    theirs = td(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
    assert ours.shape == theirs.transpose(0, 2, 3, 1).shape
    np.testing.assert_allclose(ours, theirs.transpose(0, 2, 3, 1), rtol=5e-3, atol=5e-4)


def test_resunet_num_channel():
    m = ResUnetGenerator(conv_dim=64, repeat_num=6, n_down=3)
    nc = m.num_channel
    assert nc[0] == 64 and nc[1] == 128 and nc[2] == 256 and nc[3] == 512
    for i in range(4, 10):
        assert nc[i] == 512


@pytest.mark.parametrize("gen_name", ["generator_base", "generator_spade_attn_tiny"])
def test_generator_variants_forward(gen_name, rng):
    S, B = 32, 1
    if gen_name == "generator_base":
        g = NetworksFactory.get_by_name(
            gen_name, bg_dim=8, img_dim=12, obj_dim=12, conv_dim=16, repeat_num=2
        )
        kw = dict(
            bg_inputs=jnp.zeros((B, S, S, 4)),
            src_obj_inputs=jnp.zeros((B, S, S, 12)),
            tsf_obj_inputs=jnp.zeros((B, S, S, 12)),
            src_hand_inputs=jnp.zeros((B, S, S, 12)),
            tsf_hand_inputs=jnp.zeros((B, S, S, 12)),
            T=jnp.zeros((B, S, S, 2)),
        )
    else:
        g = NetworksFactory.get_by_name(
            gen_name, bg_dim=8, img_dim=3, obj_dim=3, img_cond_dim=3,
            obj_cond_dim=12, conv_dim=16, repeat_num=2,
        )
        kw = dict(
            bg_inputs=jnp.zeros((B, S, S, 4)),
            src_obj_inputs=jnp.zeros((B, S, S, 3)),
            tsf_obj_inputs=jnp.zeros((B, S, S, 3)),
            src_hand_inputs=jnp.zeros((B, S, S, 3)),
            tsf_hand_inputs=jnp.zeros((B, S, S, 3)),
            T=jnp.zeros((B, S, S, 2)),
            src_obj_conds=jnp.zeros((B, S, S, 12)),
            src_hand_conds=jnp.zeros((B, S, S, 3)),
            tsf_obj_conds=jnp.zeros((B, S, S, 12)),
            tsf_hand_conds=jnp.zeros((B, S, S, 3)),
            src_armask=jnp.zeros((B, S, S, 1)),
            tsf_armask=jnp.zeros((B, S, S, 1)),
        )
    params = g.init(jax.random.PRNGKey(0), **kw)
    outs = g.apply(params, **kw)
    assert len(outs) == 10
    assert outs[2].shape == (B, S, S, 3)  # src_obj rgb
    assert outs[4].shape == (B, S, S, 1)  # src mask bg
    # tanh/sigmoid ranges
    assert np.abs(np.asarray(outs[2])).max() <= 1.0
    assert 0.0 <= np.asarray(outs[4]).min() and np.asarray(outs[4]).max() <= 1.0


def test_generator_corner_engines_agree(rng):
    """All three corner engines must produce the same full-Generator
    forward from identical params (engines share the param structure, so
    checkpoints and converted reference weights are engine-portable)."""
    S, B = 32, 2
    kw = dict(
        bg_inputs=jnp.asarray(rng.rand(B, S, S, 4), jnp.float32),
        src_obj_inputs=jnp.asarray(rng.rand(B, S, S, 3), jnp.float32),
        tsf_obj_inputs=jnp.asarray(rng.rand(B, S, S, 3), jnp.float32),
        src_hand_inputs=jnp.asarray(rng.rand(B, S, S, 3), jnp.float32),
        tsf_hand_inputs=jnp.asarray(rng.rand(B, S, S, 3), jnp.float32),
        # in-contract flow range (see ExtractorAttn engine notes)
        T=jnp.asarray(rng.rand(B, S, S, 2) * 2.0 - 1.0, jnp.float32),
        src_obj_conds=jnp.asarray(rng.rand(B, S, S, 12), jnp.float32),
        src_hand_conds=jnp.asarray(rng.rand(B, S, S, 3), jnp.float32),
        tsf_obj_conds=jnp.asarray(rng.rand(B, S, S, 12), jnp.float32),
        tsf_hand_conds=jnp.asarray(rng.rand(B, S, S, 3), jnp.float32),
        src_armask=jnp.zeros((B, S, S, 1)),
        tsf_armask=jnp.zeros((B, S, S, 1)),
    )

    def build(engine):
        return NetworksFactory.get_by_name(
            "generator_spade_attn", bg_dim=8, img_dim=3, obj_dim=3,
            img_cond_dim=3, obj_cond_dim=12, conv_dim=16, repeat_num=2,
            remat=False, corner_engine=engine,
        )

    g0 = build("gather")
    params = g0.init(jax.random.PRNGKey(3), **kw)
    with jax.default_matmul_precision("highest"):
        ref = g0.apply(params, **kw)
        for engine in ("shift", "pallas"):
            outs = build(engine).apply(params, **kw)
            for i, (a, b) in enumerate(zip(ref, outs)):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
                    err_msg=f"{engine} output {i}",
                )


def test_extractor_attn_shapes(rng):
    m = ExtractorAttn(kernel_size=5)
    x = jnp.asarray(rng.randn(1, 8, 8, 6).astype(np.float32))
    y = jnp.asarray(rng.randn(1, 8, 8, 6).astype(np.float32))
    f = jnp.asarray(rng.randn(1, 8, 8, 2).astype(np.float32))
    p = m.init(jax.random.PRNGKey(0), x, y, f)
    out = m.apply(p, x, y, f)
    assert out.shape == (1, 8, 8, 6)


def test_vgg_torch_weight_port(rng):
    """Build a small random torchvision-format state dict, port it, compare
    against a direct torch conv/pool evaluation of the same stack."""
    torch.manual_seed(0)
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
           512, 512, 512, 512, "M", 512]
    mods, idx, state = [], 0, {}
    in_c = 3
    for item in cfg:
        if item == "M":
            mods.append(tnn.MaxPool2d(2, 2))
            idx += 1
            continue
        c = tnn.Conv2d(in_c, item, 3, padding=1)
        state[f"features.{idx}.weight"] = c.weight.detach()
        state[f"features.{idx}.bias"] = c.bias.detach()
        mods.append(c)
        mods.append(tnn.ReLU())
        in_c = item
        idx += 2
    tnet = tnn.Sequential(*mods)

    model = Vgg19Features()
    x = rng.randn(1, 32, 32, 3).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = load_torch_weights(params, state)
    with jax.default_matmul_precision("highest"):
        ours = model.apply(params, jnp.asarray(x))

    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
    feats, cut_points = [], [2, 7, 12, 21, 30]
    h = tx
    for i, m in enumerate(tnet):
        h = m(h)
        if i + 1 in cut_points:
            feats.append(h.detach().numpy())
    assert len(ours) == len(feats)
    for a, b in zip(ours, feats):
        np.testing.assert_allclose(
            np.asarray(a), b.transpose(0, 2, 3, 1), rtol=2e-3, atol=2e-4
        )


@pytest.mark.parametrize("engine", ["shift", "gather", "pallas"])
def test_extractor_attn_fused_equals_block_formulation(rng, engine):
    """All fused corner engines must match the reference's block-expansion
    formulation exactly (same params, same math). The shift and pallas
    engines are exact for the model's bounded flow contract (T_scale - idt
    in [-3, 2), see generator.ExtractorAttn); the gather engine for any
    flow."""
    from hoig_tpu.ops.block_extractor import (
        block_extractor_nhwc,
        local_attn_reshape_nhwc,
    )
    import flax.linen as fnn
    import jax.numpy as jnp

    B, H, W, C, K = 2, 8, 8, 6, 5
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    y = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    if engine in ("shift", "pallas"):
        # the in-contract flow range, edge cases included
        f = jnp.asarray((rng.rand(B, H, W, 2) * 4.99 - 3.0).astype(np.float32))
    else:
        f = jnp.asarray((rng.randn(B, H, W, 2) * 1.3).astype(np.float32))
    m = ExtractorAttn(kernel_size=K, corner_engine=engine)
    params = m.init(jax.random.PRNGKey(1), x, y, f)
    with jax.default_matmul_precision("highest"):
        fused = np.asarray(m.apply(params, x, y, f))

    p = params["params"]
    w0, b0 = jnp.asarray(p["fc_0_kernel"]), jnp.asarray(p["fc_0_bias"])
    w1, b1 = jnp.asarray(p["fc_1_kernel"]), jnp.asarray(p["fc_1_bias"])
    bs = block_extractor_nhwc(x, f, K)
    bt = block_extractor_nhwc(y, jnp.zeros_like(f), K)
    cat = jnp.concatenate([bt, bs], axis=-1)
    with jax.default_matmul_precision("highest"):
        conv_out = jax.lax.conv_general_dilated(
            cat, w0, (K, K), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + b0
        h = fnn.leaky_relu(conv_out, negative_slope=0.01)
        logits = jax.lax.conv_general_dilated(
            h, w1, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + b1
    attn = fnn.softmax(logits, axis=-1)
    ref = np.asarray(
        fnn.avg_pool(local_attn_reshape_nhwc(attn, K) * bs, (K, K), strides=(K, K))
    )
    np.testing.assert_allclose(fused, ref, rtol=1e-3, atol=1e-5)
