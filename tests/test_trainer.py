"""GAN train-step, checkpoint, LR-schedule, loader, and DP tests."""

import os
import tempfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hoig_tpu.data.loader import DataLoader, ShardedSampler, numpy_collate
from hoig_tpu.data.synthetic import synthetic_batch, synthetic_environment
from hoig_tpu.geometry.conditioning import ConditioningConfig, hand_recovery_flow
from hoig_tpu.models.vgg import Vgg19Features
from hoig_tpu.parallel import DataParallel, make_data_mesh
from hoig_tpu.train import (
    TrainConfig,
    build_networks,
    decay_lr,
    init_state,
    load_checkpoint,
    make_train_step,
    save_checkpoint,
    scan_latest_epoch,
)
from hoig_tpu.train.losses import bce_loss, l1_loss, lsgan_loss, tv_smooth_loss
from hoig_tpu.train.trainer import generator_kwargs

S = 64


@pytest.fixture(scope="module")
def setup():
    tables_np, mano, obj_verts = synthetic_environment(2, S)
    tables = tables_np.as_jax()
    mano_params = mano.as_jax()
    ccfg = ConditioningConfig(image_size=S)
    tcfg = TrainConfig(image_size=S, conv_dim=8, repeat_num=2, remat=False)
    g, d = build_networks(tcfg)
    vgg = Vgg19Features()
    rng = jax.random.PRNGKey(0)
    vgg_params = jax.jit(vgg.init)(rng, jnp.zeros((1, S, S, 3)))
    batch = {
        k: (jax.tree.map(jnp.asarray, v) if isinstance(v, dict) else jnp.asarray(v))
        for k, v in synthetic_batch(2, obj_verts, image_size=S).items()
    }

    def gkw_of(b_):
        flow = hand_recovery_flow(
            tables, mano_params, b_["imageA"], b_["imageB"], b_["manoA"],
            b_["manoB"], ccfg,
        )
        return generator_kwargs(flow, b_.get("maskA"), b_.get("maskB"), True)

    shapes = jax.eval_shape(gkw_of, batch)
    gkw = {k: (None if v is None else jnp.zeros(v.shape, v.dtype))
           for k, v in shapes.items()}
    state = init_state(rng, g, d, tcfg, gkw, jnp.zeros((2, S, S, tcfg.d_input_nc)))
    step = jax.jit(
        make_train_step(g, d, vgg, vgg_params, tables, mano_params, ccfg, tcfg)
    )
    return dict(state=state, step=step, batch=batch, tcfg=tcfg,
                gkw=gkw, g=g, d=d, vgg=vgg, vgg_params=vgg_params,
                tables=tables, mano_params=mano_params, ccfg=ccfg)


def _first(tree):
    return jax.tree.leaves(tree)[0]


def test_step_updates_and_d_gating(setup):
    s0 = setup["state"]
    s1, m = setup["step"](s0, setup["batch"], jnp.asarray(True))
    for k in ("loss_G", "loss_D", "g_rec", "g_tsf", "g_adv", "g_mask",
              "g_mask_smooth", "d_real", "d_fake"):
        assert np.isfinite(float(m[k])), k
    assert not np.allclose(_first(s1.params_g), _first(s0.params_g))
    assert not np.allclose(_first(s1.params_d), _first(s0.params_d))
    # gated step: D untouched (params AND optimizer state)
    s2, _ = setup["step"](s1, setup["batch"], jnp.asarray(False))
    assert np.allclose(_first(s2.params_d), _first(s1.params_d))
    chex_equal = jax.tree.map(
        lambda a, b: bool(jnp.allclose(a, b)), s2.opt_d, s1.opt_d
    )
    assert all(jax.tree.leaves(chex_equal))
    assert not np.allclose(_first(s2.params_g), _first(s1.params_g))
    assert int(s2.step) == 2


def test_losses_drop_over_steps(setup):
    s = setup["state"]
    first = last = None
    for i in range(8):
        s, m = setup["step"](s, setup["batch"], jnp.asarray(True))
        if i == 0:
            first = float(m["g_rec"])
        last = float(m["g_rec"])
    assert last < first  # L1 reconstruction must improve on a fixed batch


def test_lr_decay_schedule(setup):
    tcfg = setup["tcfg"]
    s = setup["state"]
    expected_step = (tcfg.lr_G - tcfg.final_lr) / tcfg.nepochs_decay
    for i in range(tcfg.nepochs_decay):
        s = decay_lr(s, tcfg)
    np.testing.assert_allclose(float(s.lr_g), tcfg.final_lr, rtol=1e-4, atol=1e-9)
    np.testing.assert_allclose(
        float(setup["state"].lr_g) - expected_step,
        float(decay_lr(setup["state"], tcfg).lr_g),
        rtol=1e-6,
    )


def test_checkpoint_roundtrip_and_scan(setup):
    d = tempfile.mkdtemp()
    s1, _ = setup["step"](setup["state"], setup["batch"], jnp.asarray(True))
    save_checkpoint(d, 7, s1)
    save_checkpoint(d, 3, s1)
    assert scan_latest_epoch(d) == 7
    assert sorted(os.listdir(d))[0].startswith("net_epoch_")
    restored = load_checkpoint(d, 7, setup["state"])
    assert np.allclose(_first(restored.params_g), _first(s1.params_g))
    assert np.allclose(_first(restored.opt_g["opt"] if isinstance(restored.opt_g, dict) else restored.opt_g[0].mu),
                       _first(s1.opt_g[0].mu))
    assert int(restored.step) == int(s1.step)

    # a run killed mid-save leaves a TORN epoch (net files written, opt
    # files missing); the scan must fall back to the newest COMPLETE epoch
    # instead of handing auto-resume an unloadable one
    open(os.path.join(d, "net_epoch_9_id_G.ckpt"), "wb").close()
    open(os.path.join(d, "net_epoch_9_id_D.ckpt"), "wb").close()
    assert scan_latest_epoch(d) == 7


def test_data_parallel_matches_single_device(setup):
    """8-virtual-device DP step == single-device step on the same batch."""
    mesh = make_data_mesh()
    assert mesh.devices.size == 8
    tcfg = setup["tcfg"]
    tables, mano_params, ccfg = setup["tables"], setup["mano_params"], setup["ccfg"]
    from hoig_tpu.data.synthetic import synthetic_environment as se

    _, _, obj_verts = se(2, S)
    batch8 = {
        k: (jax.tree.map(jnp.asarray, v) if isinstance(v, dict) else jnp.asarray(v))
        for k, v in synthetic_batch(8, obj_verts, image_size=S).items()
    }
    step_fn = make_train_step(
        setup["g"], setup["d"], setup["vgg"], setup["vgg_params"],
        tables, mano_params, ccfg, tcfg,
    )
    state = init_state(
        jax.random.PRNGKey(0), setup["g"], setup["d"], tcfg, setup["gkw"],
        jnp.zeros((2, S, S, tcfg.d_input_nc)),
    )
    # snapshot BEFORE the DP call: device_put may alias the device-0 shard,
    # so dp.step's donation deletes the original state leaves
    p0 = np.asarray(_first(state.params_g)).copy()
    ssd, msd = jax.jit(step_fn)(state, batch8, jnp.asarray(True))
    dp = DataParallel(step_fn, mesh)
    sdp, mdp = dp.step(dp.replicate(state), batch8, jnp.asarray(True))
    # same math: GSPMD partitions the batch; losses agree up to the
    # reduction-order difference of the partitioned sums. (Post-step params
    # are NOT compared: the first Adam step is sign-like — m/(sqrt(v)+eps)
    # with v ~ g^2 — so reduction-order noise flips near-zero updates.)
    # atol covers reduced-precision conv noise on near-zero logit means
    for key in ("loss_G", "loss_D", "g_rec", "g_tsf", "d_real", "d_fake"):
        np.testing.assert_allclose(
            float(mdp[key]), float(msd[key]), rtol=5e-3, atol=2e-3, err_msg=key
        )
    assert np.isfinite(np.asarray(_first(sdp.params_g))).all()
    assert not np.allclose(np.asarray(_first(sdp.params_g)), p0)


def test_loss_functions():
    x = jnp.asarray([[0.5, 0.2]])
    assert float(lsgan_loss(x, 1.0)) == pytest.approx(
        ((0.5 - 1) ** 2 + (0.2 - 1) ** 2) / 2
    )
    assert float(lsgan_loss(x, -1.0)) == pytest.approx(
        ((0.5 + 1) ** 2 + (0.2 + 1) ** 2) / 2
    )
    p = jnp.asarray([[0.9, 0.1]])
    t = jnp.asarray([[1.0, 0.0]])
    expected = -np.mean([np.log(0.9), np.log(0.9)])
    assert float(bce_loss(p, t)) == pytest.approx(expected, rel=1e-5)
    m = jnp.ones((1, 1, 4, 4))
    assert float(tv_smooth_loss(m)) == 0.0


def test_sharded_sampler_partitions():
    s0 = ShardedSampler(100, num_shards=4, shard_index=0, shuffle=True, seed=1)
    s1 = ShardedSampler(100, num_shards=4, shard_index=1, shuffle=True, seed=1)
    s0.set_epoch(3)
    s1.set_epoch(3)
    i0, i1 = s0.indices(), s1.indices()
    assert len(i0) == len(i1) == 25
    assert set(i0).isdisjoint(i1)
    # different epoch -> different permutation
    s0.set_epoch(4)
    assert not np.array_equal(i0, s0.indices())


def test_dataloader_batches():
    class Toy:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return {"x": np.full((2,), i, np.float32),
                    "nested": {"y": np.int32(i)}, "name": f"s{i}"}

    dl = DataLoader(Toy(), batch_size=3, shuffle=False, drop_last=True)
    batches = list(dl)
    assert len(batches) == 3 == len(dl)
    assert batches[0]["x"].shape == (3, 2)
    assert batches[0]["nested"]["y"].shape == (3,)
    assert batches[0]["name"] == ["s0", "s1", "s2"]


@pytest.mark.parametrize("rb,ra", [(False, True), (False, False)])
def test_selective_remat_configs_match_full_remat(setup, rb, ra):
    """Selective-remat variants (keep bottleneck activations / keep
    attention residuals) produce the same params as full remat — remat
    must never change values or checkpoint keys."""
    s = setup
    tcfg = TrainConfig(image_size=S, conv_dim=8, repeat_num=2, remat=True,
                       remat_bottleneck=rb, remat_attn=ra)
    g, d = build_networks(tcfg)
    rng = jax.random.PRNGKey(0)
    state = init_state(rng, g, d, tcfg, s["gkw"],
                       jnp.zeros((2, S, S, tcfg.d_input_nc)))
    # identical param tree (keys AND values) as the remat=False fixture
    ref_flat = jax.tree_util.tree_leaves_with_path(s["state"].params_g)
    new_flat = jax.tree_util.tree_leaves_with_path(state.params_g)
    assert [p for p, _ in ref_flat] == [p for p, _ in new_flat]
    for (_, a), (_, b) in zip(ref_flat, new_flat):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    step = jax.jit(
        make_train_step(g, d, s["vgg"], s["vgg_params"], s["tables"],
                        s["mano_params"], s["ccfg"], tcfg)
    )
    st1, m1 = step(state, s["batch"], jnp.asarray(True))
    _, m0 = s["step"](s["state"], s["batch"], jnp.asarray(True))
    # same loss values as the no-remat step (f32 compute either way)
    np.testing.assert_allclose(
        float(m1["loss_G"]), float(m0["loss_G"]), rtol=1e-4
    )
    assert np.isfinite(float(m1["loss_D"]))


def test_dexycb_variant_train_step():
    """The DexYCB production config (fxfy camera, PCA-45 MANO, 24-ch D,
    hand-seg channels, no masks — SURVEY §2.11 deltas; reference
    HOIG_DexYCB/models/trainer.py:263-270) runs a full train step and
    updates both networks. Mirrors the bench.py train_bf16_dexycb leg."""
    tables_np, mano, obj_verts = synthetic_environment(2, S)
    tables = tables_np.as_jax()
    mano_params = mano.as_jax()
    ccfg = ConditioningConfig(image_size=S, camera_model="fxfy",
                              mano_pca_comps=45, mano_flat_hand_mean=False)
    tcfg = TrainConfig(image_size=S, conv_dim=8, repeat_num=2, remat=False,
                       bg_dim=13, img_cond_dim=9, d_input_nc=24,
                       use_armask=False)
    g, d = build_networks(tcfg)
    vgg = Vgg19Features()
    rng = jax.random.PRNGKey(0)
    vgg_params = jax.jit(vgg.init)(rng, jnp.zeros((1, S, S, 3)))
    batch = {
        k: (jax.tree.map(jnp.asarray, v) if isinstance(v, dict) else jnp.asarray(v))
        for k, v in synthetic_batch(2, obj_verts, image_size=S,
                                    camera="fxfy", with_masks=False).items()
    }

    def gkw_of(b_):
        flow = hand_recovery_flow(
            tables, mano_params, b_["imageA"], b_["imageB"], b_["manoA"],
            b_["manoB"], ccfg,
        )
        return generator_kwargs(flow, b_.get("maskA"), b_.get("maskB"), True)

    shapes = jax.eval_shape(gkw_of, batch)
    gkw = {k: (None if v is None else jnp.zeros(v.shape, v.dtype))
           for k, v in shapes.items()}
    state = init_state(rng, g, d, tcfg, gkw,
                       jnp.zeros((2, S, S, tcfg.d_input_nc)))
    step = jax.jit(
        make_train_step(g, d, vgg, vgg_params, tables, mano_params, ccfg, tcfg)
    )
    s1, m = step(state, batch, jnp.asarray(True))
    for k in ("loss_G", "loss_D", "g_rec", "g_tsf", "g_adv"):
        assert np.isfinite(float(m[k])), k
    assert not np.allclose(_first(s1.params_g), _first(state.params_g))
    assert not np.allclose(_first(s1.params_d), _first(state.params_d))


def test_wmean_weighted_losses_match_unweighted():
    """losses with w=ones == unweighted; padding rows with 0-weights leaves
    every loss unchanged (the eval-path partial-batch correction)."""
    from hoig_tpu.train.losses import wmean

    rng_ = np.random.RandomState(3)
    x = jnp.asarray(rng_.rand(3, 2, 5, 5).astype(np.float32))
    y = jnp.asarray(rng_.rand(3, 2, 5, 5).astype(np.float32))
    ones = jnp.ones((3,))
    np.testing.assert_allclose(float(wmean(x, ones)), float(jnp.mean(x)), rtol=1e-6)
    # pad with GARBAGE rows (stronger than replicas) + 0 weights
    xp = jnp.concatenate([x, x[:1] * 7.3 + 2], axis=0)
    yp = jnp.concatenate([y, y[:1] * -4.1], axis=0)
    w = jnp.asarray([1.0, 1.0, 1.0, 0.0])
    np.testing.assert_allclose(
        float(l1_loss(xp, yp, w=w)), float(l1_loss(x, y)), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(lsgan_loss(xp, 0.5, w=w)), float(lsgan_loss(x, 0.5)), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(tv_smooth_loss(xp, w=w)), float(tv_smooth_loss(x)), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(bce_loss(jnp.clip(xp, 1e-3, 1 - 1e-3), (yp > 0.5).astype(jnp.float32), w=w)),
        float(bce_loss(jnp.clip(x, 1e-3, 1 - 1e-3), (y > 0.5).astype(jnp.float32))),
        rtol=1e-5,
    )


def test_eval_metrics_pad_invariant(setup):
    """make_eval_metrics with 0-weighted pad replicas reports the SAME
    metrics as the unpadded batch — the eval path's partial-final-batch
    means are unbiased (VERDICT r3 weak #5 fix)."""
    from hoig_tpu.train.trainer import make_eval_metrics

    s = setup
    eval_fn = jax.jit(make_eval_metrics(
        s["g"], s["d"], s["vgg"], s["vgg_params"], s["tcfg"]
    ))
    batch = s["batch"]

    def flow_of(b_):
        return hand_recovery_flow(
            s["tables"], s["mano_params"], b_["imageA"], b_["imageB"],
            b_["manoA"], b_["manoB"], s["ccfg"],
        )

    flow = jax.jit(flow_of)(batch)
    pg, pd = s["state"].params_g, s["state"].params_d
    _, m0 = eval_fn(pg, pd, flow, batch, jnp.ones((2,)))
    # pad by replicating the last sample (what model_api.set_input does)
    pad = lambda x: jnp.concatenate([x, x[-1:]], axis=0)
    batch_p = jax.tree_util.tree_map(pad, batch)
    flow_p = jax.jit(flow_of)(batch_p)
    _, m1 = eval_fn(pg, pd, flow_p, batch_p, jnp.asarray([1.0, 1.0, 0.0]))
    for k in m0:
        np.testing.assert_allclose(
            float(m1[k]), float(m0[k]), rtol=2e-4, err_msg=k
        )
