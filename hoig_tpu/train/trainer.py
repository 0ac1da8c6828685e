"""GAN trainer: functional core + reference-API wrapper.

Capability parity with HOIG_HOv3/models/trainer.py:188-595 (`Trainer`):
LSGAN objective with target -1 for D-fake, L1 source reconstruction, VGG
perceptual transfer loss, BCE/MSE mask losses against the conditioning
masks, TV mask smoothness, per-net Adam(0.5, 0.999), G updated every step
and D every `train_G_every_n_iterations`, linear LR decay to final_lr.

TPU-first design: `make_train_step` returns ONE jit-compiled function that
fuses conditioning (stop-gradient), generator forward, both loss graphs and
both Adam updates into a single XLA program — the reference runs
conditioning under no_grad in Python, then two separate backward passes.
Whether D trains this step is a traced boolean implemented with a
zero-update mask (the reference's `find_unused_parameters=True` DDP crutch
is unnecessary: XLA sees the whole graph).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable

import flax
import jax
import jax.numpy as jnp
import optax

from hoig_tpu.geometry.conditioning import ConditioningConfig, hand_recovery_flow
from hoig_tpu.models import NetworksFactory
from hoig_tpu.models.vgg import Vgg19Features, vgg_perceptual_loss
from hoig_tpu.train.losses import (
    bce_loss,
    l1_loss,
    lsgan_loss,
    mse_loss,
    tv_smooth_loss,
)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Hyperparameters (defaults = reference options/train_options.py +
    scripts/train_hov3_ddp.sh)."""

    gen_name: str = "generator_spade_attn"
    use_spade: bool = True
    repeat_num: int = 6
    conv_dim: int = 64
    image_size: int = 256
    # dims (HOv3 spade config, trainer.py:260-267); DexYCB overrides
    bg_dim: int = 8
    img_dim: int = 3
    obj_dim: int = 3
    img_cond_dim: int = 3
    obj_cond_dim: int = 12
    d_input_nc: int = 19
    d_norm_type: str = "instance"
    use_armask: bool = True
    # optimization
    lr_G: float = 2e-4
    lr_D: float = 2e-4
    final_lr: float = 2e-6
    adam_b1: float = 0.5
    adam_b2: float = 0.999
    nepochs_decay: int = 15
    lambda_D_prob: float = 1.0
    lambda_rec: float = 10.0
    lambda_tsf: float = 10.0
    lambda_mask: float = 1.0
    lambda_mask_smooth: float = 1.0
    use_vgg: bool = True
    mask_bce: bool = True
    train_G_every_n_iterations: int = 1
    remat: bool = True
    # selective remat: keep bottleneck (1/8-res) activations, recompute only
    # the full-res encoder/decoder conv blocks — the bottleneck's activations
    # are 1/64 the pixels but >40% of the recompute FLOPs + the attention
    # gathers. False = faster, slightly more HBM.
    remat_bottleneck: bool = True
    # attention residuals (36 corner gathers/layer) dwarf conv activations;
    # kept independently rematerializable so fp32 can keep bottleneck conv
    # activations while still recomputing attention.
    remat_attn: bool = True
    # ExtractorAttn corner engine; "gather" is the measured production
    # path, "shift" kept for A/B benchmarking (generator.py engines)
    corner_engine: str = "gather"
    compute_dtype: Any = jnp.float32


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params_g: Any
    params_d: Any
    opt_g: Any
    opt_d: Any
    lr_g: jax.Array
    lr_d: jax.Array


def build_networks(cfg: TrainConfig):
    from hoig_tpu.models.layers import set_compute_dtype

    set_compute_dtype(
        cfg.compute_dtype if cfg.compute_dtype != jnp.float32 else None
    )
    g = NetworksFactory.get_by_name(
        cfg.gen_name,
        bg_dim=cfg.bg_dim,
        img_dim=cfg.img_dim,
        obj_dim=cfg.obj_dim,
        img_cond_dim=cfg.img_cond_dim if cfg.use_spade else 0,
        obj_cond_dim=cfg.obj_cond_dim if cfg.use_spade else 0,
        conv_dim=cfg.conv_dim,
        repeat_num=cfg.repeat_num,
        remat=cfg.remat,
        remat_bottleneck=cfg.remat_bottleneck,
        remat_attn=cfg.remat_attn,
        corner_engine=cfg.corner_engine,
    )
    d = NetworksFactory.get_by_name(
        "discriminator_patch_gan",
        input_nc=cfg.d_input_nc,
        norm_type=cfg.d_norm_type,
        ndf=64,
        n_layers=4,
        use_sigmoid=False,
    )
    return g, d


def _nhwc(x):
    return None if x is None else x.transpose(0, 2, 3, 1)


def generator_kwargs(flow: dict, armask_src, armask_tsf, use_spade: bool) -> dict:
    """Conditioning outputs (NCHW) -> Generator NHWC kwargs
    (reference forward split, trainer.py:379-399)."""
    if use_spade:
        return dict(
            bg_inputs=_nhwc(flow["input_G_src_bg"]),
            src_obj_inputs=_nhwc(flow["input_G_src_obj"][:, :3]),
            tsf_obj_inputs=_nhwc(flow["input_G_tsf_obj"][:, :3]),
            src_hand_inputs=_nhwc(flow["input_G_src_hand"][:, :3]),
            tsf_hand_inputs=_nhwc(flow["input_G_tsf_hand"][:, :3]),
            T=flow["T"],
            src_obj_conds=_nhwc(flow["input_G_src_obj"][:, 3:]),
            src_hand_conds=_nhwc(flow["input_G_src_hand"][:, 3:]),
            tsf_obj_conds=_nhwc(flow["input_G_tsf_obj"][:, 3:]),
            tsf_hand_conds=_nhwc(flow["input_G_tsf_hand"][:, 3:]),
            src_armask=_nhwc(armask_src),
            tsf_armask=_nhwc(armask_tsf),
        )
    return dict(
        bg_inputs=_nhwc(flow["input_G_src_bg"]),
        src_obj_inputs=_nhwc(flow["input_G_src_obj"]),
        tsf_obj_inputs=_nhwc(flow["input_G_tsf_obj"]),
        src_hand_inputs=_nhwc(flow["input_G_src_hand"]),
        tsf_hand_inputs=_nhwc(flow["input_G_tsf_hand"]),
        T=flow["T"],
        src_armask=_nhwc(armask_src),
        tsf_armask=_nhwc(armask_tsf),
    )


def composite(outs):
    """fake = mask_bg*bg + (1-mask_bg)*(obj*mask_hand + hand*(1-mask_hand))
    (trainer.py:400-401); returns (fake_src, fake_tsf, masks...)."""
    (src_bg, tsf_bg, src_obj, src_hand, src_mbg, src_mh,
     tsf_obj, tsf_hand, tsf_mbg, tsf_mh) = outs
    fake_src = src_mbg * src_bg + (1 - src_mbg) * (src_obj * src_mh + src_hand * (1 - src_mh))
    fake_tsf = tsf_mbg * tsf_bg + (1 - tsf_mbg) * (tsf_obj * tsf_mh + tsf_hand * (1 - tsf_mh))
    return fake_src, fake_tsf, src_mbg, src_mh, tsf_mbg, tsf_mh


def _forward_and_g_losses(
    g_model, d_model, vgg_loss, tcfg: TrainConfig, params_g, params_d, flow,
    batch, valid=None,
):
    """Generator forward + the full G-side loss graph.

    ONE implementation shared by the train step and the eval-metrics path
    so the validation scalars can never drift from the trained objective
    (reference trainer.py:437-486 semantics).

    valid: optional per-sample weights (B,); the eval path passes 0 for
    pad-replica samples so a padded partial batch's metric means only
    average the real samples (losses.wmean). Training passes None — the
    graph is byte-identical to the unweighted form.

    Returns (fakes, total, parts, d_fake_map) where fakes =
    (fake_src, fake_tsf, src_mbg, src_mh, tsf_mbg, tsf_mh).
    """
    mask_crt = bce_loss if tcfg.mask_bce else mse_loss
    armask_src = batch.get("maskA") if tcfg.use_armask else None
    armask_tsf = batch.get("maskB") if tcfg.use_armask else None
    kwargs = generator_kwargs(flow, armask_src, armask_tsf, tcfg.use_spade)
    outs = g_model.apply(params_g, **kwargs)
    # losses always in f32 regardless of the conv compute dtype
    outs = jax.tree.map(lambda o: o.astype(jnp.float32), outs)
    fakes = composite(outs)
    fake_src, fake_tsf, src_mbg, src_mh, tsf_mbg, tsf_mh = fakes

    real_src = _nhwc(batch["imageA"])
    real_tsf = _nhwc(batch["imageB"])

    d_in_fake = jnp.concatenate([fake_tsf, _d_cond(flow, armask_tsf)], axis=-1)
    d_fake = d_model.apply(params_d, d_in_fake)

    loss_adv = lsgan_loss(d_fake, 0.0, w=valid) * tcfg.lambda_D_prob
    loss_rec = l1_loss(fake_src, real_src, w=valid) * tcfg.lambda_rec
    if tcfg.use_vgg:
        loss_tsf = vgg_loss(fake_tsf, real_tsf, valid) * tcfg.lambda_tsf
    else:
        loss_tsf = l1_loss(fake_tsf, real_tsf, w=valid) * tcfg.lambda_tsf

    masks_bg = jnp.concatenate([src_mbg, tsf_mbg], axis=0)
    masks_hand = jnp.concatenate([src_mh, tsf_mh], axis=0)
    tgt_bg = jnp.concatenate(
        [_nhwc(flow["src_crop_mask_bg"]), _nhwc(flow["tsf_crop_mask_bg"])], axis=0
    )
    tgt_hand = jnp.concatenate(
        [_nhwc(flow["src_crop_mask_hand"]), _nhwc(flow["tsf_crop_mask_hand"])],
        axis=0,
    )
    # src/tsf mask maps are stacked along batch: tile the weights to match
    valid2 = None if valid is None else jnp.concatenate([valid, valid])
    loss_mask = (
        mask_crt(masks_bg, jax.lax.stop_gradient(tgt_bg), w=valid2)
        + mask_crt(masks_hand, jax.lax.stop_gradient(tgt_hand), w=valid2)
    ) * tcfg.lambda_mask
    loss_mask_smooth = (
        tv_smooth_loss(masks_bg, w=valid2) + tv_smooth_loss(masks_hand, w=valid2)
    ) * tcfg.lambda_mask_smooth

    total = loss_adv + loss_rec + loss_tsf + loss_mask + loss_mask_smooth
    parts = {
        "g_adv": loss_adv,
        "g_rec": loss_rec,
        "g_tsf": loss_tsf,
        "g_mask": loss_mask,
        "g_mask_smooth": loss_mask_smooth,
    }
    return fakes, total, parts, d_fake


def _d_cond(flow: dict, armask_tsf) -> jax.Array:
    """D conditioning channels: tsf obj cond ++ tsf hand cond ++ armask
    (trainer.py:437,460-462), NHWC."""
    parts = [_nhwc(flow["input_G_tsf_obj"][:, 3:]), _nhwc(flow["input_G_tsf_hand"][:, 3:])]
    if armask_tsf is not None:
        parts.append(_nhwc(armask_tsf))
    return jnp.concatenate(parts, axis=-1)


def make_train_step(
    g_model,
    d_model,
    vgg_model,
    vgg_params,
    tables: dict,
    mano_params: dict,
    ccfg: ConditioningConfig,
    tcfg: TrainConfig,
) -> Callable:
    """Returns train_step(state, batch, d_trainable) -> (state, metrics).

    batch: dict with imageA/imageB (B,3,S,S) in [-1,1], optional
    maskA/maskB (B,1,S,S), manoA/manoB theta dicts (see
    conditioning.get_details).
    """
    opt_g = optax.adam(_lr_placeholder, b1=tcfg.adam_b1, b2=tcfg.adam_b2)
    opt_d = optax.adam(_lr_placeholder, b1=tcfg.adam_b1, b2=tcfg.adam_b2)

    vgg_loss_ckpt = jax.checkpoint(
        lambda vp, x, y, w=None: vgg_perceptual_loss(vgg_model, vp, x, y, w)
    )

    def g_loss_fn(params_g, params_d, flow, batch, vgg_p):
        fakes, total, parts, _ = _forward_and_g_losses(
            g_model, d_model,
            lambda x, y, w=None: vgg_loss_ckpt(vgg_p, x, y, w),
            tcfg, params_g, params_d, flow, batch,
        )
        return total, dict(parts, fake_tsf=fakes[1])

    def d_loss_fn(params_d, flow, batch, fake_tsf):
        armask_tsf = batch.get("maskB") if tcfg.use_armask else None
        cond = _d_cond(flow, armask_tsf)
        real_tsf = _nhwc(batch["imageB"])
        d_real = d_model.apply(params_d, jnp.concatenate([real_tsf, cond], axis=-1))
        d_fake = d_model.apply(
            params_d,
            jnp.concatenate([jax.lax.stop_gradient(fake_tsf), cond], axis=-1),
        )
        loss = (
            lsgan_loss(d_real, 1.0) + lsgan_loss(d_fake, -1.0)
        ) * tcfg.lambda_D_prob
        return loss, {"d_real": jnp.mean(d_real), "d_fake": jnp.mean(d_fake)}

    def train_step(state: TrainState, batch: dict, d_trainable, frozen=None):
        # `frozen` carries the constant data (VGG weights ~60 MB, surface
        # tables, MANO params) as RUNTIME ARGUMENTS. When omitted, the
        # make-time values are closure-captured instead and get baked into
        # the lowered module as dense constants — measured 60.7 MB of MLIR
        # for the flagship step, which the remote compile helper was
        # OOM-killed on (SIGKILL, HTTP 500). Production callers
        # (DataParallel(frozen=...), bench.py, profile_step.py) always
        # pass it; the closure fallback keeps small-config tests simple.
        if frozen is None:
            frozen = dict(
                vgg_params=vgg_params, tables=tables, mano_params=mano_params
            )
        flow = jax.lax.stop_gradient(
            hand_recovery_flow(
                frozen["tables"],
                frozen["mano_params"],
                batch["imageA"],
                batch["imageB"],
                batch["manoA"],
                batch["manoB"],
                ccfg,
            )
        )
        (loss_g, aux), grads_g = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.params_g, state.params_d, flow, batch,
            frozen["vgg_params"],
        )
        updates_g, new_opt_g = opt_g.update(grads_g, state.opt_g, state.params_g)
        updates_g = jax.tree.map(lambda u: u * state.lr_g, updates_g)
        params_g = optax.apply_updates(state.params_g, updates_g)

        (loss_d, d_aux), grads_d = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.params_d, flow, batch, aux["fake_tsf"]
        )
        d_gate = jnp.asarray(d_trainable, jnp.float32)
        updates_d, new_opt_d_live = opt_d.update(grads_d, state.opt_d, state.params_d)
        # zero-mask both the param update and the optimizer-state advance so
        # a gated step leaves D exactly untouched (reference trains D only
        # every n iterations, trainer.py:429-434)
        updates_d = jax.tree.map(lambda u: u * state.lr_d * d_gate, updates_d)
        new_opt_d = jax.tree.map(
            lambda new, old: jnp.asarray(new) * d_gate + jnp.asarray(old) * (1 - d_gate)
            if jnp.asarray(new).dtype != jnp.int32
            else jnp.where(d_gate > 0, jnp.asarray(new), jnp.asarray(old)),
            new_opt_d_live,
            state.opt_d,
        )
        params_d = optax.apply_updates(state.params_d, updates_d)

        metrics = {
            "loss_G": loss_g,
            "loss_D": loss_d,
            "g_adv": aux["g_adv"],
            "g_rec": aux["g_rec"],
            "g_tsf": aux["g_tsf"],
            "g_mask": aux["g_mask"],
            "g_mask_smooth": aux["g_mask_smooth"],
            **d_aux,
        }
        new_state = state.replace(
            step=state.step + 1,
            params_g=params_g,
            params_d=params_d,
            opt_g=new_opt_g,
            opt_d=new_opt_d,
        )
        return new_state, metrics

    return train_step


def make_g_grads_fn(
    g_model,
    d_model,
    vgg_model,
    vgg_params,
    tables: dict,
    mano_params: dict,
    ccfg: ConditioningConfig,
    tcfg: TrainConfig,
) -> Callable:
    """grads_fn(params_g, params_d, batch) -> grads of the G loss.

    The raw gradient tree is exactly the quantity the data mesh
    all-reduces, BEFORE Adam's step-1 sign amplification (m/sqrt(v) of a
    fresh state is +-1 for ANY nonzero gradient, so post-update params
    magnify reduction-order noise of near-zero gradients into +-2*lr
    deltas). Sharding-equivalence tests compare this tree instead
    (tests/test_flagship_mesh.py)."""
    vgg_loss_ckpt = jax.checkpoint(
        lambda vp, x, y, w=None: vgg_perceptual_loss(vgg_model, vp, x, y, w)
    )

    def g_loss(params_g, params_d, flow, batch, vgg_p):
        _, total, _, _ = _forward_and_g_losses(
            g_model, d_model,
            lambda x, y, w=None: vgg_loss_ckpt(vgg_p, x, y, w),
            tcfg, params_g, params_d, flow, batch,
        )
        return total

    def grads_fn(params_g, params_d, batch, frozen=None):
        if frozen is None:
            frozen = dict(
                vgg_params=vgg_params, tables=tables, mano_params=mano_params
            )
        flow = jax.lax.stop_gradient(
            hand_recovery_flow(
                frozen["tables"], frozen["mano_params"], batch["imageA"],
                batch["imageB"], batch["manoA"], batch["manoB"], ccfg,
            )
        )
        return jax.grad(g_loss)(
            params_g, params_d, flow, batch, frozen["vgg_params"]
        )

    return grads_fn


def make_eval_metrics(g_model, d_model, vgg_model, vgg_params, tcfg: TrainConfig):
    """Returns eval_fn(params_g, params_d, flow, batch) -> (fakes, metrics).

    The SAME loss graph as the train step (shared `_forward_and_g_losses`),
    evaluated without gradients or optimizer updates, so the validation
    loop logs *current* losses that cannot drift from the trained
    objective. (The reference's val loop logs stale train errors because
    its forward computes none, HOIG_HOv3/models/trainer.py:373-415 —
    knowingly fixed.)
    fakes = (fake_src, fake_tsf, src_mbg, src_mh, tsf_mbg, tsf_mh).
    """

    def eval_fn(params_g, params_d, flow, batch, valid=None, vgg_p=None):
        # vgg_p: pass the VGG weights as a runtime argument to keep them
        # out of the lowered module (see make_train_step's `frozen`)
        vp = vgg_params if vgg_p is None else vgg_p
        fakes, _, parts, d_fake = _forward_and_g_losses(
            g_model, d_model,
            lambda x, y, w=None: vgg_perceptual_loss(vgg_model, vp, x, y, w),
            tcfg, params_g, params_d, flow, batch, valid=valid,
        )
        armask_tsf = batch.get("maskB") if tcfg.use_armask else None
        d_real = d_model.apply(
            params_d,
            jnp.concatenate(
                [_nhwc(batch["imageB"]), _d_cond(flow, armask_tsf)], axis=-1
            ),
        )
        from hoig_tpu.train.losses import wmean

        metrics = dict(
            parts, d_real=wmean(d_real, valid), d_fake=wmean(d_fake, valid)
        )
        return fakes, metrics

    return eval_fn


# Adam is built with unit LR; the actual LR multiplies the updates so it can
# live in TrainState (traced) and follow the reference's per-epoch decay
# without recompiling.
_lr_placeholder = 1.0


def init_state(
    rng: jax.Array, g_model, d_model, tcfg: TrainConfig, sample_g_kwargs, sample_d_in
) -> TrainState:
    rg, rd = jax.random.split(rng)
    # jit the flax inits: one compile each instead of an eager-op storm
    params_g = jax.jit(lambda r, kw: g_model.init(r, **kw))(rg, sample_g_kwargs)
    params_d = jax.jit(d_model.init)(rd, sample_d_in)
    opt = optax.adam(_lr_placeholder, b1=tcfg.adam_b1, b2=tcfg.adam_b2)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params_g=params_g,
        params_d=params_d,
        opt_g=opt.init(params_g),
        opt_d=opt.init(params_d),
        lr_g=jnp.asarray(tcfg.lr_G, jnp.float32),
        lr_d=jnp.asarray(tcfg.lr_D, jnp.float32),
    )


def decay_lr(state: TrainState, tcfg: TrainConfig) -> TrainState:
    """Linear per-epoch decay (trainer.py:576-591): lr -= (lr0-final)/n."""
    dg = (tcfg.lr_G - tcfg.final_lr) / tcfg.nepochs_decay
    dd = (tcfg.lr_D - tcfg.final_lr) / tcfg.nepochs_decay
    return state.replace(lr_g=state.lr_g - dg, lr_d=state.lr_d - dd)
