"""Reference Trainer-API facade over the functional core.

Capability parity with the reference `ModelsFactory` / `Trainer` surface
(models/__init__.py:5-15, models/trainer.py:188-595): set_input / forward /
optimize_parameters / save / load / update_learning_rate /
get_current_{errors,visuals,scalars} / set_train / set_eval — so the entry
points (train.py / eval.py) read like the reference's.

Underneath: one jit-compiled conditioning+GAN step on a data-parallel mesh.
"""

from __future__ import annotations

import functools
import os
from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np

from hoig_tpu.geometry.conditioning import hand_recovery_flow
from hoig_tpu.models.vgg import Vgg19Features, load_torch_weights
from hoig_tpu.parallel import DataParallel, make_data_mesh
from hoig_tpu.train import checkpoints as ckpt
from hoig_tpu.train.environment import build_environment, train_config_from_opt
from hoig_tpu.train.trainer import (
    build_networks,
    composite,
    decay_lr,
    generator_kwargs,
    init_state,
    make_eval_metrics,
    make_train_step,
)
from hoig_tpu.utils.util import Colorize, tensor2im, tensor2maskim


class ModelsFactory:
    @staticmethod
    def get_by_name(model_name: str, opt, use_ddp: bool = False, env=None):
        if model_name == "trainer":
            return HOIGModel(opt, use_ddp=use_ddp, env=env)
        raise ValueError(f"Model {model_name} not recognized.")


def _device_batch(batch: dict) -> dict:
    # host-side numpy: placement happens at use time (DataParallel
    # device_puts single-process; multi-host assembles global arrays from
    # per-process shards, mesh.py shard_batch)
    keep = {"imageA", "imageB", "maskA", "maskB", "manoA", "manoB"}
    out = {}
    for k, v in batch.items():
        if k not in keep:
            continue
        out[k] = (
            {kk: np.asarray(vv) for kk, vv in v.items() if not isinstance(vv, list)}
            if isinstance(v, dict)
            else np.asarray(v)
        )
    return out


class HOIGModel:
    """GAN trainer with the reference's method surface."""

    def __init__(self, opt, use_ddp: bool = False, env=None):
        self._opt = opt
        self._name = "Trainer"
        self._is_train = getattr(opt, "is_train", False)
        self._save_dir = os.path.join(opt.checkpoints_dir, opt.name)

        self._env = env or build_environment(opt)
        self._tcfg = train_config_from_opt(opt)
        self._ccfg = self._env["ccfg"]
        tables, mano_params = self._env["tables"], self._env["mano_params"]

        self._G, self._D = build_networks(self._tcfg)
        self._vgg = Vgg19Features()
        rng = jax.random.PRNGKey(8)  # reference setup_seed(8), train.py:153
        s = opt.image_size
        self._vgg_params = self._vgg.init(rng, jnp.zeros((1, s, s, 3)))
        vgg_path = getattr(opt, "vgg_weights", None)
        synthetic = (getattr(opt, "synthetic_data", False)
                     or opt.dataset_mode == "synthetic")
        if vgg_path and os.path.exists(vgg_path):
            self._vgg_params = load_torch_weights(
                self._vgg_params, _load_state_dict(vgg_path)
            )
            print(f"loaded vgg19 weights from {vgg_path}")
        elif self._tcfg.use_vgg and self._is_train and not synthetic:
            # training a REAL dataset against random VGG features silently
            # diverges from the reference objective — refuse (a synthetic
            # smoke run may proceed with the deterministic random init)
            raise RuntimeError(
                "--use_vgg training requires pretrained VGG19 features: "
                f"--vgg_weights {vgg_path or '<path>'} "
                + ("not found" if vgg_path else "not given")
                + ". Convert the torchvision checkpoint first:\n"
                "  python scripts/convert_weights.py vgg19 <vgg19.pth> "
                "assets/weights/vgg19.npz\n"
                "(or pass --dataset_mode synthetic for a smoke run)"
            )
        elif vgg_path:
            print(f"[warn] --vgg_weights {vgg_path} not found — "
                  "random-feature perceptual loss (synthetic/eval mode)")
        elif self._tcfg.use_vgg:
            print("[warn] --use_vgg without --vgg_weights: random-feature "
                  "perceptual loss (deterministic init)")

        # init network params: infer generator input shapes WITHOUT running
        # the conditioning stage (jax.eval_shape), then one jitted init —
        # eager-op dispatch is expensive on this platform (remote compiles)
        from hoig_tpu.parallel import num_data_devices, per_process_batch_size

        b = max(1, per_process_batch_size(opt))
        dummy = _dummy_batch(b, s, self._ccfg, self._env, self._tcfg)

        def _gkw_of(batch):
            flow = hand_recovery_flow(
                tables, mano_params, batch["imageA"], batch["imageB"],
                batch["manoA"], batch["manoB"], self._ccfg,
            )
            return generator_kwargs(
                flow, batch.get("maskA"), batch.get("maskB"), self._tcfg.use_spade
            )

        gkw_shapes = jax.eval_shape(_gkw_of, dummy)
        gkw = {
            k: (None if v is None else jnp.zeros(v.shape, v.dtype))
            for k, v in gkw_shapes.items()
        }
        self._state = init_state(
            rng, self._G, self._D, self._tcfg, gkw,
            jnp.zeros((b, s, s, self._tcfg.d_input_nc)),
        )

        step_fn = make_train_step(
            self._G, self._D, self._vgg, self._vgg_params, tables, mano_params,
            self._ccfg, self._tcfg,
        )
        # the data mesh must divide the per-process batch. During training
        # per_process_batch_size guarantees b = batch_size * n_use by
        # construction; anything else is a config error, not something to
        # silently shrink around.
        devices = jax.local_devices()
        n_use = num_data_devices(opt) if self._is_train else max(
            n for n in range(1, len(devices) + 1) if b % n == 0
        )
        if b % n_use != 0:
            raise ValueError(
                f"per-process batch {b} not divisible by {n_use} data devices"
            )
        if self._is_train and jax.process_count() > 1:
            # multi-host: the train-step mesh spans EVERY device of every
            # process so the gradient all-reduce crosses hosts (reference
            # DDP trains over all GPUs of all nodes, train_ddp.py:28-29);
            # each process feeds its ShardedSampler shard of the global
            # batch (mesh.py shard_batch)
            train_mesh = make_data_mesh(jax.devices())
        else:
            train_mesh = make_data_mesh(devices[:n_use])
        # frozen constant data (VGG weights ~60 MB, tables, MANO) rides as
        # a replicated runtime argument instead of being baked into the
        # lowered module (trainer.make_train_step docstring)
        self._frozen = dict(
            vgg_params=self._vgg_params, tables=tables, mano_params=mano_params
        )
        self._dp = DataParallel(step_fn, train_mesh, frozen=self._frozen)
        self._state = self._dp.replicate(self._state)

        # the no-update forward/eval paths run on the LOCAL data mesh (the
        # validation loader feeds the device-scaled per-process batch;
        # concentrating it on one chip would 4x the val latency/memory on a
        # 4-chip host). Under multi-host this is rank-local validation —
        # the reference's val loop likewise logs rank-0's local errors
        # (train_ddp.py:126-162).
        from jax.sharding import NamedSharding, PartitionSpec as P

        self._eval_mesh = make_data_mesh(devices[:n_use])
        repl = NamedSharding(self._eval_mesh, P())
        shard = NamedSharding(self._eval_mesh, P("data"))
        self._eval_repl = repl
        self._eval_shard = shard
        # tables/mano/VGG enter these programs as replicated runtime args
        # too (same 60 MB-constants rationale as the train step)
        self._eval_tables = jax.device_put(
            dict(tables=tables, mano_params=mano_params), repl
        )
        self._eval_vgg = jax.device_put(self._vgg_params, repl)
        self._flow_fn = jax.jit(
            functools.partial(_flow_only, ccfg=self._ccfg),
            in_shardings=(shard, repl),
            out_shardings=shard,
        )
        self._fwd_fn = jax.jit(
            functools.partial(_forward_only, model=self._G, tcfg=self._tcfg),
            in_shardings=(repl, shard, shard),
            out_shardings=shard,
        )
        self._eval_fn = jax.jit(
            make_eval_metrics(
                self._G, self._D, self._vgg, self._vgg_params, self._tcfg
            ),
            in_shardings=(repl, repl, shard, shard, shard, repl),
            out_shardings=(shard, repl),
        )

        if self._dp._multihost:
            from hoig_tpu.parallel import coordination_barrier

            # (1) absorb the per-rank init-compile skew at the coordination
            # service (NOT a device collective), then create the cross-host
            # communicator contexts with a trivial psum while every rank is
            # in lockstep — their first-collective handshake deadline is
            # short (~30s) and a rank still compiling would blow it.
            coordination_barrier("hoig_model_init")
            tiny = jax.make_array_from_process_local_data(
                NamedSharding(self._dp.mesh, P("data")),
                np.ones((jax.local_device_count(), 1), np.float32),
            )
            jax.block_until_ready(
                jax.jit(
                    jnp.sum, out_shardings=NamedSharding(self._dp.mesh, P())
                )(tiny)
            )
            # (2) compile the rank-local eval/visual graphs NOW, on every
            # rank symmetrically: a mid-epoch compile on the primary alone
            # would stall the other ranks inside a collective past the
            # communicator deadline (and compiling everything up front is
            # the right TPU posture anyway).
            self._batch, self._real_bs = dummy, b
            self._valid_np = np.ones((b,), np.float32)
            self.forward(keep_data_for_visuals=False, compute_losses=True)
            self.forward(keep_data_for_visuals=False, compute_losses=False)
            self._batch = None
            coordination_barrier("hoig_model_ready")

        # load networks (reference __init__ tail, trainer.py:206-210)
        if getattr(opt, "load_path", None) not in (None, "None"):
            self._state = self._state.replace(
                params_g=ckpt.load_generator_params(
                    self._state.params_g, opt.load_path, tcfg=self._tcfg
                )
            )
        elif (not self._is_train) or getattr(opt, "load_epoch", 0) > 0:
            if opt.load_epoch > 0:
                self.load()

        self.colorize = Colorize(16)
        self._errors = OrderedDict()
        self._visuals_cache = {}
        self._batch = None
        self._flow = None
        self._real_bs = 0
        self._valid_np = np.ones((0,), np.float32)

    # ------------------------------------------------------------- reference API
    @property
    def is_train(self):
        return self._is_train

    def set_train(self):
        self._is_train = True

    def set_eval(self):
        self._is_train = False

    def set_input(self, batch: dict):
        self._batch = _device_batch(batch)
        self._flow = None  # conditioning is fused into the train step
        # eval/val loaders run with drop_last=False; a final partial batch
        # would violate the P("data") in_shardings on a multi-device mesh.
        # Pad by replicating the last sample and slice outputs back to the
        # real size; the pad replicas get 0 weight in the eval metric
        # reductions (losses.wmean) so they never bias the means.
        bs = int(jax.tree_util.tree_leaves(self._batch)[0].shape[0])
        n = self._eval_mesh.size
        self._real_bs = bs
        self._valid_np = np.ones((bs,), np.float32)
        if bs % n != 0:
            pad = n - bs % n
            rep = lambda x: np.concatenate(
                [x] + [x[-1:]] * pad, axis=0
            )
            self._batch = jax.tree_util.tree_map(rep, self._batch)
            self._valid_np = np.concatenate(
                [self._valid_np, np.zeros((pad,), np.float32)]
            )

    def forward(self, keep_data_for_visuals: bool = False, return_estimates: bool = False,
                compute_losses: bool = True):
        """Eval-path generation (no parameter update).

        Also computes the real eval losses so the validation scalars are
        truthful (the reference's forward computes none and its val loop
        logs stale train errors, trainer.py:373-415 — knowingly fixed;
        pass compute_losses=False for the reference's cheaper behavior)."""
        params_g, params_d = self._localized_params()
        batch = self._batch
        valid = self._valid_np
        if self._dp._multihost:
            # multi-process jit refuses numpy args with non-trivial
            # shardings (it cannot know they are host-local); place the
            # batch on the rank-local eval mesh explicitly
            batch = jax.device_put(batch, self._eval_shard)
            valid = jax.device_put(valid, self._eval_shard)
        self._flow = self._flow_fn(batch, self._eval_tables)
        if compute_losses:
            fakes, metrics = self._eval_fn(
                params_g, params_d, self._flow, batch, valid, self._eval_vgg
            )
            self._errors = metrics
        else:
            fakes = self._fwd_fn(params_g, self._flow, batch)
        if self._real_bs != jax.tree_util.tree_leaves(self._batch)[0].shape[0]:
            fakes = tuple(f[: self._real_bs] for f in fakes)
        fake_src, fake_tsf, src_mbg, src_mh, tsf_mbg, tsf_mh = fakes
        if keep_data_for_visuals:
            self._keep_visuals(fake_src, fake_tsf, tsf_mbg, tsf_mh)
        return fakes

    def optimize_parameters(self, trainable: bool = True, keep_data_for_visuals: bool = False):
        if not self._is_train:
            return
        self._state, metrics = self._dp.step(
            self._state, self._batch, jnp.asarray(bool(trainable))
        )
        self._errors = metrics
        if keep_data_for_visuals:
            # keep the train-step losses in _errors (forward would
            # recompute them from the already-updated params)
            self.forward(keep_data_for_visuals=True, compute_losses=False)

    def get_current_errors(self) -> OrderedDict:
        keys = ["g_rec", "g_tsf", "g_adv", "g_mask", "g_mask_smooth", "d_real", "d_fake"]
        return OrderedDict(
            (k, float(self._errors.get(k, 0.0))) for k in keys
        )

    def get_current_scalars(self) -> OrderedDict:
        return OrderedDict(
            [("lr_G", float(self._state.lr_g)), ("lr_D", float(self._state.lr_d))]
        )

    def get_current_visuals(self) -> OrderedDict:
        return OrderedDict(self._visuals_cache)

    def save(self, label):
        ckpt.save_checkpoint(self._save_dir, label, self._state)

    def load(self):
        self._state = ckpt.load_checkpoint(
            self._save_dir, self._opt.load_epoch, self._state,
            load_optimizers=self._is_train,
        )

    def update_learning_rate(self):
        old = float(self._state.lr_g)
        self._state = decay_lr(self._state, self._tcfg)
        print(f"update G learning rate: {old:f} -> {float(self._state.lr_g):f}")
        print(f"update D learning rate: {old:f} -> {float(self._state.lr_d):f}")

    # ------------------------------------------------------------------ helpers
    def _localized_params(self):
        """Params live on the (possibly multi-host) train mesh; the eval
        paths run on the local mesh — copy the replicated values over
        (no-op in single-process runs). Memoized per TrainState: a
        validation loop converts once, not per batch."""
        if not self._dp._multihost:
            return self._state.params_g, self._state.params_d
        if getattr(self, "_localize_src", None) is not self._state:
            self._localize_src = self._state  # strong ref: identity stays valid
            self._localize_val = jax.device_put(
                (jax.tree.map(np.asarray, self._state.params_g),
                 jax.tree.map(np.asarray, self._state.params_d)),
                self._eval_repl,
            )
        return self._localize_val

    def _keep_visuals(self, fake_src, fake_tsf, tsf_mbg, tsf_mh):
        tochw = lambda x: np.asarray(x).transpose(0, 3, 1, 2)
        # slice any pad replicas so every visual grid tiles the same count
        sl = lambda t: jax.tree_util.tree_map(
            lambda x: x[: self._real_bs], t
        )
        batch = sl(self._batch)
        vis = OrderedDict()
        vis["1_real_img"] = tensor2im(np.asarray(batch["imageA"]))
        flow = sl(self._flow)
        vis["2_input_src_obj"] = tensor2im(np.asarray(flow["input_G_src_obj"][:, :3]))
        vis["2_input_src_hand"] = tensor2im(np.asarray(flow["input_G_src_hand"][:, :3]))
        vis["2_input_tsf_obj"] = tensor2im(np.asarray(flow["input_G_tsf_obj"][:, :3]))
        vis["2_input_tsf_hand"] = tensor2im(np.asarray(flow["input_G_tsf_hand"][:, :3]))
        vis["10_fake_tsf"] = tensor2im(tochw(fake_tsf))
        vis["11_fake_src"] = tensor2im(tochw(fake_src))
        vis["12_fake_mask_bg"] = tensor2maskim(tochw(tsf_mbg))
        vis["13_fake_mask_hand"] = tensor2maskim(tochw(tsf_mh))
        vis["14_batch_real_img"] = tensor2im(np.asarray(batch["imageB"]), idx=-1)
        vis["15_batch_fake_img"] = tensor2im(tochw(fake_tsf), idx=-1)
        vis["16_batch_src_img"] = tensor2im(np.asarray(batch["imageA"]), idx=-1)
        self._visuals_cache = vis


def _flow_only(batch, frozen, ccfg):
    return hand_recovery_flow(
        frozen["tables"], frozen["mano_params"], batch["imageA"],
        batch["imageB"], batch["manoA"], batch["manoB"], ccfg,
    )


def _forward_only(params_g, flow, batch, model, tcfg):
    kwargs = generator_kwargs(
        flow,
        batch.get("maskA") if tcfg.use_armask else None,
        batch.get("maskB") if tcfg.use_armask else None,
        tcfg.use_spade,
    )
    return composite(model.apply(params_g, **kwargs))


def _dummy_batch(b, s, ccfg, env, tcfg):
    from hoig_tpu.data.synthetic import synthetic_theta

    tables_np = env["tables_np"]
    n_obj = tables_np.faces.shape[0]
    v_obj = int(tables_np.num_verts.max()) - 778
    rng = np.random.RandomState(0)
    mk = lambda seed: {
        k: jnp.asarray(v)
        for k, v in synthetic_theta(
            b, [rng.randn(v_obj, 3).astype(np.float32) * 0.05],
            seed=seed,
            camera="fxfy" if ccfg.camera_model == "fxfy" else "matrix",
            image_size=s,
        ).items()
    }
    ta, tb = mk(1), mk(2)
    if ccfg.camera_model == "fxfy":
        # DexYCB: pose carries translation, no handtrans key
        for t in (ta, tb):
            t["pose"] = jnp.concatenate([t["pose"], t.pop("handtrans")], axis=1)
    batch = dict(
        imageA=jnp.zeros((b, 3, s, s)),
        imageB=jnp.zeros((b, 3, s, s)),
        manoA=ta,
        manoB=tb,
    )
    if tcfg.use_armask:
        batch["maskA"] = jnp.zeros((b, 1, s, s))
        batch["maskB"] = jnp.zeros((b, 1, s, s))
    return batch


def _load_state_dict(path: str):
    if path.endswith(".npz"):
        return dict(np.load(path))
    import torch

    return torch.load(path, map_location="cpu")
