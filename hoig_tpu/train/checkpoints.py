"""Checkpoint save/load with the reference's directory naming contract.

Capability parity with HOIG_HOv3/models/base_model.py:78-124: files are
`net_epoch_{E}_id_{G|D}` and `opt_epoch_{E}_id_{G|D}` under
checkpoints_dir/name, so the reference's auto-resume scan
(options/base_options.py:95-113, `startswith("net_epoch_")`, epoch =
int(name.split('_')[2])) keeps working unchanged. Payload is flax msgpack
(.ckpt) instead of torch pickles.
"""

from __future__ import annotations

import os
import re

import flax.serialization
import jax
import numpy as np


def _path(save_dir: str, kind: str, epoch, label: str) -> str:
    return os.path.join(save_dir, f"{kind}_epoch_{epoch}_id_{label}.ckpt")


def save_tree(tree, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    host = jax.tree.map(np.asarray, tree)
    with open(path, "wb") as fp:
        fp.write(flax.serialization.to_bytes(host))


def _strip_remat_prefix(tree):
    """Normalize module keys written by older nn.remat-wrapped models
    ('CheckpointConvINReLU_0' -> 'ConvINReLU_0'). The analog of the
    reference's `module.`-prefix stripping on load (base_model.py:104-122):
    a wrapper must not make checkpoints non-portable."""
    if not isinstance(tree, dict):
        return tree
    return {
        (k[len("Checkpoint"):] if isinstance(k, str) and k.startswith("Checkpoint")
         else k): _strip_remat_prefix(v)
        for k, v in tree.items()
    }


def load_tree(template, path: str):
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"Weights file not found. Have you trained a model!? {path}"
        )
    with open(path, "rb") as fp:
        raw = flax.serialization.msgpack_restore(fp.read())
    return flax.serialization.from_state_dict(template, _strip_remat_prefix(raw))


def save_checkpoint(save_dir: str, epoch, state) -> None:
    """Write net/opt files for G and D at `epoch` (may be 'latest')."""
    save_tree(state.params_g, _path(save_dir, "net", epoch, "G"))
    save_tree(state.params_d, _path(save_dir, "net", epoch, "D"))
    save_tree(
        {"opt": state.opt_g, "lr": state.lr_g, "step": state.step},
        _path(save_dir, "opt", epoch, "G"),
    )
    save_tree(
        {"opt": state.opt_d, "lr": state.lr_d}, _path(save_dir, "opt", epoch, "D")
    )


def load_checkpoint(save_dir: str, epoch, state, load_optimizers: bool = True):
    """Restore a TrainState saved by save_checkpoint."""
    params_g = load_tree(state.params_g, _path(save_dir, "net", epoch, "G"))
    state = state.replace(params_g=params_g)
    if load_optimizers:
        params_d = load_tree(state.params_d, _path(save_dir, "net", epoch, "D"))
        og = load_tree(
            {"opt": state.opt_g, "lr": state.lr_g, "step": state.step},
            _path(save_dir, "opt", epoch, "G"),
        )
        od = load_tree(
            {"opt": state.opt_d, "lr": state.lr_d}, _path(save_dir, "opt", epoch, "D")
        )
        state = state.replace(
            params_d=params_d,
            opt_g=og["opt"],
            lr_g=og["lr"],
            step=og["step"],
            opt_d=od["opt"],
            lr_d=od["lr"],
        )
    return state


def load_generator_params(params_template, load_path: str, tcfg=None):
    """--load_path eval-style G-only restore (trainer.py:206-208).

    Accepts either this framework's flax msgpack .ckpt or a REFERENCE torch
    checkpoint (`net_epoch_*_id_G.pth`, or an .npz dump of its state dict
    made by scripts/convert_weights.py generator) — the latter is converted
    on the fly via models.torch_port, unlocking eval against
    reference-trained weights."""
    if load_path.endswith((".pth", ".pt", ".npz")):
        from hoig_tpu.models.torch_port import generator_params_from_torch

        if tcfg is None:
            raise ValueError(
                "loading a torch checkpoint requires the TrainConfig "
                "(for the generator architecture layout)"
            )
        if load_path.endswith(".npz"):
            state = dict(np.load(load_path))
        else:
            import torch

            state = torch.load(load_path, map_location="cpu",
                               weights_only=False)
            state = {k: v.detach().cpu().numpy() for k, v in state.items()}
        return generator_params_from_torch(params_template, state, tcfg)
    return load_tree(params_template, load_path)


def scan_latest_epoch(save_dir: str) -> int:
    """Auto-resume scan (base_options.py:95-113).

    Only epochs whose COMPLETE file set (net+opt x G+D) is present count:
    a run killed mid-save leaves a torn epoch (e.g. net files written, opt
    files missing) that would brick every subsequent auto-resume; falling
    back to the newest complete epoch makes resume crash-safe. (The
    reference scans net files only and crashes on the torn load.)"""
    if not os.path.isdir(save_dir):
        return 0
    epochs = set()
    for f in os.listdir(save_dir):
        m = re.match(r"net_epoch_(\d+)_", f)
        if m:
            epochs.add(int(m.group(1)))
    complete = [
        e for e in epochs
        if all(
            os.path.exists(_path(save_dir, kind, e, net))
            for kind in ("net", "opt") for net in ("G", "D")
        )
    ]
    return max(complete, default=0)
