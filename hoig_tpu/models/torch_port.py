"""Reference HOGAN checkpoint ingestion: torch state dicts -> flax trees.

Maps the reference's `net_epoch_{E}_id_{G,D}.pth` state-dict layout
(HOIG_HOv3/models/networks/generator.py module names, discriminator.py
PatchGAN Sequential indices) onto the hoig_tpu flax parameter trees, so
reference-trained checkpoints drive this framework directly (the
FID/LPIPS-parity path in BASELINE.md).

Weight-layout transforms:
  * Conv2d OIHW -> flax HWIO: transpose(2, 3, 1, 0)
  * ConvTranspose2d IOHW -> flax HWIO: transpose(2, 3, 0, 1) + spatial
    flip (flax/lax conv_transpose correlates with an unflipped kernel;
    torch's transposed conv is the gradient of a correlation, i.e. a
    flipped-kernel correlation on the stride-dilated input). Verified
    numerically to ~1e-6 at f32.
  * InstanceNorm2d(affine=True) weight/bias -> scale/bias.

The mapping is constructed programmatically from the architecture config
(n_down, repeat_num, spade_layers, attn_layers) and applied with full
bidirectional coverage checks: every flax leaf must be written, and every
consumed torch key must exist.
"""

from __future__ import annotations

import numpy as np

# transform kinds
_CONV = "conv"  # OIHW -> HWIO
_CONVT = "convt"  # IOHW -> HWIO + spatial flip
_DIRECT = "direct"  # bias / norm affine vectors


def strip_module_prefix(state: dict) -> dict:
    """DDP-saved dicts carry 'module.' prefixes (base_model.py:104-122)."""
    return {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in state.items()
    }


def _t(kind: str, arr) -> np.ndarray:
    a = np.asarray(arr, dtype=np.float32)
    if kind == _CONV:
        return np.ascontiguousarray(a.transpose(2, 3, 1, 0))
    if kind == _CONVT:
        return np.ascontiguousarray(a.transpose(2, 3, 0, 1)[::-1, ::-1])
    return a


def _spade_entries(flax_prefix: tuple, torch_prefix: str):
    """SPADE module (spade.py:10-38): shared 3x3 MLP + gamma/beta heads."""
    out = []
    for head, tname in (
        ("mlp_shared", "mlp_shared.0"),
        ("mlp_gamma", "mlp_gamma"),
        ("mlp_beta", "mlp_beta"),
    ):
        out.append((flax_prefix + (head, "kernel"), f"{torch_prefix}.{tname}.weight", _CONV))
        out.append((flax_prefix + (head, "bias"), f"{torch_prefix}.{tname}.bias", _DIRECT))
    return out


def _conv_in_relu(flax_prefix: tuple, torch_conv: str, torch_in: str, convt=False):
    """ConvINReLU / UpConvINReLU <-> Sequential(conv, InstanceNorm, ReLU)."""
    conv_name = "ConvTranspose_0" if convt else "Conv_0"
    kind = _CONVT if convt else _CONV
    return [
        (flax_prefix + (conv_name, "kernel"), torch_conv + ".weight", kind),
        (flax_prefix + ("InstanceNorm_0", "scale"), torch_in + ".weight", _DIRECT),
        (flax_prefix + ("InstanceNorm_0", "bias"), torch_in + ".bias", _DIRECT),
    ]


def _residual_block(flax_prefix: tuple, torch_prefix: str):
    """ResidualBlock (generator.py:9-32), no learned shortcut (dims equal)."""
    return [
        (flax_prefix + ("Conv_0", "kernel"), f"{torch_prefix}.main.0.weight", _CONV),
        (flax_prefix + ("InstanceNorm_0", "scale"), f"{torch_prefix}.main.1.weight", _DIRECT),
        (flax_prefix + ("InstanceNorm_0", "bias"), f"{torch_prefix}.main.1.bias", _DIRECT),
        (flax_prefix + ("Conv_1", "kernel"), f"{torch_prefix}.main.3.weight", _CONV),
        (flax_prefix + ("InstanceNorm_1", "scale"), f"{torch_prefix}.main.4.weight", _DIRECT),
        (flax_prefix + ("InstanceNorm_1", "bias"), f"{torch_prefix}.main.4.bias", _DIRECT),
    ]


def _spade_residual_block(flax_prefix: tuple, torch_prefix: str):
    """SPADEResidualBlock (generator.py:35-72), no learned shortcut."""
    out = []
    for c in ("conv_0", "conv_1"):
        out.append((flax_prefix + (c, "kernel"), f"{torch_prefix}.{c}.weight", _CONV))
        out.append((flax_prefix + (c, "bias"), f"{torch_prefix}.{c}.bias", _DIRECT))
    out += _spade_entries(flax_prefix + ("norm_0",), f"{torch_prefix}.norm_0")
    out += _spade_entries(flax_prefix + ("norm_1",), f"{torch_prefix}.norm_1")
    return out


def _spade_block(flax_prefix: tuple, torch_prefix: str, convt=False):
    """SPADEBlock (generator.py:75-91): (transposed) conv + SPADE."""
    conv_name = "ConvTranspose_0" if convt else "Conv_0"
    kind = _CONVT if convt else _CONV
    return [
        (flax_prefix + (conv_name, "kernel"), f"{torch_prefix}.conv.weight", kind)
    ] + _spade_entries(flax_prefix + ("norm",), f"{torch_prefix}.norm")


def _resnet_generator(flax_prefix: tuple, torch_prefix: str, n_down: int, repeat: int):
    """ResNetGenerator (generator.py:93-135): Sequential index arithmetic."""
    out = _conv_in_relu(
        flax_prefix + ("ConvINReLU_0",), f"{torch_prefix}.model.0", f"{torch_prefix}.model.1"
    )
    for d in range(n_down):
        base = 3 + 3 * d
        out += _conv_in_relu(
            flax_prefix + (f"ConvINReLU_{d + 1}",),
            f"{torch_prefix}.model.{base}", f"{torch_prefix}.model.{base + 1}",
        )
    res0 = 3 + 3 * n_down
    for r in range(repeat):
        out += _residual_block(
            flax_prefix + (f"ResidualBlock_{r}",), f"{torch_prefix}.model.{res0 + r}"
        )
    up0 = res0 + repeat
    for u in range(n_down):
        base = up0 + 3 * u
        out += _conv_in_relu(
            flax_prefix + (f"UpConvINReLU_{u}",),
            f"{torch_prefix}.model.{base}", f"{torch_prefix}.model.{base + 1}",
            convt=True,
        )
    final = up0 + 3 * n_down
    out.append(
        (flax_prefix + ("Conv_0", "kernel"), f"{torch_prefix}.model.{final}.weight", _CONV)
    )
    return out


def _resunet_generator(
    flax_prefix: tuple, torch_prefix: str, n_down: int, repeat: int,
    spade_layers, on_obj: bool,
):
    """ResUnetGenerator (generator.py:138-237)."""
    out = _conv_in_relu(
        flax_prefix + ("encoders_0",),
        f"{torch_prefix}.encoders.0.0", f"{torch_prefix}.encoders.0.1",
    )
    for i in range(1, n_down + 1):
        if spade_layers[0]:
            out += _spade_block(
                flax_prefix + (f"encoders_{i}",), f"{torch_prefix}.encoders.{i}"
            )
        else:
            out += _conv_in_relu(
                flax_prefix + (f"encoders_{i}",),
                f"{torch_prefix}.encoders.{i}.0", f"{torch_prefix}.encoders.{i}.1",
            )
    for i in range(repeat):
        spade = spade_layers[1] if i < repeat // 2 else spade_layers[2]
        if spade:
            out += _spade_residual_block(
                flax_prefix + (f"resnets_{i}",), f"{torch_prefix}.resnets.{i}"
            )
        else:
            out += _residual_block(
                flax_prefix + (f"resnets_{i}",), f"{torch_prefix}.resnets.{i}"
            )
    for i in range(n_down):
        if spade_layers[3]:
            out += _spade_block(
                flax_prefix + (f"decoders_{i}",), f"{torch_prefix}.decoders.{i}",
                convt=True,
            )
        else:
            out += _conv_in_relu(
                flax_prefix + (f"decoders_{i}",),
                f"{torch_prefix}.decoders.{i}.0", f"{torch_prefix}.decoders.{i}.1",
                convt=True,
            )
        out += _conv_in_relu(
            flax_prefix + (f"skippers_{i}",),
            f"{torch_prefix}.skippers.{i}.0", f"{torch_prefix}.skippers.{i}.1",
        )
    out.append(
        (flax_prefix + ("img_reg", "kernel"), f"{torch_prefix}.img_reg.0.weight", _CONV)
    )
    if not on_obj:
        # reference spelling: "attetion" (generator.py:230-237)
        out.append(
            (flax_prefix + ("attn_reg_hand", "kernel"),
             f"{torch_prefix}.attetion_reg_hand.0.weight", _CONV)
        )
        out.append(
            (flax_prefix + ("attn_reg_bg", "kernel"),
             f"{torch_prefix}.attetion_reg_bg.0.weight", _CONV)
        )
    return out


def generator_mapping(n_down=3, repeat_num=6, spade_layers=(1, 1, 0, 0),
                      attn_layers=()):
    """Full (flax_path, torch_key, transform) list for `Generator`."""
    out = _resnet_generator(("bg_model",), "bg_model", n_down, repeat_num)
    for name, on_obj in (("obj_model", True), ("src_model", False),
                         ("tsf_model", False)):
        out += _resunet_generator(
            (name,), name, n_down, repeat_num, spade_layers, on_obj
        )
    for l in attn_layers:
        p, t = (f"attn_{l}",), f"attn_{l}.fully_connect_layer"
        out += [
            (p + ("fc_0_kernel",), f"{t}.0.weight", _CONV),
            (p + ("fc_0_bias",), f"{t}.0.bias", _DIRECT),
            (p + ("fc_1_kernel",), f"{t}.2.weight", _CONV),
            (p + ("fc_1_bias",), f"{t}.2.bias", _DIRECT),
        ]
    return out


def discriminator_mapping(n_layers=4):
    """PatchDiscriminator (discriminator.py:8-57), norm_type='instance'
    (affine=False -> no norm params). Torch Sequential conv indices:
    0, then 2+3(n-1) for the stride-2 blocks, one stride-1 block, then the
    1-channel head."""
    idxs = [0] + [2 + 3 * (n - 1) for n in range(1, n_layers)]
    idxs.append(idxs[-1] + 3)  # stride-1 block
    idxs.append(idxs[-1] + 3)  # output head
    out = []
    for j, ti in enumerate(idxs):
        out.append(((f"Conv_{j}", "kernel"), f"model.{ti}.weight", _CONV))
        out.append(((f"Conv_{j}", "bias"), f"model.{ti}.bias", _DIRECT))
    return out


def _apply_mapping(params, state: dict, mapping) -> dict:
    """Write every mapped torch tensor into a copy of the flax tree;
    verify complete coverage in both directions."""
    state = strip_module_prefix(state)
    tree = params["params"] if "params" in params else params

    # deep-copy into plain dicts
    def copy(t):
        return {k: copy(v) for k, v in t.items()} if isinstance(t, dict) else t

    new = copy(dict(tree))
    written = set()
    for path, tkey, kind in mapping:
        if tkey not in state:
            raise KeyError(
                f"reference state dict is missing '{tkey}' (expected for "
                f"flax param {'/'.join(path)}) — wrong architecture/config?"
            )
        node = new
        for p in path[:-1]:
            if p not in node:
                raise KeyError(
                    f"flax tree has no '{'/'.join(path)}' — template built "
                    "with a different config than the mapping"
                )
            node = node[p]
        old = node[path[-1]]
        val = _t(kind, state[tkey])
        if tuple(val.shape) != tuple(np.shape(old)):
            raise ValueError(
                f"shape mismatch for {tkey} -> {'/'.join(path)}: "
                f"{val.shape} vs {np.shape(old)}"
            )
        node[path[-1]] = val.astype(np.asarray(old).dtype)
        written.add(path)

    # every flax leaf must have been written
    def leaves(t, prefix=()):
        if isinstance(t, dict):
            for k, v in t.items():
                yield from leaves(v, prefix + (k,))
        else:
            yield prefix

    unwritten = [p for p in leaves(new) if p not in written]
    if unwritten:
        raise ValueError(
            f"{len(unwritten)} flax params not covered by the mapping, e.g. "
            f"{['/'.join(p) for p in unwritten[:5]]}"
        )
    return {"params": new} if "params" in params else new


def generator_params_from_torch(params, state: dict, tcfg) -> dict:
    """Convert a reference `net_epoch_*_id_G.pth` state dict into the flax
    Generator tree shaped like `params` (init with the same TrainConfig)."""
    spade, attn = _gen_layout(tcfg.gen_name)
    mapping = generator_mapping(
        n_down=3, repeat_num=tcfg.repeat_num, spade_layers=spade,
        attn_layers=attn,
    )
    return _apply_mapping(params, state, mapping)


def discriminator_params_from_torch(params, state: dict, n_layers=4) -> dict:
    return _apply_mapping(params, state, discriminator_mapping(n_layers))


def _gen_layout(gen_name: str):
    """gen_name -> (spade_layers, attn_layers), mirroring the registry
    (models/networks/__init__.py:8-36)."""
    full = (1, 2, 3, 4, 5, 6, 7, 8, 9)
    return {
        "generator_base": ((0, 0, 0, 0), ()),
        "generator_spade": ((1, 1, 0, 0), ()),
        "generator_spade_attn": ((1, 1, 0, 0), full),
        "generator_spade_attn_tiny": ((0, 0, 1, 1), full),
    }[gen_name]
