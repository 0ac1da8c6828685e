#!/usr/bin/env python3
"""Convert the reference's pretrained torch weights to .npz.

The reference pulls four downloaded weight assets (none are bundled with
either repo):
  * torchvision vgg19 'features' state dict  — perceptual loss
    (HOIG_HOv3/models/networks/vgg19.py:58)
  * torchvision alexnet 'features' state dict — LPIPS backbone
    (HOIG_HOv3/metrics/lpips.py:15)
  * metrics/lpips_weights.ckpt — learned LPIPS 1x1 weights
    (HOIG_HOv3/metrics/lpips.py:53-62)
  * pt_inception-2015-12-05.pth — FID InceptionV3
    (HOIG_HOv3/metrics/pytorch_fid/inception.py:13)

This script turns any of them into a plain .npz the hoig_tpu loaders
consume directly (hoig_tpu/models/vgg.py:66, hoig_tpu/metrics/lpips.py:93,
hoig_tpu/metrics/inception.py:193). torch is only needed for .pth/.ckpt
inputs; the training/eval stack itself never imports it.

Usage:
  python scripts/convert_weights.py vgg19     vgg19.pth                assets/weights/vgg19.npz
  python scripts/convert_weights.py alexnet   alexnet.pth              assets/weights/alexnet.npz
  python scripts/convert_weights.py lpips     lpips_weights.ckpt       assets/weights/lpips.npz
  python scripts/convert_weights.py inception pt_inception-2015-12-05.pth assets/weights/fid_inception.npz

Then train with `--vgg_weights assets/weights/vgg19.npz` (already wired
into scripts/train_*.sh) and pass the alexnet/lpips/inception .npz paths
to the metric CLIs.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

# Key signatures used to sanity-check that the supplied file is the right
# asset (first mismatch aborts with a pointed message).
_EXPECT = {
    "vgg19": ["features.0.weight", "features.28.weight"],
    "alexnet": ["features.0.weight", "features.10.weight"],
    "lpips": ["lpips_weights.0.main.1.weight", "lpips_weights.4.main.1.weight"],
    "inception": ["Conv2d_1a_3x3.conv.weight", "Mixed_7c.branch_pool.conv.weight"],
    # reference HOGAN checkpoints (net_epoch_{E}_id_{G,D}.pth): dumped as a
    # raw-key .npz; the flax-tree mapping happens at load time
    # (hoig_tpu/models/torch_port.py) so one dump serves every gen variant
    "generator": ["bg_model.model.0.weight", "src_model.img_reg.0.weight"],
    "discriminator": ["model.0.weight", "model.0.bias"],
}


def load_state_dict(path: str) -> dict:
    if path.endswith(".npz"):
        return dict(np.load(path))
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if isinstance(obj, dict) and "state_dict" in obj and isinstance(
        obj["state_dict"], dict
    ):
        obj = obj["state_dict"]
    return obj


def to_numpy(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def convert(kind: str, src: str, dst: str) -> dict:
    state = load_state_dict(src)
    if kind in ("generator", "discriminator"):
        # DDP-saved reference checkpoints carry 'module.' prefixes
        state = {
            (k[len("module."):] if k.startswith("module.") else k): v
            for k, v in state.items()
        }
    keys = set(state.keys())
    missing = [k for k in _EXPECT[kind] if k not in keys]
    if missing:
        sample = sorted(keys)[:5]
        raise SystemExit(
            f"{src} does not look like a {kind} state dict: missing {missing};"
            f" it has keys like {sample}"
        )
    arrays = {k: to_numpy(v) for k, v in state.items()
              if not k.endswith("num_batches_tracked")}
    os.makedirs(os.path.dirname(dst) or ".", exist_ok=True)
    np.savez(dst, **arrays)
    print(f"{kind}: wrote {len(arrays)} arrays -> {dst}")
    return arrays


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("kind", choices=sorted(_EXPECT))
    p.add_argument("src", help=".pth/.ckpt (torch) or .npz input")
    p.add_argument("dst", help=".npz output path")
    a = p.parse_args(argv)
    if not os.path.exists(a.src):
        raise SystemExit(
            f"input not found: {a.src}\n"
            "Download the asset first (torchvision model zoo for vgg19/"
            "alexnet, the reference repo's metrics/lpips_weights.ckpt, or "
            "the pytorch-fid pt_inception release)."
        )
    convert(a.kind, a.src, a.dst)


if __name__ == "__main__":
    sys.exit(main())
