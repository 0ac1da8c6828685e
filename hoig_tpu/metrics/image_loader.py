"""Folder -> tensor eval loader (reference data/default_dataset.py parity).

PIL-based so resize kernels match torchvision's exactly (it delegates to
PIL): optional double resize (img_size then 299) and ImageNet or 0.5/0.5
normalization.
"""

from __future__ import annotations

import os

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def list_images(root: str) -> list:
    return sorted(os.path.join(root, f) for f in os.listdir(root))


def load_eval_image(path: str, img_size: int = 256,
                    imagenet_normalize: bool = True,
                    as_uint8_range: bool = False) -> np.ndarray:
    """-> (3, H, W) float32, normalized like get_eval_loader
    (default_dataset.py:28-45)."""
    from PIL import Image

    img = Image.open(path).convert("RGB")
    img = img.resize((img_size, img_size), Image.BILINEAR)
    if imagenet_normalize:
        img = img.resize((299, 299), Image.BILINEAR)
        arr = np.asarray(img, np.float32) / 255.0
        arr = (arr - IMAGENET_MEAN) / IMAGENET_STD
    elif as_uint8_range:
        arr = np.asarray(img, np.float32)  # [0, 255] for SSIM data_range=255
    else:
        arr = (np.asarray(img, np.float32) / 255.0 - 0.5) / 0.5
    return arr.transpose(2, 0, 1)


def iter_eval_images(root: str, img_size: int = 256, batch_size: int = 32,
                     imagenet_normalize: bool = True,
                     as_uint8_range: bool = False):
    files = list_images(root)
    for i in range(0, len(files), batch_size):
        yield np.stack(
            [
                load_eval_image(f, img_size, imagenet_normalize, as_uint8_range)
                for f in files[i : i + batch_size]
            ]
        )
