"""UV-image utilities: samplers, fim-enc visualization, texture->UV fit.

Capability parity with HOIG_HOv3/utils/mesh.py:440-620:
  * cvt_fim_enc — condition-map -> displayable image per map type,
  * create_uvsampler — per-face (T*T, 2) UV sample grids in [-1, 1],
  * compute_uv_image — inverse texture mapping: optimize a UV image whose
    per-face resampling matches a given texture (Adam fit; the TPU build
    runs the whole optimization as one jit-compiled lax.fori_loop instead
    of a 2000-iteration Python loop).
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hoig_tpu.geometry.mesh import load_obj
from hoig_tpu.ops.grid_sample import grid_sample


def cvt_fim_enc(fim_enc: np.ndarray, map_name: str) -> np.ndarray:
    """Condition map (H, W, C) -> display image (mesh.py:440-489)."""
    h, w, _ = fim_enc.shape
    if map_name == "uv":
        img = np.ones((h, w, 3), np.float32)
        img[:, :, 0:2] = fim_enc[:, :, 0:2]
        return img.transpose(2, 0, 1)
    if map_name in ("seg", "ids"):
        return fim_enc[:, :, 0].astype(np.float32)
    if map_name == "uv_seg":
        return fim_enc.astype(np.float32).transpose(2, 0, 1)
    if map_name == "par":
        img = fim_enc.argmax(axis=-1).astype(np.float32)
        return img / max(img.max(), 1e-8)
    if map_name == "binary":
        weights = 1 << np.arange(fim_enc.shape[-1])[::-1]
        img = (fim_enc.astype(np.int64) * weights).sum(-1).astype(np.float32)
        return img / max(img.max(), 1e-8)
    raise ValueError(map_name)


def create_uvsampler(uv_mapping_path: str, tex_size: int = 2) -> np.ndarray:
    """Per-face UV sample points (mesh.py:492-530): (F, T*T, 2) in [-1,1]."""
    alpha = np.arange(tex_size, dtype=np.float32) / (tex_size - 1)
    coords = np.stack(list(itertools.product(alpha, alpha)))  # (T*T, 2)

    info = load_obj(uv_mapping_path)
    vts = info["vts"].copy()
    vts[:, 1] = 1.0 - vts[:, 1]
    f2vts = vts[info["faces_vts"]]  # (F, 3, 2)
    v2 = f2vts[:, 2]
    basis = np.stack([f2vts[:, 0] - v2, f2vts[:, 1] - v2], axis=-1)  # (F,2,2)
    samples = basis @ coords.T + v2[..., None]  # (F, 2, T*T)
    samples = np.clip(samples, 0.0, 1.0).transpose(0, 2, 1)
    return (samples * 2.0 - 1.0).astype(np.float32)


def compute_uv_image(
    uv: np.ndarray,
    texture: np.ndarray,
    uv_size: int = 224,
    steps: int = 2000,
    lr: float = 1e-2,
) -> np.ndarray:
    """Fit a (3, uv_size, uv_size) image whose grid_sample at `uv` matches
    `texture` (mesh.py:570-620).

    uv: (F, T, T, 2) in [-1,1]; texture: (F, T, T, 3). Returns (3, H, W)
    in [-1, 1]. One compiled Adam loop (lax.fori_loop), not 2000 eager
    steps.
    """
    f, t = uv.shape[:2]
    uv_j = jnp.asarray(uv.reshape(1, f, t * t, 2), jnp.float32)
    target = jnp.asarray(texture, jnp.float32).reshape(1, f, t, t, 3)

    opt = optax.adam(lr)

    def predict(weight):
        uv_image = jnp.tanh(weight)
        tex = grid_sample(uv_image, uv_j)  # (1, 3, F, T*T)
        tex = tex.reshape(1, 3, f, t, t).transpose(0, 2, 3, 4, 1)
        return tex

    def loss_fn(weight):
        return jnp.mean((predict(weight) - target) ** 2)

    @jax.jit
    def fit(weight):
        state = opt.init(weight)

        def body(_, carry):
            w, s = carry
            grads = jax.grad(loss_fn)(w)
            updates, s = opt.update(grads, s, w)
            return (optax.apply_updates(w, updates), s)

        w, _ = jax.lax.fori_loop(0, steps, body, (weight, state))
        return jnp.tanh(w)

    weight0 = jnp.full((1, 3, uv_size, uv_size), -1.0, jnp.float32)
    return np.asarray(fit(weight0)[0])
