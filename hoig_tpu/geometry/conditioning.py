"""Conditioning front-end: batched HandRecoveryFlow.

Capability parity with HOIG_HOv3/models/trainer.py:14-185
(`HandRecoveryFlow.forward` + `HandModelRecovery.get_details`,
models/networks/hmr.py:63-91): MANO LBS -> merged hand+object vertices ->
fim/wim rasterization -> condition/semantic maps -> barycentric flow +
occlusion -> unified-surface texture -> generator input assembly.

TPU-first: ONE jit-compiled batched function. The reference runs a Python
loop over the batch re-dispatching per object name (trainer.py:63-97); here
object identity is data (an int id indexing padded tables), so the whole
conditioning stage is a single fixed-shape XLA program that jits, vmaps and
shard_maps with the train step.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from hoig_tpu.geometry import renderer as rend
from hoig_tpu.geometry.mano import mano_forward, pca_to_axisang
from hoig_tpu.ops.grid_sample import grid_sample_packed
from hoig_tpu.ops.morph import morph

NUM_HAND_FACES = rend.NUM_HAND_FACES


@dataclasses.dataclass(frozen=True)
class ConditioningConfig:
    """Static configuration of the conditioning stage.

    camera_model: 'matrix' (HOv3 camMat+crop, 15 numbers) or 'fxfy'
      (DexYCB fx,fy,cx,cy+crop, 10 numbers).
    mano_pca_comps: 0 = direct axis-angle (HOv3 smplx path,
      hmr.py:55 use_pca=False); >0 = PCA front-end (DexYCB manopth path).
    mano_scale: output vertex scale (DexYCB manopth works in mm -> 1e-3).
    num_seg_channels: one-hot semantic channels (fixed 15 in both variants,
      HOIG_DexYCB/models/trainer.py:74 — ids >= 16 silently drop out of the
      one-hot, replicated on purpose).
    """

    image_size: int = 256
    camera_model: str = "matrix"
    mano_pca_comps: int = 0
    mano_flat_hand_mean: bool = True
    mano_scale: float = 1.0
    num_seg_channels: int = 15
    bg_both: bool = False


def get_details(
    mano_params: dict, theta: dict, cfg: ConditioningConfig
) -> dict:
    """HandModelRecovery.get_details (hmr.py:63-91), batched.

    Args:
      mano_params: MANOModel.as_jax() pytree.
      theta: dict with 'cam' (B, 9|4), 'trans' (B, 2, 3) crop affine,
        'pose' (B, 3+P), 'shape' (B, 10), 'handtrans' (B, 3),
        'vertices_obj' (B, Vobj, 3) pre-transformed+padded object verts,
        'obj_id' (B,) int32.

    Returns:
      {'cam': (B, 9|4 + 6), 'verts': (B, 778+Vobj, 3), 'obj_id': (B,)}.
    """
    b = theta["cam"].shape[0]
    pose = theta["pose"]
    handtrans = theta.get("handtrans")
    if handtrans is None:
        # DexYCB pose_m layout: 48 pose ++ 3 translation
        # (HOIG_DexYCB/models/networks/hmr.py:85)
        handtrans = pose[:, 48:51]
        pose = pose[:, :48]
    root = pose[:, :3]
    hand_pose = pose[:, 3:]
    theta = dict(theta, handtrans=handtrans)
    if cfg.mano_pca_comps > 0:
        hand_pose = pca_to_axisang(hand_pose, mano_params, ncomps=cfg.mano_pca_comps)
        out = mano_forward(
            mano_params, root, hand_pose, theta["shape"], flat_hand_mean=True
        )
        verts_hand = out["vertices"] * cfg.mano_scale + theta["handtrans"][:, None, :]
    else:
        out = mano_forward(
            mano_params,
            root,
            hand_pose,
            theta["shape"],
            transl=theta["handtrans"],
            flat_hand_mean=cfg.mano_flat_hand_mean,
        )
        verts_hand = out["vertices"]
    verts = jnp.concatenate([verts_hand, theta["vertices_obj"]], axis=1)
    cam = jnp.concatenate(
        [theta["cam"].reshape(b, -1), theta["trans"].reshape(b, -1)], axis=1
    )
    return {"cam": cam, "verts": verts, "obj_id": theta["obj_id"]}


def _hand_mask(fim: jax.Array) -> jax.Array:
    """Eroded NOT-hand mask (trainer.py:72): 1 = not confidently hand."""
    is_hand = (fim >= 0) & (fim < NUM_HAND_FACES)
    return morph(1.0 - is_hand[:, None].astype(jnp.float32), ks=3, mode="erode")


def _split_cond(cond: jax.Array):
    """Hand/object cond separation (trainer.py:115-128).

    cond: (B, 3, S, S) uv_seg map. Hand uv lives in [0,1], object uv is
    shifted by >= 1.5; channel 2 is 0 on faces / 1 on bg.
    """
    hand_mask = (cond[:, :1] < 1.5).astype(cond.dtype)
    cond_hand = jnp.concatenate(
        [hand_mask * cond[:, :2], cond[:, 2:] + 1.0 - hand_mask], axis=1
    )
    obj_mask = (cond[:, :1] > 1.5).astype(cond.dtype)
    cond_obj = jnp.concatenate(
        [obj_mask * cond[:, :2], cond[:, 2:] + 1.0 - obj_mask], axis=1
    )
    return cond_hand, cond_obj


def _seg_onehot(seg_ids: jax.Array, num: int) -> jax.Array:
    """(B,1,S,S) float ids -> (B,num,S,S) one-hot over ids 1..num
    (trainer.py:70-71)."""
    chans = [(seg_ids == i).astype(jnp.float32) for i in range(1, num + 1)]
    return jnp.concatenate(chans, axis=1)


def hand_recovery_flow(
    tables: dict,
    mano_params: dict,
    src_img: jax.Array,
    ref_img: jax.Array,
    src_theta: dict,
    ref_theta: dict,
    cfg: ConditioningConfig,
) -> dict:
    """Full conditioning pass -> generator inputs (trainer.py:46-145).

    All (B, ...) batched; runs under no-grad semantics by construction
    (nothing here is a trainable parameter).

    Returns a dict with the generator inputs and masks:
      input_G_src_bg (B,8,S,S)  [img*bg_mask ++ bg_mask ++ ...(4ch img+mask)]
      input_G_tsf_bg or None
      input_G_src_obj / input_G_tsf_obj (B, 3+3+9, S, S)
      input_G_src_hand / input_G_tsf_hand (B, 3+3, S, S)
      T_hand (B, S, S, 2), masks, conds.
    """
    # src and ref run the identical geometry pipeline: stack them into one
    # 2B pass (one MANO forward, one rasterization) and split after — the
    # reference runs each per-sample in python (trainer.py:63-97)
    both_theta = jax.tree.map(
        lambda a, b: jnp.concatenate([jnp.asarray(a), jnp.asarray(b)], axis=0),
        dict(src_theta), dict(ref_theta),
    )
    both_info = get_details(mano_params, both_theta, cfg)
    # the SOURCE object identity drives every per-object table for both
    # halves (reference keys everything off the src objname,
    # trainer.py:58-60; pairs come from one video so they normally agree)
    obj_ids = both_info["obj_id"][: src_img.shape[0]]
    obj_ids2 = jnp.concatenate([obj_ids, obj_ids], axis=0)

    # fused rasterize+encode: project, rasterize the 2B stack, and fetch
    # every fim-indexed attribute (cond 3 | sem 1 | atlas uv 6 | src face
    # corners 6) inside the rasterizer's own winner gather — ONE per-pixel
    # row gather instead of rasterizer-finish + per-side encode gathers
    # (replaces the reference's separate encode_fim / encode_sem /
    # sample_from_texture_dense / cal_bc fetches, nmr.py:567-595,874-968;
    # values identical, gathers packed then fused)
    from hoig_tpu.geometry.projection import (
        orthographic_proj_withz_fxfy,
        orthographic_proj_withz_idrot,
        to_view_space,
        vertices_to_faces,
    )
    from hoig_tpu.ops.rasterizer_pallas import rasterize_fim_wim_auto

    proj_fn = (
        orthographic_proj_withz_idrot
        if cfg.camera_model == "matrix"
        else orthographic_proj_withz_fxfy
    )
    proj = proj_fn(both_info["verts"], both_info["cam"],
                   image_size=cfg.image_size)
    view = to_view_space(proj)
    faces2 = jnp.take(tables["faces"], obj_ids2, axis=0)
    valid2 = jnp.take(tables["face_valid"], obj_ids2, axis=0)
    face_verts = vertices_to_faces(view, faces2)
    both_f2pts = vertices_to_faces(proj, faces2)[..., 0:2]
    src_f2pts, ref_f2pts = jnp.split(both_f2pts, 2, axis=0)

    # both halves key their tables off the SRC object id (trainer.py:58-60)
    # and the ref half warps the SRC face corners; the src half's extra
    # columns ride the same gathered rows and are simply unused
    attrs = rend.build_attr_table(
        tables, obj_ids2,
        extra_f2pts=jnp.concatenate([src_f2pts, src_f2pts], axis=0),
    )
    both_fim, both_wim, rows = rasterize_fim_wim_auto(
        face_verts, valid2, image_size=cfg.image_size, near=0.1, far=25.0,
        attrs=attrs,
    )
    src_fim, ref_fim = jnp.split(both_fim, 2, axis=0)
    src_wim, ref_wim = jnp.split(both_wim, 2, axis=0)
    cond2, sem2, t_uv2, t_extra2 = rend.split_encoded_rows(
        rows, both_fim, both_wim
    )
    src_cond, ref_cond = jnp.split(cond2, 2, axis=0)
    src_sem, ref_sem = jnp.split(sem2, 2, axis=0)
    t_src, t_ref = jnp.split(t_uv2, 2, axis=0)
    t_flow = jnp.split(t_extra2, 2, axis=0)[1]
    src_seg = _seg_onehot(src_sem, cfg.num_seg_channels)
    ref_seg = _seg_onehot(ref_sem, cfg.num_seg_channels)
    src_mask_hand = _hand_mask(src_fim)
    ref_mask_hand = _hand_mask(ref_fim)

    hand_region = (ref_mask_hand[:, 0][..., None] == 0)
    t_hand = jnp.where(hand_region, t_flow, -2.0)  # (trainer.py:81)

    input_texture = rend.get_texture_backward_warp(
        tables, src_img, src_f2pts, src_fim, obj_ids
    )
    render_img_ref = grid_sample_packed(input_texture, t_ref, align_corners=True)
    render_img_src = grid_sample_packed(input_texture, t_src, align_corners=True)

    src_mask_bg = morph(src_cond[:, -1:], ks=3, mode="erode")
    ref_mask_bg = morph(ref_cond[:, -1:], ks=3, mode="erode")

    src_cond_hand, src_cond_obj = _split_cond(src_cond)
    ref_cond_hand, ref_cond_obj = _split_cond(ref_cond)

    # generator input assembly (trainer.py:130-142)
    input_g_src_obj = jnp.concatenate(
        [render_img_src * (src_mask_hand - src_mask_bg), src_cond_obj, src_seg[:, 6:]],
        axis=1,
    )
    input_g_tsf_obj = jnp.concatenate(
        [render_img_ref * (ref_mask_hand - ref_mask_bg), ref_cond_obj, ref_seg[:, 6:]],
        axis=1,
    )
    hand_extra_src = [src_seg[:, :6]] if cfg.camera_model == "fxfy" else []
    hand_extra_ref = [ref_seg[:, :6]] if cfg.camera_model == "fxfy" else []
    input_g_src_hand = jnp.concatenate(
        [src_img * (1.0 - src_mask_hand), src_cond_hand] + hand_extra_src, axis=1
    )
    input_g_tsf_hand = jnp.concatenate(
        [render_img_ref * (1.0 - ref_mask_hand), ref_cond_hand] + hand_extra_ref,
        axis=1,
    )

    src_bg_mask = morph(src_cond[:, -1:], ks=15, mode="erode")
    input_g_src_bg = jnp.concatenate([src_img * src_bg_mask, src_bg_mask], axis=1)
    if cfg.bg_both:
        ref_bg_mask = morph(ref_cond[:, -1:], ks=15, mode="erode")
        input_g_tsf_bg = jnp.concatenate([ref_img * ref_bg_mask, ref_bg_mask], axis=1)
    else:
        input_g_tsf_bg = None

    return {
        "input_G_src_bg": input_g_src_bg,
        "input_G_tsf_bg": input_g_tsf_bg,
        "input_G_src_obj": input_g_src_obj,
        "input_G_tsf_obj": input_g_tsf_obj,
        "input_G_src_hand": input_g_src_hand,
        "input_G_tsf_hand": input_g_tsf_hand,
        "T": t_hand,
        "src_crop_mask_bg": src_mask_bg,
        "tsf_crop_mask_bg": ref_mask_bg,
        "src_crop_mask_hand": src_mask_hand,
        "tsf_crop_mask_hand": ref_mask_hand,
    }


def cal_hand_bbox(kps: jax.Array, image_size: int, factor: float = 1.2) -> jax.Array:
    """Keypoints -> clamped square-ish bbox (trainer.py:148-185)."""
    kps = (kps + 1.0) / 2.0
    mn = jnp.min(kps, axis=1)
    mx = jnp.max(kps, axis=1)
    mid = (mn + mx) / 2.0
    half = (mx - mn) * factor / 2.0
    lo = jnp.maximum(0.0, mid - half)
    hi = jnp.minimum(1.0, mid + half)
    bbox = jnp.stack(
        [lo[:, 0], hi[:, 0], lo[:, 1], hi[:, 1]], axis=1
    ) * image_size
    return bbox.astype(jnp.int32)
