"""Asset/config assembly: options -> (tables, mano, configs).

Bridges the argparse surface (reference options/*) to the functional
training core. Dataset-variant specifics follow SURVEY.md §2.11:
HOv3 = camMat camera, armask, D 19ch; DexYCB = fx/fy camera, PCA-45 MANO,
hand-seg channels appended, D 24ch, no masks.
"""

from __future__ import annotations

import os

import jax.numpy as jnp

from hoig_tpu.geometry.conditioning import ConditioningConfig
from hoig_tpu.geometry.mano import MANOModel
from hoig_tpu.geometry.renderer import ObjectSpec, build_surface_tables
from hoig_tpu.train.trainer import TrainConfig


def find_mano_pickle(path: str) -> str:
    """Resolve a MANO_RIGHT.pkl under a smplx-style models dir or use the
    path directly (reference --mano_model points at assets/smplx/models/)."""
    if os.path.isfile(path):
        return path
    for root, _, files in os.walk(path):
        for f in files:
            if f.upper().startswith("MANO_RIGHT") and f.endswith(".pkl"):
                return os.path.join(root, f)
    raise FileNotFoundError(f"No MANO_RIGHT.pkl found under {path}")


def dataset_objects(opt) -> list:
    """Enumerate object specs the way MANORenderer.__init__ does
    (nmr.py:276-279: sorted listdir of the obj root)."""
    if opt.dataset_mode == "ycb":
        from hoig_tpu.data.ycb_dataset import OBJNAMES

        root = getattr(opt, "obj_dir", os.path.join(opt.data_dir, "models"))
        return [
            ObjectSpec(
                name=n,
                obj_path=os.path.join(root, n, "textured_pre.obj"),
                texture_path=_maybe(os.path.join(root, n, "texture_map_resize.png")),
            )
            for n in OBJNAMES
        ]
    from hoig_tpu.data.hov3_dataset import OBJNAMES

    root = getattr(opt, "obj_dir", "assets/obj")
    names = sorted(os.listdir(root)) if os.path.isdir(root) else OBJNAMES
    return [
        ObjectSpec(
            name=n,
            obj_path=os.path.join(root, n, n + ".obj"),
            texture_path=_maybe(os.path.join(root, n, "texture_map.png")),
        )
        for n in names
    ]


def _maybe(path):
    return path if os.path.exists(path) else None


def build_environment(opt):
    """-> dict(tables=jax pytree, tables_np, mano_params, mano, ccfg)."""
    synthetic = getattr(opt, "synthetic_data", False) or opt.dataset_mode == "synthetic"
    if synthetic:
        from hoig_tpu.data.synthetic import synthetic_environment

        tables_np, mano, _ = synthetic_environment(
            getattr(opt, "synthetic_num_objects", 2), opt.image_size
        )
    else:
        from hoig_tpu.utils.preflight import preflight_assets

        preflight_assets(opt)
        mano = MANOModel.from_pickle(find_mano_pickle(opt.mano_model))
        uv = opt.uv_mapping[0] if isinstance(opt.uv_mapping, list) else opt.uv_mapping
        tables_np = build_surface_tables(
            uv,
            dataset_objects(opt),
            getattr(opt, "sem_hand", "assets/semantics_hand.pkl"),
            map_name=opt.map_name,
            image_size=opt.image_size,
        )

    is_ycb = opt.dataset_mode == "ycb"
    ccfg = ConditioningConfig(
        image_size=opt.image_size,
        camera_model="fxfy" if is_ycb else "matrix",
        mano_pca_comps=45 if is_ycb else 0,
        mano_flat_hand_mean=not is_ycb,
        bg_both=getattr(opt, "bg_both", False),
    )
    return dict(
        tables_np=tables_np,
        tables=tables_np.as_jax(),
        mano=mano,
        mano_params=mano.as_jax(),
        ccfg=ccfg,
        is_ycb=is_ycb,
    )


def resolve_corner_engine(engine: str, bf16: bool) -> str:
    """'auto' -> the measured-fastest flow-attention corner engine for the
    precision mode: 'shift' (conv-collapse, gather-free) under bf16
    (373.9 vs gather's 437 ms/step on v5e, PERF.md round-3 A/B); 'gather'
    under fp32, where the wider FMA fields made shift v1 slower (480 vs
    457 ms) and v2 is unmeasured. Explicit values pass through."""
    if engine == "auto":
        return "shift" if bf16 else "gather"
    return engine


def train_config_from_opt(opt) -> TrainConfig:
    is_ycb = opt.dataset_mode == "ycb"
    # dims per variant (HOIG_HOv3/models/trainer.py:260-267,
    # HOIG_DexYCB/models/trainer.py:263-270)
    if is_ycb:
        dims = dict(bg_dim=13, img_dim=3, obj_dim=3, img_cond_dim=9,
                    obj_cond_dim=12, d_input_nc=24, use_armask=False)
    else:
        dims = dict(bg_dim=8, img_dim=3, obj_dim=3, img_cond_dim=3,
                    obj_cond_dim=12, d_input_nc=19, use_armask=True)
    if not getattr(opt, "use_spade", True):
        dims.update(img_dim=12, obj_dim=12)
    return TrainConfig(
        gen_name=opt.gen_name,
        use_spade=getattr(opt, "use_spade", True),
        repeat_num=opt.repeat_num,
        conv_dim=getattr(opt, "conv_dim", 64),
        remat=not getattr(opt, "no_remat", False),
        # selective remat (keep 1/8-res bottleneck activations) fits HBM only
        # under bf16 at the flagship 256px/batch-4 config; fp32 needs the
        # full-remat memory envelope. --remat_bottleneck forces full remat.
        remat_bottleneck=(
            getattr(opt, "remat_bottleneck", False)
            or not getattr(opt, "bf16", False)
        ),
        # under bf16 the attention residuals also fit: storing them beats
        # recomputing the gathers (457 vs 512 ms measured, PERF.md)
        remat_attn=(
            getattr(opt, "remat_bottleneck", False)
            or not getattr(opt, "bf16", False)
        ),
        corner_engine=resolve_corner_engine(
            getattr(opt, "corner_engine", "auto"), getattr(opt, "bf16", False)
        ),
        image_size=opt.image_size,
        d_norm_type=opt.norm_type,
        lr_G=getattr(opt, "lr_G", 2e-4),
        lr_D=getattr(opt, "lr_D", 2e-4),
        final_lr=getattr(opt, "final_lr", 2e-6),
        adam_b1=getattr(opt, "G_adam_b1", 0.5),
        adam_b2=getattr(opt, "G_adam_b2", 0.999),
        nepochs_decay=getattr(opt, "nepochs_decay", 20),
        lambda_D_prob=getattr(opt, "lambda_D_prob", 1.0),
        lambda_rec=getattr(opt, "lambda_rec", 10.0),
        lambda_tsf=getattr(opt, "lambda_tsf", 10.0),
        lambda_mask=getattr(opt, "lambda_mask", 0.1),
        lambda_mask_smooth=getattr(opt, "lambda_mask_smooth", 1e-5),
        use_vgg=getattr(opt, "use_vgg", False),
        mask_bce=getattr(opt, "mask_bce", False),
        train_G_every_n_iterations=getattr(opt, "train_G_every_n_iterations", 1),
        compute_dtype=jnp.bfloat16 if getattr(opt, "bf16", False) else jnp.float32,
        **dims,
    )
