"""Evaluation driver (reference HOIG_HOv3/eval.py parity).

Pair-driven generation; writes `source/`, `imitators/` (fakes) and `gt/`
PNG trees consumed by the FID/LPIPS/SSIM metric scripts. The batch grid is
untiled back into image_size crops exactly like the reference
(eval.py:70-79). `pairs_dir` is hardcoded like the reference (eval.py:32)
unless the dataset is synthetic; the undefined `--eval_pairs` flag that
eval_hov3.sh passes is accepted-and-ignored by the options layer.
"""

from __future__ import annotations

import os

import numpy as np


def save_image(image_numpy, image_path):
    from PIL import Image

    Image.fromarray(image_numpy).save(image_path)


def main(argv=None, env=None):
    from hoig_tpu.options.test_options import TestOptions

    opt = TestOptions().parse(argv)
    if opt.platform:
        import jax

        jax.config.update("jax_platforms", opt.platform)
    if opt.dataset_mode != "synthetic":
        opt.pairs_dir = (
            "assets/eval_pairs_new.pkl"
            if opt.dataset_mode == "hov3"
            else "assets/eval_pairs.pkl"
        )
        if env is None:  # a caller-built env skips the asset preflight (tests)
            from hoig_tpu.utils.preflight import preflight_assets

            preflight_assets(opt, eval_pairs=opt.pairs_dir)
    opt.serial_batches = True
    opt.is_train = False
    opt.bg_both = False
    sav_gt = True

    from hoig_tpu.data.loader import CustomDatasetDataLoader
    from hoig_tpu.train.model_api import ModelsFactory

    data_loader = CustomDatasetDataLoader(opt, is_for_train=False)
    dataset = data_loader.load_data()

    if env is None and opt.dataset_mode == "synthetic":
        from hoig_tpu.geometry.conditioning import ConditioningConfig

        parts = data_loader._dataset.environment()
        env = dict(
            tables_np=parts[0], tables=parts[0].as_jax(), mano=parts[1],
            mano_params=parts[1].as_jax(),
            ccfg=ConditioningConfig(image_size=opt.image_size), is_ycb=False,
        )
    model = ModelsFactory.get_by_name(opt.model, opt, env=env)

    sav_dir = opt.output_dir
    for sub in ["source", "imitators"] + (["gt"] if sav_gt else []):
        os.makedirs(os.path.join(sav_dir, sub), exist_ok=True)

    model.set_eval()
    s = opt.image_size
    for i_val_batch, val_batch in enumerate(dataset):
        model.set_input(val_batch)
        # generation only — skip the eval-loss graph (D + VGG passes);
        # nothing here reads get_current_errors()
        model.forward(keep_data_for_visuals=True, compute_losses=False)
        visuals = model.get_current_visuals()
        cols = visuals["14_batch_real_img"].shape[1] // s
        for i in range(len(val_batch["nameA"])):
            r, c = i // cols, i % cols
            # Names are "<vid>/<frame>" where vid itself may be nested
            # (DexYCB: "subject/seq/cam"); flatten with '_' exactly like the
            # reference does (HOIG_DexYCB/eval.py:72-74 joins parts[:-1]).
            src_parts = val_batch["nameA"][i].split("/")
            tsf_parts = val_batch["nameB"][i].split("/")
            src_vid, src_frame = "_".join(src_parts[:-1]), src_parts[-1]
            tsf_frame = tsf_parts[-1]
            stem = f"{src_vid}_{os.path.splitext(src_frame)[0]}_{os.path.splitext(tsf_frame)[0]}.png"
            crop = lambda key: visuals[key][r * s : r * s + s, c * s : c * s + s]
            save_image(crop("16_batch_src_img"), os.path.join(sav_dir, "source", stem))
            save_image(crop("15_batch_fake_img"), os.path.join(sav_dir, "imitators", stem))
            if sav_gt:
                save_image(crop("14_batch_real_img"), os.path.join(sav_dir, "gt", stem))
        print(f"batch {i_val_batch + 1} done")


if __name__ == "__main__":
    main()
