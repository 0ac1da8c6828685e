"""CI coverage for scripts/parity_eval.py — the one-command
checkpoint-parity harness (BASELINE.json FID/LPIPS-within-1% path).

Real reference checkpoints + pretrained metric weights are downloaded
assets absent here (as in the reference repo), so this exercises the
FULL pipeline end-to-end on fabricated small-shape fixtures: a saved
tiny-generator checkpoint drives eval.py into a PNG tree, the metric
battery runs over it, and a ref_tree comparison against an identical
copy of the tree must report every metric within 1% (rel_delta == 0).
"""

import os
import shutil
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

S = 64
TINY = ["--image_size", str(S), "--batch_size", "2", "--conv_dim", "8",
        "--repeat_num", "2", "--no_remat", "--use_spade",
        "--synthetic_size", "4"]


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    """Save a tiny trained-for-0-steps generator in the reference naming."""
    from hoig_tpu.data.loader import CustomDatasetDataLoader
    from hoig_tpu.geometry.conditioning import ConditioningConfig
    from hoig_tpu.options.train_options import TrainOptions
    from hoig_tpu.train.model_api import ModelsFactory

    ckpt_dir = str(tmp_path_factory.mktemp("ckpt"))
    opt = TrainOptions().parse(
        ["--dataset_mode", "synthetic", "--checkpoints_dir", ckpt_dir,
         "--name", "t", "--num_data_devices", "2"] + TINY
    )
    loader = CustomDatasetDataLoader(opt, is_for_train=True)
    parts = loader._dataset.environment()
    env = dict(
        tables_np=parts[0], tables=parts[0].as_jax(), mano=parts[1],
        mano_params=parts[1].as_jax(),
        ccfg=ConditioningConfig(image_size=S), is_ycb=False,
    )
    model = ModelsFactory.get_by_name("trainer", opt, env=env)
    model.save(1)
    path = os.path.join(ckpt_dir, "t", "net_epoch_1_id_G.ckpt")
    assert os.path.exists(path)
    return path


def test_parity_eval_end_to_end(checkpoint, tmp_path):
    import parity_eval

    out = str(tmp_path / "out")
    report = parity_eval.main([
        "--checkpoint", checkpoint,
        "--dataset_mode", "synthetic",
        "--data_dir", str(tmp_path / "nodata"),
        "--output_dir", out,
        "--conv_dim", "8", "--repeat_num", "2",
        "--image_size", str(S), "--batch_size", "2",
        "--synthetic_size", "4",
        "--metric_batch", "4",
        "--eval_extra", "--no_remat --use_spade",
    ])

    # eval tree generated
    for sub in ("source", "imitators", "gt"):
        d = os.path.join(out, sub)
        assert os.path.isdir(d) and len(os.listdir(d)) > 0, sub
    # metric battery ran; weights absent -> flagged not-comparable
    ours = report["ours"]
    for k in ("fid", "lpips", "ssim", "ms_ssim"):
        assert np.isfinite(ours[k]), k
    assert set(ours["weights_missing"]) == {"inception", "alexnet", "lpips"}
    assert 0.0 < ours["ssim"] <= 1.0
    # report persisted
    assert os.path.exists(os.path.join(out, "parity_report.json"))


def test_parity_eval_ref_tree_comparison(checkpoint, tmp_path):
    """An identical ref_tree must PASS the within-1% verdict; a corrupted
    one must FAIL — the verdict logic is what gates acceptance."""
    import parity_eval

    out = str(tmp_path / "out")
    base_args = [
        "--checkpoint", checkpoint,
        "--dataset_mode", "synthetic",
        "--data_dir", str(tmp_path / "nodata"),
        "--output_dir", out,
        "--conv_dim", "8", "--repeat_num", "2",
        "--image_size", str(S), "--batch_size", "2",
        "--synthetic_size", "4",
        "--metric_batch", "4",
        "--eval_extra", "--no_remat --use_spade",
    ]
    parity_eval.main(base_args)

    ref = str(tmp_path / "ref_tree")
    shutil.copytree(out, ref)
    report = parity_eval.main(
        base_args + ["--ref_tree", ref, "--skip_generate"]
    )
    assert report["parity"]["all_within_1pct"] is True
    for k in ("fid", "lpips", "ssim", "ms_ssim"):
        assert report["parity"][k]["rel_delta"] == pytest.approx(0.0, abs=1e-9)

    # corrupt the ref imitators (invert every image) -> SSIM/LPIPS diverge
    from PIL import Image

    imit = os.path.join(ref, "imitators")
    for f in os.listdir(imit):
        p = os.path.join(imit, f)
        arr = np.asarray(Image.open(p))
        Image.fromarray(255 - arr).save(p)
    report2 = parity_eval.main(
        base_args + ["--ref_tree", ref, "--skip_generate"]
    )
    assert report2["parity"]["all_within_1pct"] is False
