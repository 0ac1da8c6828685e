#!/usr/bin/env python3
"""One-command checkpoint-parity harness (BASELINE.json acceptance path).

The acceptance bar is "FID/LPIPS within 1% of the reference" driven by a
reference-trained checkpoint (`net_epoch_{E}_id_G.pth`). The pretrained
weights are downloaded assets absent from this environment (the reference
downloads them too: HOIG_HOv3/metrics/lpips.py:53-62,
metrics/pytorch_fid/inception.py:13), so this script packages the whole
pipeline into one command that runs the moment the weights exist:

  1. drive the hoig_tpu eval tree: `--load_path <ckpt>` -> eval.py ->
     `<output_dir>/{source,imitators,gt}` (reference eval.py:30-79
     contract; torch .pth checkpoints convert on the fly via
     hoig_tpu/models/torch_port.py);
  2. run the metric battery over (imitators, gt): FID
     (hoig_tpu/metrics/fid.py == pytorch_fid CLI), LPIPS
     (metrics/lpips.py), SSIM + MS-SSIM (metrics/ssim.py);
  3. if `--ref_tree` points at a tree the REFERENCE eval.py generated
     (on its own hardware) from the same checkpoint + pairs, run the
     same battery there and report per-metric relative deltas with a
     within-1% PASS/FAIL verdict.

Typical real-weight invocation (HO3Dv3):

  python scripts/parity_eval.py \
      --checkpoint checkpoints/net_epoch_30_id_G.pth \
      --dataset_mode hov3 --data_dir dataset/HO3D_v3 \
      --output_dir outputs/parity \
      --inception assets/weights/fid_inception.npz \
      --alexnet assets/weights/alexnet.npz \
      --lpips_weights assets/weights/lpips.npz \
      --ref_tree /path/to/reference_eval_outputs

Without metric weights the battery still runs (SSIM/MS-SSIM need none)
and the report marks FID/LPIPS values as NOT comparable
(`"weights_missing"`). CI covers the full flow on fabricated weights at
small shapes (tests/test_parity_eval.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REL_TOL = 0.01  # the BASELINE.json "within 1%" bar


def generate_tree(args) -> None:
    """Run eval.py with the checkpoint -> source/imitators/gt PNG trees."""
    import eval as eval_entry

    argv = [
        "--dataset_mode", args.dataset_mode,
        "--data_dir", args.data_dir,
        "--output_dir", args.output_dir,
        "--load_path", args.checkpoint,
        "--image_size", str(args.image_size),
        "--batch_size", str(args.batch_size),
        "--gen_name", args.gen_name,
        "--conv_dim", str(args.conv_dim),
        "--repeat_num", str(args.repeat_num),
        "--checkpoints_dir", args.output_dir,
        "--name", "parity",
    ]
    if args.synthetic_size:
        argv += ["--synthetic_size", str(args.synthetic_size),
                 "--synthetic_num_objects", str(args.synthetic_num_objects)]
    if args.platform:
        argv += ["--platform", args.platform]
    argv += args.eval_extra.split()
    eval_entry.main(argv)


def metric_battery(tree: str, args) -> dict:
    """FID/LPIPS/SSIM/MS-SSIM over <tree>/{imitators,gt}."""
    from hoig_tpu.metrics.fid import calculate_fid_given_paths
    from hoig_tpu.metrics.lpips import calculate_lpips_given_paths
    from hoig_tpu.metrics.ssim import calculate_ssim_given_paths

    pair = [os.path.join(tree, "imitators"), os.path.join(tree, "gt")]
    for p in pair:
        if not os.path.isdir(p):
            raise RuntimeError(f"eval tree incomplete: missing {p}")
    out = {"tree": tree}
    out["fid"] = calculate_fid_given_paths(
        pair, batch_size=args.metric_batch, weights_path=args.inception
    )
    out["lpips"] = calculate_lpips_given_paths(
        pair, img_size=args.image_size, batch_size=args.metric_batch,
        alexnet_weights=args.alexnet, lpips_weights=args.lpips_weights,
    )
    out["ssim"], out["ms_ssim"] = calculate_ssim_given_paths(
        pair, img_size=args.image_size, batch_size=args.metric_batch
    )
    out["weights_missing"] = [
        name for name, path in (
            ("inception", args.inception), ("alexnet", args.alexnet),
            ("lpips", args.lpips_weights),
        ) if not path
    ]
    return out


def compare(ours: dict, ref: dict) -> dict:
    """Per-metric relative deltas + within-1% verdicts.

    FID compares relatively on the value itself; LPIPS/SSIM likewise
    (all are positive scores where the acceptance bar is a 1% relative
    band, BASELINE.json).
    """
    rows = {}
    for key in ("fid", "lpips", "ssim", "ms_ssim"):
        a, b = ours.get(key), ref.get(key)
        if a is None or b is None:
            continue
        denom = max(abs(b), 1e-12)
        rel = abs(a - b) / denom
        rows[key] = {
            "hoig_tpu": a,
            "reference_tree": b,
            "rel_delta": rel,
            "within_1pct": bool(rel <= REL_TOL),
        }
    rows["all_within_1pct"] = all(r["within_1pct"] for r in rows.values())
    return rows


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--checkpoint", required=True,
                   help="net_epoch_{E}_id_G.{pth,npz,ckpt} (torch layouts "
                        "convert on the fly)")
    p.add_argument("--dataset_mode", default="hov3")
    p.add_argument("--data_dir", default="dataset/HO3D_v3")
    p.add_argument("--output_dir", default="outputs/parity_eval")
    p.add_argument("--ref_tree", default=None,
                   help="eval tree the REFERENCE generated from the same "
                        "checkpoint (dirs: imitators/ gt/)")
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--gen_name", default="generator_spade_attn")
    p.add_argument("--conv_dim", type=int, default=64)
    p.add_argument("--repeat_num", type=int, default=6)
    p.add_argument("--inception", default=None,
                   help="FID inception weights (.npz via convert_weights.py)")
    p.add_argument("--alexnet", default=None)
    p.add_argument("--lpips_weights", default=None)
    p.add_argument("--metric_batch", type=int, default=16)
    p.add_argument("--skip_generate", action="store_true",
                   help="reuse an existing --output_dir tree")
    p.add_argument("--platform", default=None)
    p.add_argument("--synthetic_size", type=int, default=0,
                   help="synthetic dataset_mode passthrough (tests)")
    p.add_argument("--synthetic_num_objects", type=int, default=2)
    p.add_argument("--eval_extra", default="",
                   help="extra flags forwarded to eval.py, one string "
                        '(e.g. --eval_extra "--no_remat --use_spade")')
    args = p.parse_args(argv)

    if not args.skip_generate:
        generate_tree(args)

    report = {"checkpoint": args.checkpoint, "ours": metric_battery(args.output_dir, args)}
    if args.ref_tree:
        report["reference"] = metric_battery(args.ref_tree, args)
        report["parity"] = compare(report["ours"], report["reference"])

    report_path = os.path.join(args.output_dir, "parity_report.json")
    os.makedirs(args.output_dir, exist_ok=True)
    with open(report_path, "w") as fp:
        json.dump(report, fp, indent=1)

    print("\n== parity report ==")
    for side in ("ours", "reference"):
        if side in report:
            r = report[side]
            missing = r.get("weights_missing")
            note = f"  [NOT comparable, missing weights: {missing}]" if missing else ""
            print(f"{side:9s} fid={r['fid']:.4f} lpips={r['lpips']:.4f} "
                  f"ssim={r['ssim']:.4f} ms_ssim={r['ms_ssim']:.4f}{note}")
    if "parity" in report:
        verdict = "PASS" if report["parity"]["all_within_1pct"] else "FAIL"
        print(f"within-1% verdict: {verdict}")
        for k, row in report["parity"].items():
            if isinstance(row, dict):
                print(f"  {k}: rel_delta={row['rel_delta']:.4%} "
                      f"{'ok' if row['within_1pct'] else 'EXCEEDS 1%'}")
    print(f"report written to {report_path}")
    return report


if __name__ == "__main__":
    main()
