"""Training observability (reference utils/tb_visualizer.py:8-67 parity).

Scalars + image panels to tensorboardX when available, always mirrored to
`summary.json` and the text log `loss_log2.txt` so headless runs keep full
observability without the tensorboard dependency.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


class TBVisualizer:
    def __init__(self, opt):
        self._opt = opt
        self._save_path = os.path.join(opt.checkpoints_dir, opt.name)
        os.makedirs(self._save_path, exist_ok=True)
        self._log_path = os.path.join(self._save_path, "loss_log2.txt")
        self._tb_path = os.path.join(self._save_path, "events")
        self._summary = {}
        self._summary_path = os.path.join(self._save_path, "summary.json")
        self._writer = None
        for mod in ("tensorboardX", "torch.utils.tensorboard"):
            try:
                import importlib

                SummaryWriter = importlib.import_module(mod).SummaryWriter
                self._writer = SummaryWriter(self._save_path)
                break
            except Exception:
                continue
        with open(self._log_path, "a") as fp:
            now = time.strftime("%c")
            fp.write(f"================ Training Loss ({now}) ================\n")

    def __del__(self):
        if self._writer is not None:
            self._writer.close()

    def display_current_results(self, visuals, it, is_train, save_visuals=False):
        for label, image in visuals.items():
            tag = f"{'Train' if is_train else 'Test'}/{label}"
            if self._writer is not None:
                self._writer.add_image(tag, np.asarray(image), it, dataformats="HWC")
            if save_visuals:
                try:
                    import cv2

                    vdir = os.path.join(self._save_path, "event_imgs", label)
                    os.makedirs(vdir, exist_ok=True)
                    cv2.imwrite(
                        os.path.join(vdir, f"{it:08d}.png"),
                        np.asarray(image)[:, :, ::-1],
                    )
                except Exception:
                    pass

    def plot_scalars(self, scalars, it, is_train):
        for label, scalar in scalars.items():
            sum_name = f"{'Train' if is_train else 'Test'}/{label}"
            if self._writer is not None:
                self._writer.add_scalar(sum_name, float(scalar), it)
            self._summary.setdefault(sum_name, []).append([it, float(scalar)])
        with open(self._summary_path, "w") as fp:
            json.dump(self._summary, fp)

    def print_current_train_errors(self, epoch, i, iters_per_epoch, errors, t, visuals_were_stored):
        now = time.strftime("%c")
        visuals_info = "v" if visuals_were_stored else ""
        message = (
            f"{now} (T{visuals_info}, epoch: {epoch}, it: {i}/{iters_per_epoch}, "
            f"t/smpl: {t:.3f}s) "
        )
        for k, v in errors.items():
            message += f"{k}:{float(v):.3f} "
        print(message)
        with open(self._log_path, "a") as fp:
            fp.write(f"{message}\n")

    def print_current_validate_errors(self, epoch, errors, t):
        now = time.strftime("%c")
        message = f"{now} (V, epoch: {epoch}, time_to_val: {t:.3f}s) "
        for k, v in errors.items():
            message += f"{k}:{float(v):.3f} "
        print(message)
        with open(self._log_path, "a") as fp:
            fp.write(f"{message}\n")

    def save_images(self, visuals):
        for label, image_numpy in visuals.items():
            image_name = f"{label}.png"
            save_path = os.path.join(self._save_path, "samples", image_name)
            os.makedirs(os.path.dirname(save_path), exist_ok=True)
            try:
                import cv2

                cv2.imwrite(save_path, np.asarray(image_numpy)[:, :, ::-1])
            except Exception:
                pass
