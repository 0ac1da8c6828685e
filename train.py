"""Training driver (reference HOIG_HOv3/train.py + train_ddp.py in one).

On TPU a single JAX process drives all local chips (the reference needs one
torch.distributed process per GPU); multi-host pods initialize through
`jax.distributed` automatically when launched by a pod runtime. The loop
semantics match the reference: time-based console prints / visual panels /
latest-checkpoint saves, held-out validation every display interval,
per-epoch checkpoints, linear LR decay after nepochs_no_decay
(train.py:40-150).
"""

from __future__ import annotations

import os
import time
from collections import OrderedDict


def setup_seed(seed: int = 8):
    """Reference setup_seed (train.py:9-18); JAX rngs are explicit keys so
    this pins the numpy/python side (data order, synthetic fixtures)."""
    import random

    import numpy as np

    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed)


class Train:
    def __init__(self, argv=None):
        from hoig_tpu.options.train_options import TrainOptions

        self._opt = TrainOptions().parse(argv)

        import jax

        if self._opt.platform:
            jax.config.update("jax_platforms", self._opt.platform)
        if os.environ.get("HOIG_MULTIHOST"):
            # pod runtimes auto-detect (all None); explicit env vars serve
            # generic launchers and the 2-process CPU test
            jax.distributed.initialize(
                coordinator_address=os.environ.get("HOIG_COORDINATOR"),
                num_processes=(
                    int(os.environ["HOIG_NUM_PROCESSES"])
                    if "HOIG_NUM_PROCESSES" in os.environ else None
                ),
                process_id=(
                    int(os.environ["HOIG_PROCESS_ID"])
                    if "HOIG_PROCESS_ID" in os.environ else None
                ),
            )
        self._primary = jax.process_index() == 0

        from hoig_tpu.data.loader import CustomDatasetDataLoader
        from hoig_tpu.train.model_api import ModelsFactory
        from hoig_tpu.utils.tb_visualizer import TBVisualizer

        shards = jax.process_count()
        data_loader_train = CustomDatasetDataLoader(
            self._opt, is_for_train=True, use_ddp=shards > 1,
            num_shards=shards, shard_index=jax.process_index(),
        )
        data_loader_test = CustomDatasetDataLoader(
            self._opt, is_for_train=False, use_ddp=shards > 1,
            num_shards=shards, shard_index=jax.process_index(),
        )
        self._dataset_train = data_loader_train.load_data()
        self._dataset_test = data_loader_test.load_data()
        self._dataset_train_size = len(data_loader_train)
        self._dataset_test_size = len(data_loader_test)
        print("#train video clips = %d" % self._dataset_train_size)
        print("#test video clips = %d" % self._dataset_test_size)

        env = None
        if self._opt.dataset_mode == "synthetic":
            env_parts = data_loader_train._dataset.environment()
            from hoig_tpu.geometry.conditioning import ConditioningConfig

            env = dict(
                tables_np=env_parts[0],
                tables=env_parts[0].as_jax(),
                mano=env_parts[1],
                mano_params=env_parts[1].as_jax(),
                ccfg=ConditioningConfig(image_size=self._opt.image_size),
                is_ycb=False,
            )
        self._model = ModelsFactory.get_by_name(self._opt.model, self._opt, env=env)
        self._tb_visualizer = TBVisualizer(self._opt)

        self._train()

    def _train(self):
        from hoig_tpu.parallel import per_process_batch_size

        opt = self._opt
        self._proc_batch = per_process_batch_size(opt)
        self._total_steps = opt.load_epoch * self._dataset_train_size
        self._iters_per_epoch = self._dataset_train_size / self._proc_batch
        self._last_display_time = None
        self._last_save_latest_time = None
        self._last_print_time = time.time()

        max_epoch = opt.nepochs_no_decay + opt.nepochs_decay
        for i_epoch in range(opt.load_epoch + 1, max_epoch + 1):
            epoch_start = time.time()
            self._train_epoch(i_epoch)

            if self._primary:
                print(
                    "saving the model at the end of epoch %d, iters %d"
                    % (i_epoch, self._total_steps)
                )
                self._model.save(i_epoch)
                dt = time.time() - epoch_start
                print(
                    "End of epoch %d / %d \t Time Taken: %d sec (%d min or %d h)"
                    % (i_epoch, max_epoch, dt, dt / 60, dt / 3600)
                )
            if i_epoch > opt.nepochs_no_decay:
                self._model.update_learning_rate()

    def _train_epoch(self, i_epoch):
        opt = self._opt
        self._model.set_train()
        self._dataset_train.set_epoch(i_epoch)
        for i_batch, batch in enumerate(self._dataset_train):
            iter_start = time.time()
            do_visuals = (
                self._last_display_time is None
                or time.time() - self._last_display_time > opt.display_freq_s
            )
            do_print = (
                time.time() - self._last_print_time > opt.print_freq_s or do_visuals
            )

            self._model.set_input(batch)
            trainable = (
                (i_batch + 1) % opt.train_G_every_n_iterations == 0
            ) or do_visuals
            self._model.optimize_parameters(
                keep_data_for_visuals=do_visuals and self._primary,
                trainable=trainable,
            )

            self._total_steps += self._proc_batch
            if self._primary and do_print:
                errors = self._model.get_current_errors()
                t = (time.time() - iter_start) / self._proc_batch
                self._tb_visualizer.print_current_train_errors(
                    i_epoch, i_batch, self._iters_per_epoch, errors, t, do_visuals
                )
                self._last_print_time = time.time()
            if self._primary and do_visuals:
                self._display_visualizer_train(self._total_steps)
                self._display_visualizer_val(i_epoch, self._total_steps)
                self._last_display_time = time.time()
            if self._primary and (
                self._last_save_latest_time is None
                or time.time() - self._last_save_latest_time > opt.save_latest_freq_s
            ):
                print(
                    "saving the latest model (epoch %d, total_steps %d)"
                    % (i_epoch, self._total_steps)
                )
                self._model.save(i_epoch)
                self._last_save_latest_time = time.time()

    def _display_visualizer_train(self, total_steps):
        self._tb_visualizer.display_current_results(
            self._model.get_current_visuals(), total_steps, is_train=True
        )
        self._tb_visualizer.plot_scalars(
            self._model.get_current_errors(), total_steps, is_train=True
        )
        self._tb_visualizer.plot_scalars(
            self._model.get_current_scalars(), total_steps, is_train=True
        )

    def _display_visualizer_val(self, i_epoch, total_steps):
        val_start = time.time()
        self._model.set_eval()
        val_errors = OrderedDict()
        self._dataset_test.set_epoch(i_epoch)
        n_val = 0
        for i_val, val_batch in enumerate(self._dataset_test):
            if i_val == self._opt.num_iters_validate:
                break
            self._model.set_input(val_batch)
            self._model.forward(keep_data_for_visuals=(i_val == 0))
            for k, v in self._model.get_current_errors().items():
                val_errors[k] = val_errors.get(k, 0) + v
            n_val += 1
        # average over batches actually seen: a test split smaller than
        # num_iters_validate must not deflate the reported losses
        for k in val_errors:
            val_errors[k] /= max(n_val, 1)
        self._tb_visualizer.print_current_validate_errors(
            i_epoch, val_errors, time.time() - val_start
        )
        self._tb_visualizer.plot_scalars(val_errors, total_steps, is_train=False)
        self._tb_visualizer.display_current_results(
            self._model.get_current_visuals(), total_steps, is_train=False
        )
        self._model.set_train()


if __name__ == "__main__":
    setup_seed()
    Train()
