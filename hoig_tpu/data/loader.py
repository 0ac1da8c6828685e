"""Dataset factory + batching loader.

Capability parity with HOIG_HOv3/data/__init__.py:4-54
(`CustomDatasetDataLoader`, `DatasetFactory`): batch/shuffle/drop_last,
DDP index sharding with per-epoch reseed (DistributedSampler.set_epoch
equivalent), background-thread prefetch standing in for torch's worker
processes (decode/warp already run in C++ via cv2/numpy; the C++
prefetcher in hoig_tpu/runtime handles the pinned staging).

Collation produces numpy batches that device_put cleanly onto a
data-sharded mesh.
"""

from __future__ import annotations

import queue
import threading

import numpy as np


def numpy_collate(samples: list) -> dict:
    """List of sample dicts -> dict of stacked arrays (strings -> lists)."""
    out = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], dict):
            out[key] = numpy_collate(vals)
        elif isinstance(vals[0], str):
            out[key] = vals
        else:
            out[key] = np.stack([np.asarray(v) for v in vals])
    return out


class ShardedSampler:
    """DistributedSampler equivalent: contiguous per-process shard of a
    per-epoch permutation (data/__init__.py:14, train_ddp.py:82)."""

    def __init__(self, n: int, num_shards: int = 1, shard_index: int = 0,
                 shuffle: bool = True, seed: int = 0):
        self.n = n
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def indices(self):
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            order = rng.permutation(self.n)
        else:
            order = np.arange(self.n)
        per = self.n // self.num_shards
        start = self.shard_index * per
        return order[start : start + per]


class DataLoader:
    """Map-style dataset -> iterator of collated numpy batches."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, num_shards: int = 1,
                 shard_index: int = 0, prefetch: int = 2, seed: int = 0,
                 num_threads: int = 4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.drop_last = drop_last
        self.sampler = ShardedSampler(
            len(dataset), num_shards, shard_index, shuffle, seed
        )
        self.prefetch = prefetch
        self.num_threads = max(1, num_threads)

    def set_epoch(self, epoch: int):
        self.sampler.set_epoch(epoch)

    def __len__(self):
        n = len(self.sampler.indices())
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self):
        idx = self.sampler.indices()
        nb = len(self)
        batches = [idx[i * self.batch_size : (i + 1) * self.batch_size]
                   for i in range(nb)]
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            try:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(self.num_threads) as pool:
                    for b in batches:
                        if stop.is_set():
                            return
                        samples = list(pool.map(self.dataset.__getitem__, b))
                        q.put(numpy_collate(samples))
            finally:
                q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()


class DatasetFactory:
    """Name -> dataset registry (data/__init__.py:41-54 + DexYCB variant +
    the synthetic fixture mode)."""

    @staticmethod
    def get_by_name(dataset_name: str, opt, is_for_train: bool):
        if dataset_name == "hov3":
            from hoig_tpu.data.hov3_dataset import HOv3Dataset

            ds = HOv3Dataset(opt, is_for_train)
        elif dataset_name == "ycb":
            from hoig_tpu.data.ycb_dataset import YCBDataset

            ds = YCBDataset(opt, is_for_train)
        elif dataset_name == "synthetic":
            from hoig_tpu.data.synthetic_dataset import SyntheticDataset

            ds = SyntheticDataset(opt, is_for_train)
        else:
            raise ValueError(f"Dataset [{dataset_name}] not recognized.")
        print(f"Dataset {ds.name} was created")
        return ds


class CustomDatasetDataLoader:
    """Reference-named wrapper (data/__init__.py:4-38)."""

    def __init__(self, opt, is_for_train: bool = True, use_ddp: bool = False,
                 num_shards: int = 1, shard_index: int = 0):
        self._opt = opt
        self._dataset = DatasetFactory.get_by_name(
            opt.dataset_mode, opt, is_for_train
        )
        threads = opt.n_threads_train if is_for_train else opt.n_threads_test
        # --batch_size is per-device (reference DDP semantics); one process
        # feeds the whole local mesh, so scale it here (parallel/mesh.py).
        from hoig_tpu.parallel import per_process_batch_size

        self._dataloader = DataLoader(
            self._dataset,
            batch_size=per_process_batch_size(opt),
            shuffle=not getattr(opt, "serial_batches", False),
            drop_last=use_ddp or is_for_train,
            num_shards=num_shards if use_ddp else 1,
            shard_index=shard_index if use_ddp else 0,
            num_threads=int(threads),
        )

    def load_data(self):
        return self._dataloader

    def load_sampler(self):
        return self._dataloader.sampler

    def __len__(self):
        return len(self._dataset)
