"""Synthetic dataset mode: the full sample contract with zero assets.

Registered as dataset_mode='synthetic'; produces the same sample dicts as
HOv3Dataset from the deterministic fixture environment, so the train/eval
entry points, bench.py and the driver's compile checks run everywhere.
"""

from __future__ import annotations

import numpy as np

from hoig_tpu.data.dataset_base import DatasetBase
from hoig_tpu.data.synthetic import synthetic_environment, synthetic_theta


class SyntheticDataset(DatasetBase):
    def __init__(self, opt, is_for_train: bool = True):
        super().__init__(opt, is_for_train)
        self._name = "SyntheticDataset"
        self.image_size = getattr(opt, "image_size", 256)
        self.num_objects = getattr(opt, "synthetic_num_objects", 2)
        _, self._mano, self._obj_verts = synthetic_environment(
            self.num_objects, self.image_size
        )
        self._n = getattr(opt, "synthetic_size", 64) * max(
            1, getattr(opt, "num_repeats", 1)
        )

    def environment(self):
        return synthetic_environment(self.num_objects, self.image_size)

    def __len__(self):
        return self._n

    def __getitem__(self, index):
        rng = np.random.RandomState(index)
        s = self.image_size
        theta_a = synthetic_theta(1, self._obj_verts, seed=index * 2 + 1,
                                  image_size=s)
        theta_b = synthetic_theta(1, self._obj_verts, seed=index * 2 + 2,
                                  image_size=s)
        theta_b["obj_id"] = theta_a["obj_id"]
        squeeze = lambda d: {k: v[0] for k, v in d.items()}
        return {
            "imageA": (rng.rand(3, s, s) * 2 - 1).astype(np.float32),
            "maskA": (rng.rand(1, s, s) > 0.5).astype(np.float32),
            "manoA": squeeze(theta_a),
            "nameA": f"synthetic/{index}_a",
            "imageB": (rng.rand(3, s, s) * 2 - 1).astype(np.float32),
            "maskB": (rng.rand(1, s, s) > 0.5).astype(np.float32),
            "manoB": squeeze(theta_b),
            "nameB": f"synthetic/{index}_b",
        }
