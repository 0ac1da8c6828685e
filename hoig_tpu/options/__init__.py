from hoig_tpu.options.base_options import BaseOptions
from hoig_tpu.options.test_options import TestOptions
from hoig_tpu.options.train_options import TrainOptions
