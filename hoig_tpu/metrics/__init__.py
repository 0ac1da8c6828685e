from hoig_tpu.metrics.fid import (
    calculate_fid_given_paths,
    calculate_frechet_distance,
)
from hoig_tpu.metrics.lpips import calculate_lpips_given_paths
from hoig_tpu.metrics.ssim import calculate_ssim_given_paths, ms_ssim, ssim
