from hoig_tpu.ops.morph import morph
from hoig_tpu.ops.grid_sample import (
    grid_sample,
    grid_sample_nhwc,
    resize_bilinear_align_corners,
    resize_nearest,
    avg_pool,
)
from hoig_tpu.ops.rasterizer import (
    rasterize_fim_wim,
    rasterize_depth,
    rasterize_silhouette,
    soft_silhouette,
)
from hoig_tpu.ops.rasterizer_grad import (
    backward_depth_map,
    backward_pixel_map,
    rasterize_depth_exact,
    rasterize_silhouette_exact,
    render_rgb_exact,
)
from hoig_tpu.ops.rasterizer_pallas import (
    rasterize_fim_wim_auto,
    rasterize_fim_wim_pallas,
)
from hoig_tpu.ops.block_extractor import (
    block_extractor,
    block_extractor_nhwc,
    local_attn_reshape,
    local_attn_reshape_nhwc,
)
from hoig_tpu.ops.texture import lighting, sample_textures_trilinear


import os as _os


def compile_lite() -> bool:
    """HOIG_COMPILE_LITE=1: swap every Pallas kernel for its XLA fallback.

    Insurance knob for remote-compile-service outages: each Mosaic kernel
    instance measured 327 s to compile during the round-5 outage (vs
    seconds normally) and the flagship step carries ~20 of them, so a
    cold compile took 60-100+ min. The XLA fallbacks are the measured
    slower-at-runtime paths (PERF.md), but the program compiles in
    minutes; use when a number today beats a faster number never.
    """
    return _os.environ.get("HOIG_COMPILE_LITE") == "1"
