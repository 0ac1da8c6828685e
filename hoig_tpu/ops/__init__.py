from hoig_tpu.ops.morph import morph
from hoig_tpu.ops.grid_sample import (
    grid_sample,
    resize_bilinear_align_corners,
    resize_nearest,
    avg_pool,
)
from hoig_tpu.ops.rasterizer import rasterize_fim_wim, rasterize_depth, rasterize_silhouette
from hoig_tpu.ops.block_extractor import block_extractor, local_attn_reshape
