"""Foundation ops (L2): gather/warp, patch extract/combine, resize, deform conv,
correlation volumes, differentiable Canny.

All ops use NHWC layout and static shapes, and are jit/vmap/grad friendly.
"""

from propainter_tpu.ops.warp import (
    grid_sample,
    flow_warp,
    bilinear_sampler,
    coords_grid,
    upflow8,
    fb_consistency_check,
)
from propainter_tpu.ops.interp import resize, avg_pool2d, max_pool2d
from propainter_tpu.ops.patches import unfold, fold, unfold_output_size
from propainter_tpu.ops.deform import modulated_deform_conv2d
from propainter_tpu.ops.corr import corr_pyramid, corr_lookup
