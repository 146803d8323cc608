"""Generic utilities (L1): flow IO, image/video IO, masks, resizing."""

from propainter_tpu.utils.flow_io import flowread, flowwrite, resize_flow
from propainter_tpu.utils.masks import (
    binary_dilation_cross,
    read_masks,
    prepare_outpainting,
)
from propainter_tpu.utils.video import (
    read_frames,
    resize_frames,
    write_video,
    write_frames,
)
