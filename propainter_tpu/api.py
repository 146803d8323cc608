"""Library-style inpainting API (the web demo's ProInpainter facade).

Equivalent of reference web-demos/hugging_face/inpainter/base_inpainter.py:163
(`ProInpainter.inpaint`): numpy frames + masks in, inpainted frames out, with
the same knobs (ratio, dilate_radius, raft_iter, subvideo_length,
neighbor_length, ref_stride). The SAM/Cutie interactive tracking layers live
in models/sam.py + models/cutie.py with demo/tracking.TrackingFacade as the
composition point; this facade is the inpainting integration point a UI
plugs into.
"""

from __future__ import annotations

import numpy as np

from propainter_tpu.pipeline import ProPainterPipeline, PipelineConfig
from propainter_tpu.utils.masks import binary_dilation_cross


class ProInpainter:
    def __init__(self, params: dict, precision: str = "bf16"):
        """params: {'raft': ..., 'flowcomp': ..., 'inpaint': ...}."""
        self.params = params
        self.precision = precision
        # pipelines cached per config: repeated inpaint() calls (the demo's
        # slider loop) reuse the jitted stage executables instead of paying
        # a fresh trace+compile each time
        self._pipelines: dict[tuple, ProPainterPipeline] = {}

    def _pipeline(self, ref_stride, neighbor_length, subvideo_length,
                  raft_iter) -> ProPainterPipeline:
        key = (ref_stride, neighbor_length, subvideo_length, raft_iter)
        pipe = self._pipelines.get(key)
        if pipe is None:
            pipe = ProPainterPipeline(
                self.params["raft"], self.params["flowcomp"],
                self.params["inpaint"],
                PipelineConfig(ref_stride=ref_stride,
                               neighbor_length=neighbor_length,
                               subvideo_length=subvideo_length,
                               raft_iter=raft_iter,
                               precision=self.precision))
            self._pipelines[key] = pipe
        return pipe

    def inpaint(
        self,
        frames: np.ndarray,
        masks: np.ndarray,
        ratio: float = 1.0,
        dilate_radius: int = 4,
        raft_iter: int = 20,
        subvideo_length: int = 80,
        neighbor_length: int = 10,
        ref_stride: int = 10,
    ) -> np.ndarray:
        """Inpaint masked regions.

        Args:
          frames: (T, H, W, 3) uint8.
          masks: (T, H, W) or (T, H, W, 1) bool/uint8 (1 = remove).
          ratio: resize scale for processing.
        Returns:
          (T, H', W', 3) uint8 inpainted frames at the processing size.
        """
        import cv2

        if masks.ndim == 4:
            masks = masks[..., 0]
        T, H, W = masks.shape

        w = int(W * ratio) // 8 * 8
        h = int(H * ratio) // 8 * 8
        if (w, h) != (W, H):
            frames = np.stack([
                cv2.resize(f, (w, h), interpolation=cv2.INTER_LINEAR)
                for f in frames])
            masks = np.stack([
                cv2.resize(m.astype(np.uint8), (w, h),
                           interpolation=cv2.INTER_NEAREST) for m in masks])

        flow_masks = np.stack([
            binary_dilation_cross(m, dilate_radius) for m in masks])
        masks_dilated = flow_masks

        pipe = self._pipeline(ref_stride, neighbor_length, subvideo_length,
                              raft_iter)
        out = pipe.inpaint_video(frames, flow_masks, masks_dilated)
        return np.stack(out)
