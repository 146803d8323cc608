"""Segment -> track -> inpaint facade for interactive object removal.

Re-designs the reference demo stack (web-demos/hugging_face/track_anything.py:9
TrackingAnything = SAM + Cutie + ProInpainter) with self-contained,
TPU-friendly defaults:

  * ClickSegmenter — first-frame mask from clicks/boxes via cv2 GrabCut
    (the SAM slot; same `first_frame_click(image, points, labels)` shape as
    tools/base_segmenter.py:13).
  * FlowMaskTracker — propagates the first-frame mask through the video by
    warping with RAFT optical flow + per-frame re-binarization and
    morphological closing (the Cutie slot; same per-frame `track()` API as
    tracker/base_tracker.py:17,53).
  * TrackingFacade — composes the two with ProInpainter (api.py), mirroring
    TrackingAnything's first_frame_click/generator/inpaint flow.

A SAM or Cutie port can be dropped in by implementing the same two methods.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


class ClickSegmenter:
    """First-frame interactive segmentation via GrabCut.

    API mirrors the reference SamControler facade
    (web-demos/hugging_face/tools/interact_tools.py): positive/negative
    points (labels 1/0) and an optional box seed the foreground model.
    """

    def __init__(self, iterations: int = 5, seed_radius: int = 12):
        self.iterations = iterations
        self.seed_radius = seed_radius

    def first_frame_click(
        self,
        image: np.ndarray,
        points: np.ndarray,
        labels: np.ndarray,
        box: Sequence[int] | None = None,
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """
        Args:
          image: (H, W, 3) uint8 RGB.
          points: (N, 2) [x, y] click coordinates.
          labels: (N,) 1 = foreground, 0 = background.
          box: optional [x0, y0, x1, y1] bounding box.
        Returns:
          (mask (H, W) uint8, logit (H, W) float32 soft mask, painted image).
        """
        import cv2

        H, W = image.shape[:2]
        gc_mask = np.full((H, W), cv2.GC_PR_BGD, np.uint8)
        if box is not None:
            x0, y0, x1, y1 = [int(v) for v in box]
            gc_mask[:] = cv2.GC_BGD
            gc_mask[y0:y1, x0:x1] = cv2.GC_PR_FGD
        for (x, y), lab in zip(np.asarray(points, int),
                               np.asarray(labels, int)):
            val = cv2.GC_FGD if lab == 1 else cv2.GC_BGD
            cv2.circle(gc_mask, (int(x), int(y)), self.seed_radius, int(val),
                       -1)
        bgd = np.zeros((1, 65), np.float64)
        fgd = np.zeros((1, 65), np.float64)
        bgr = cv2.cvtColor(image, cv2.COLOR_RGB2BGR)
        try:
            cv2.grabCut(bgr, gc_mask, None, bgd, fgd, self.iterations,
                        cv2.GC_INIT_WITH_MASK)
        except cv2.error:
            # degenerate seeds (e.g. all-foreground): fall back to the seeds
            pass
        mask = ((gc_mask == cv2.GC_FGD) | (gc_mask == cv2.GC_PR_FGD)).astype(
            np.uint8)
        logit = cv2.GaussianBlur(mask.astype(np.float32), (9, 9), 0)
        return mask, logit, paint_mask(image, mask)


class FlowMaskTracker:
    """Video object mask tracking by optical-flow warping.

    Warps the running mask frame-to-frame with backward RAFT flow
    (mask_t = mask_{t-1} sampled at x + flow_{t->t-1}(x)), then re-binarizes
    and closes small holes. Flow comes from the same frozen RAFT the
    inpainting pipeline uses — no extra model weights needed (the reference
    instead vendors the 3.6k-LoC Cutie tracker, tracker/base_tracker.py:17).
    """

    def __init__(self, raft_params, raft_iter: int = 20, threshold: float = 0.5,
                 close_kernel: int = 5):
        import jax
        from propainter_tpu.models.raft import RAFT

        self._raft = RAFT()
        self._params = raft_params
        self.raft_iter = raft_iter
        self.threshold = threshold
        self.close_kernel = close_kernel
        self._flow_fn = jax.jit(
            lambda a, b: self._raft.apply({"params": self._params}, a, b,
                                          iters=self.raft_iter)[1])
        self._template: np.ndarray | None = None
        self._prev_frame: np.ndarray | None = None
        self._mask: np.ndarray | None = None

    def clear_memory(self):
        """Reset tracking state (reference BaseTracker.clear_memory)."""
        self._template = None
        self._prev_frame = None
        self._mask = None

    def track(self, frame: np.ndarray, first_frame_annotation=None):
        """Track one frame. First call must pass the template mask.

        Args:
          frame: (H, W, 3) uint8.
          first_frame_annotation: (H, W) mask on the first call.
        Returns:
          (mask (H, W) uint8, logit (H, W) float32, painted image) — the
          reference BaseTracker.track return shape.
        """
        import cv2
        import jax.numpy as jnp
        from propainter_tpu.ops.warp import flow_warp

        if first_frame_annotation is not None:
            self._mask = (np.asarray(first_frame_annotation) > 0).astype(
                np.uint8)
            self._prev_frame = frame
            logit = self._mask.astype(np.float32)
            return self._mask, logit, paint_mask(frame, self._mask)

        assert self._mask is not None, "call track(frame, template) first"
        a = jnp.asarray(
            frame[None].astype(np.float32) / 255.0 * 2 - 1)
        b = jnp.asarray(
            self._prev_frame[None].astype(np.float32) / 255.0 * 2 - 1)
        flow = self._flow_fn(a, b)  # frame -> prev
        soft = flow_warp(
            jnp.asarray(self._mask[None, ..., None].astype(np.float32)),
            flow, "bilinear")
        soft_np = np.asarray(soft[0, ..., 0])
        mask = (soft_np > self.threshold).astype(np.uint8)
        if self.close_kernel:
            k = cv2.getStructuringElement(
                cv2.MORPH_ELLIPSE, (self.close_kernel, self.close_kernel))
            mask = cv2.morphologyEx(mask, cv2.MORPH_CLOSE, k)
        self._mask = mask
        self._prev_frame = frame
        return mask, soft_np, paint_mask(frame, mask)


class TrackingFacade:
    """Compose segmenter + tracker + inpainter.

    Mirrors reference TrackingAnything (track_anything.py:9-35):
    `first_frame_click` seeds a mask, `generator` tracks it through all
    frames, `inpaint` removes the object.
    """

    def __init__(self, params: dict, segmenter=None, tracker=None,
                 precision: str = "bf16"):
        from propainter_tpu.api import ProInpainter

        self.segmenter = segmenter or ClickSegmenter()
        self.tracker = tracker or FlowMaskTracker(params["raft"])
        self.inpainter = ProInpainter(params, precision=precision)

    def first_frame_click(self, image, points, labels, box=None):
        return self.segmenter.first_frame_click(image, points, labels, box)

    def generator(self, images: Sequence[np.ndarray],
                  template_mask: np.ndarray):
        """Track template_mask through images.
        Returns (masks, logits, painted_images) like the reference."""
        masks, logits, painted = [], [], []
        self.tracker.clear_memory()
        for i, img in enumerate(images):
            m, l, p = self.tracker.track(
                img, template_mask if i == 0 else None)
            masks.append(m)
            logits.append(l)
            painted.append(p)
        return masks, logits, painted

    def inpaint(self, frames: np.ndarray, masks: np.ndarray, **kw):
        return self.inpainter.inpaint(np.asarray(frames), np.asarray(masks),
                                      **kw)


def paint_mask(image: np.ndarray, mask: np.ndarray,
               color=(255, 63, 63), alpha: float = 0.5) -> np.ndarray:
    """Overlay a mask on an image (reference tools/painter.py behavior)."""
    out = image.astype(np.float32).copy()
    m = (np.asarray(mask) > 0)[..., None].astype(np.float32)
    out = out * (1 - m * alpha) + np.asarray(color, np.float32) * m * alpha
    return out.astype(np.uint8)
