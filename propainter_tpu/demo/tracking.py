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
    """Video object mask tracking by optical-flow warping with
    forward-backward consistency gating and appearance re-anchoring.

    Per frame:
      1. warp the running mask with backward RAFT flow
         (mask_t = mask_{t-1} sampled at x + flow_{t->t-1}(x));
      2. gate by fb-consistency (|f_bwd + warp(f_fwd)| small — same check the
         inpainting pipeline's image propagation uses): inconsistent pixels
         (occlusions/disocclusions) keep a soft vote instead of a hard one;
      3. re-anchor appearance with GrabCut seeded from the warped mask
         (eroded core = FG, dilated complement = BG) — pulls the boundary
         back to the object every frame, so warp drift does not accumulate;
         falls back to the pure flow mask when GrabCut degenerates.

    Flow comes from the same frozen RAFT the inpainting pipeline uses — no
    extra model weights needed (the reference instead vendors the 3.6k-LoC
    Cutie tracker, tracker/base_tracker.py:17; see COVERAGE.md for the
    measured IoU gap vs Cutie-grade tracking).
    """

    def __init__(self, raft_params=None, raft_iter: int = 20,
                 threshold: float = 0.5, close_kernel: int = 5,
                 reanchor: bool = True, flow_fn=None,
                 fb_alpha1: float = 0.01, fb_alpha2: float = 0.5):
        """raft_params: converted raft-things.pth params (production flow).
        flow_fn: optional override `(frame_a, frame_b) -> (H, W, 2)` pixel
        flow a->b (e.g. a classical estimator for weight-free environments);
        when given, raft_params is unused."""
        import jax

        self.raft_iter = raft_iter
        self.threshold = threshold
        self.close_kernel = close_kernel
        self.reanchor = reanchor
        self.fb_alpha1 = fb_alpha1
        self.fb_alpha2 = fb_alpha2

        if flow_fn is not None:
            self._pair_flows = lambda a, b: (flow_fn(a, b), flow_fn(b, a))
        else:
            assert raft_params is not None
            from propainter_tpu.models.raft import RAFT
            import jax.numpy as jnp

            raft = RAFT()

            def _raft_pair(a8, b8):
                a = jnp.asarray(a8[None].astype(np.float32) / 255 * 2 - 1)
                b = jnp.asarray(b8[None].astype(np.float32) / 255 * 2 - 1)
                flow = self._raft_fn(
                    jnp.concatenate([a, b], 0), jnp.concatenate([b, a], 0))
                f = np.asarray(flow)
                return f[0], f[1]

            self._raft_fn = jax.jit(
                lambda x, y: raft.apply({"params": raft_params}, x, y,
                                        iters=self.raft_iter)[1])
            self._pair_flows = _raft_pair

        def _gate(mask, flow_ab, flow_ba):
            """Warp the mask along a->b flow and fb-consistency-gate it
            (reference model/propainter.py:22-31 fbConsistencyCheck)."""
            import jax.numpy as jnp
            from propainter_tpu.ops.warp import flow_warp

            fab = flow_ab[None]
            fba = flow_ba[None]
            fwd_at_a = flow_warp(fba, fab, "bilinear")
            err = jnp.sum(jnp.square(fab + fwd_at_a), -1, keepdims=True)
            mag = (jnp.sum(jnp.square(fab), -1, keepdims=True)
                   + jnp.sum(jnp.square(fwd_at_a), -1, keepdims=True))
            valid = (err < self.fb_alpha1 * mag + self.fb_alpha2).astype(
                jnp.float32)
            soft = flow_warp(mask[None, ..., None], fab, "bilinear")
            return soft[0, ..., 0], valid[0, ..., 0]

        self._gate_fn = jax.jit(_gate)
        self._prev_frame: np.ndarray | None = None
        self._mask: np.ndarray | None = None

    def clear_memory(self):
        """Reset tracking state (reference BaseTracker.clear_memory)."""
        self._prev_frame = None
        self._mask = None

    def _grabcut_refine(self, frame: np.ndarray,
                        mask: np.ndarray) -> np.ndarray:
        """Appearance re-anchor: GrabCut seeded by the flow-warped mask."""
        import cv2

        area = int(mask.sum())
        if area < 16:
            return mask
        r = max(3, int(np.sqrt(area) * 0.15))
        k = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (2 * r + 1,) * 2)
        core = cv2.erode(mask, k)
        halo = cv2.dilate(mask, k)
        if core.sum() == 0:
            core = mask
        gc = np.full(mask.shape, cv2.GC_BGD, np.uint8)
        gc[halo > 0] = cv2.GC_PR_BGD
        gc[mask > 0] = cv2.GC_PR_FGD
        gc[core > 0] = cv2.GC_FGD
        bgd = np.zeros((1, 65), np.float64)
        fgd = np.zeros((1, 65), np.float64)
        bgr = frame[..., ::-1].copy()
        try:
            cv2.grabCut(bgr, gc, None, bgd, fgd, 3, cv2.GC_INIT_WITH_MASK)
        except cv2.error:
            return mask
        ref = ((gc == cv2.GC_FGD) | (gc == cv2.GC_PR_FGD)).astype(np.uint8)
        # sanity: reject blow-ups/collapses (textureless scenes confuse the
        # color model) and keep the flow answer instead
        if not (0.3 * area <= ref.sum() <= 2.5 * area):
            return mask
        return ref

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

        if first_frame_annotation is not None:
            self._mask = (np.asarray(first_frame_annotation) > 0).astype(
                np.uint8)
            self._prev_frame = frame
            logit = self._mask.astype(np.float32)
            return self._mask, logit, paint_mask(frame, self._mask)

        assert self._mask is not None, "call track(frame, template) first"
        flow_ab, flow_ba = self._pair_flows(frame, self._prev_frame)
        soft, valid = self._gate_fn(
            jnp.asarray(self._mask.astype(np.float32)),
            jnp.asarray(np.asarray(flow_ab, np.float32)),
            jnp.asarray(np.asarray(flow_ba, np.float32)))
        soft_np = np.asarray(soft)
        valid_np = np.asarray(valid)
        # consistent pixels vote hard; occluded ones keep a weaker vote so
        # the object is not eaten frame-by-frame at motion boundaries
        score = soft_np * (0.5 + 0.5 * valid_np)
        mask = (score > self.threshold * 0.5).astype(np.uint8)
        if self.close_kernel:
            k = cv2.getStructuringElement(
                cv2.MORPH_ELLIPSE, (self.close_kernel, self.close_kernel))
            mask = cv2.morphologyEx(mask, cv2.MORPH_CLOSE, k)
        if self.reanchor:
            mask = self._grabcut_refine(frame, mask)
        self._mask = mask
        self._prev_frame = frame
        return mask, soft_np, paint_mask(frame, mask)


class CutieTracker:
    """Memory-based VOS tracking with the Cutie model (JAX port,
    models/cutie.py + demo/cutie_core.py) — the real counterpart of the
    reference's BaseTracker (tracker/base_tracker.py:17,53), same per-frame
    track() API. Requires converted cutie-base-mega.pth params."""

    def __init__(self, cutie_params, **core_kwargs):
        from propainter_tpu.demo.cutie_core import CutieCore, CutieCoreConfig

        self._core = CutieCore(
            cutie_params,
            config=CutieCoreConfig(**core_kwargs) if core_kwargs else None)
        self._labels: list[int] | None = None

    def clear_memory(self):
        self._core.clear_memory()
        self._labels = None

    def track(self, frame: np.ndarray, first_frame_annotation=None):
        """frame (H, W, 3) uint8; first_frame_annotation (H, W) int labels
        on the first call (0 = background). Returns (mask, logit, painted)
        like the reference BaseTracker.track."""
        if first_frame_annotation is not None:
            ann = np.asarray(first_frame_annotation)
            # MaskMapper equivalent (tracker/utils/mask_mapper.py): split an
            # id-mask into per-object binary channels
            self._labels = [int(v) for v in np.unique(ann) if v != 0]
            if not self._labels:
                self._labels = [1]
            masks = np.stack([(ann == l).astype(np.float32)
                              for l in self._labels])
            prob = self._core.step(frame, masks)
        else:
            assert self._labels is not None, "seed with an annotation first"
            prob = self._core.step(frame)
        idx = np.argmax(prob, axis=0)  # 0 = background
        mask = np.zeros(idx.shape, np.uint8)
        for i, l in enumerate(self._labels):
            mask[idx == i + 1] = l
        logit = 1.0 - prob[0]
        return mask, logit.astype(np.float32), paint_mask(frame, mask)


class TrackingFacade:
    """Compose segmenter + tracker + inpainter.

    Mirrors reference TrackingAnything (track_anything.py:9-35):
    `first_frame_click` seeds a mask, `generator` tracks it through all
    frames, `inpaint` removes the object. With converted Cutie weights in
    `params['cutie']` the memory-based CutieTracker is used (the reference's
    tracker); otherwise the weight-free FlowMaskTracker stands in.
    """

    def __init__(self, params: dict, segmenter=None, tracker=None,
                 precision: str = "bf16", sam_model_type: str = "vit_h"):
        from propainter_tpu.api import ProInpainter

        if segmenter is None:
            if params.get("sam") is not None:
                from propainter_tpu.demo.segmenter import (
                    SamSegmenter, SamControler)

                segmenter = SamControler(SamSegmenter(
                    params["sam"], model_type=sam_model_type))
            else:
                segmenter = ClickSegmenter()
        self.segmenter = segmenter
        if tracker is None:
            tracker = (CutieTracker(params["cutie"])
                       if params.get("cutie") is not None
                       else FlowMaskTracker(params["raft"]))
        self.tracker = tracker
        self.inpainter = ProInpainter(params, precision=precision)

    def first_frame_click(self, image, points, labels, box=None):
        return self.segmenter.first_frame_click(image, points, labels,
                                                box=box)

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


def load_demo_params(weights_dir: str) -> tuple[dict, str]:
    """Load the inpainting bundle plus the demo's optional segmenter/tracker
    checkpoints (the reference demo downloads sam_vit_h_4b8939.pth and
    cutie-base-mega.pth next to the ProPainter weights,
    web-demos/hugging_face/app.py).

    Returns (params, sam_model_type). Missing demo checkpoints degrade
    gracefully: no SAM -> GrabCut ClickSegmenter, no Cutie -> FlowMaskTracker.
    """
    import glob
    import os

    from propainter_tpu.cli.inference import load_params

    params = dict(load_params(weights_dir))
    sam_type = "vit_h"
    if weights_dir != "random":
        cutie = os.path.join(weights_dir, "cutie-base-mega.pth")
        if os.path.exists(cutie):
            from propainter_tpu.models.cutie import load_cutie_params

            params["cutie"] = load_cutie_params(cutie)
        sams = sorted(glob.glob(os.path.join(weights_dir, "sam_vit_*.pth")))
        if sams:
            from propainter_tpu.models.sam import load_sam_params

            name = os.path.basename(sams[-1])
            for t in ("vit_b", "vit_l", "vit_h"):
                if name.startswith(f"sam_{t}"):
                    sam_type = t
            params["sam"] = load_sam_params(sams[-1], sam_type)
    return params, sam_type


def paint_mask(image: np.ndarray, mask: np.ndarray,
               color=(255, 63, 63), alpha: float = 0.5) -> np.ndarray:
    """Overlay a mask on an image (reference tools/painter.py behavior)."""
    out = image.astype(np.float32).copy()
    m = (np.asarray(mask) > 0)[..., None].astype(np.float32)
    out = out * (1 - m * alpha) + np.asarray(color, np.float32) * m * alpha
    return out.astype(np.uint8)
