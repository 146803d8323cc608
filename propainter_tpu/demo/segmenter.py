"""Interactive SAM predictor — the demo's first-frame segmenter.

JAX/TPU counterpart of the reference's BaseSegmenter + SamPredictor stack
(web-demos/hugging_face/tools/base_segmenter.py:13-78, driving the external
`segment_anything` package): embed the image once, then serve any number of
point/mask prompts from two cached jit executables.

TPU-first design notes:
  * the image embedding (the expensive ViT pass) is computed once per image
    and stays on device; every click re-runs only the tiny prompt+decoder
    executable (ms-scale);
  * prompts are padded with SAM's own "not a point" embedding (label -1,
    SAM's native padding mechanism). Default: exactly ONE pad point, the
    reference SamPredictor's scheme (predictor.py `padding_point` when no
    box is given) — bit-matching prompts, one small decoder compile per
    distinct click count (jit caches by shape). Opt-in `points_bucket=k`
    pads every prompt to k tokens so a single executable serves all click
    counts; the extra pad tokens participate in decoder attention and
    perturb masks slightly (bounded by test_sam_parity.py's
    bucket-vs-exact test);
  * mask upsampling (256 -> 1024 -> original size) runs on device with
    torch-interpolate-semantics `ops.interp.resize`.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from propainter_tpu.models.sam import (
    Sam, SamConfig, sam_config_registry, SAM_PIXEL_MEAN, SAM_PIXEL_STD)
from propainter_tpu.ops.interp import resize


class SamSegmenter:
    """`BaseSegmenter`-compatible promptable segmentation.

    Same surface as the reference (tools/base_segmenter.py): `set_image`,
    `reset_image`, `predict(prompts, mode, multimask)` returning
    (masks (n, H, W) bool, scores (n,), logits (n, 256, 256)).
    """

    def __init__(self, params: dict, model_type: str = "vit_h",
                 points_bucket: Optional[int] = None,
                 config: Optional[SamConfig] = None):
        self.config = config or sam_config_registry[model_type]()
        self.model = Sam(self.config)
        self.params = params
        self.points_bucket = points_bucket
        self.embedded = False
        self._embedding = None
        self.orignal_image: Optional[np.ndarray] = None  # sic (reference)

        cfg = self.config
        size = cfg.img_size

        @jax.jit
        def _encode(params, image):
            return self.model.apply({"params": params}, image,
                                    method=Sam.encode_image)

        @partial(jax.jit, static_argnames=("with_mask",))
        def _decode(params, embedding, coords, labels, mask_input,
                    with_mask):
            masks, iou = self.model.apply(
                {"params": params}, embedding, coords, labels,
                mask_input if with_mask else None, method=Sam.decode)
            return masks, iou

        self._encode = _encode
        self._decode = _decode
        self._lowres = 4 * cfg.grid

    # -- image embedding ----------------------------------------------------

    @staticmethod
    def _preprocess_shape(h: int, w: int, long_side: int) -> tuple[int, int]:
        """ResizeLongestSide.get_preprocess_shape."""
        scale = long_side / max(h, w)
        return (int(h * scale + 0.5), int(w * scale + 0.5))

    def set_image(self, image: np.ndarray):
        """image (H, W, 3) uint8 RGB. Embeds once; repeat calls are no-ops
        until reset_image (reference BaseSegmenter.set_image:31-40)."""
        if self.embedded:
            print("repeat embedding, please reset_image.")
            return
        self.orignal_image = image
        cfg = self.config
        H, W = image.shape[:2]
        nh, nw = self._preprocess_shape(H, W, cfg.img_size)
        import cv2

        resized = cv2.resize(image, (nw, nh), interpolation=cv2.INTER_LINEAR)
        x = (resized.astype(np.float32) - SAM_PIXEL_MEAN) / SAM_PIXEL_STD
        pad = np.zeros((cfg.img_size, cfg.img_size, 3), np.float32)
        pad[:nh, :nw] = x
        self._embedding = self._encode(self.params, jnp.asarray(pad[None]))
        self.original_size = (H, W)
        self.input_size = (nh, nw)
        self.embedded = True

    def reset_image(self):
        self._embedding = None
        self.embedded = False

    # -- prompting ----------------------------------------------------------

    def _pack_points(self, coords, labels):
        """Scale click coords into model space and pad with label -1 (SAM's
        not-a-point embedding): exactly one pad token by default (reference
        SamPredictor semantics), or up to a fixed bucket when
        `points_bucket` is set (single executable, slight mask drift)."""
        n = 0 if coords is None else len(coords)
        if self.points_bucket is None:
            bucket = n + 1
        else:
            bucket = max(self.points_bucket, n + 1)
        c = np.zeros((1, bucket, 2), np.float32)
        l = np.full((1, bucket), -1, np.int32)
        if n:
            scale_h = self.input_size[0] / self.original_size[0]
            scale_w = self.input_size[1] / self.original_size[1]
            c[0, :n, 0] = np.asarray(coords, np.float32)[:, 0] * scale_w
            c[0, :n, 1] = np.asarray(coords, np.float32)[:, 1] * scale_h
            l[0, :n] = np.asarray(labels, np.int32)
        return jnp.asarray(c), jnp.asarray(l)

    def predict(self, prompts: dict, mode: str, multimask: bool = True):
        """Reference BaseSegmenter.predict:47-78.

        prompts keys: 'point_coords' (N, 2), 'point_labels' (N,),
        'mask_input' (1, 256, 256) logits. mode: 'point' | 'mask' | 'both'.
        Returns (masks (n, H, W) bool, scores (n,), logits (n, 256, 256)).
        """
        assert self.embedded, \
            "prediction is called before set_image (feature embedding)."
        assert mode in ("point", "mask", "both"), \
            "mode must be point, mask, or both"
        use_points = mode in ("point", "both")
        use_mask = mode in ("mask", "both")
        coords, labels = self._pack_points(
            prompts.get("point_coords") if use_points else None,
            prompts.get("point_labels") if use_points else None)
        if use_mask:
            mi = np.asarray(prompts["mask_input"], np.float32)
            mask_input = jnp.asarray(mi[..., None])  # (1, 256, 256, 1)
        else:
            mask_input = jnp.zeros((1, self._lowres, self._lowres, 1),
                                   jnp.float32)
        low_res, iou = self._decode(self.params, self._embedding, coords,
                                    labels, mask_input, with_mask=use_mask)
        sl = slice(1, None) if multimask else slice(0, 1)
        low_res = low_res[0, sl]    # (n, 256, 256)
        iou = iou[0, sl]
        masks = self._postprocess(low_res)
        return (np.asarray(masks) > 0.0, np.asarray(iou),
                np.asarray(low_res))

    def _postprocess(self, low_res):
        """SamPredictor postprocess_masks: 256 -> img_size, crop the
        unpadded region, -> original size."""
        cfg = self.config
        x = resize(low_res[..., None], (cfg.img_size, cfg.img_size))
        x = x[:, : self.input_size[0], : self.input_size[1]]
        x = resize(x, self.original_size)
        return x[..., 0]


class SamControler:
    """first_frame_click facade (reference tools/interact_tools.py:33-80):
    one call = embed (if needed) + predict + pick the best mask."""

    def __init__(self, segmenter: SamSegmenter):
        self.sam_controler = segmenter

    def first_frame_click(self, image: np.ndarray, points: np.ndarray,
                          labels: np.ndarray, multimask: bool = True,
                          box=None, mask_color: int = 3):
        """Returns (mask (H, W) uint8, logit (H, W) float32, painted).

        Matches the reference SamControler.first_frame_click
        (interact_tools.py:46-90): the dense-prompt refine pass ('both')
        runs only when the LAST click is positive, and the painted preview
        overlays the mask plus positive/negative click dots with the
        reference's palette indices."""
        from propainter_tpu.demo.painters import mask_painter, point_painter

        seg = self.sam_controler
        if not seg.embedded:
            seg.set_image(image)
        pts = np.asarray(points, np.float32).reshape(-1, 2)
        labs = np.asarray(labels, np.int32).reshape(-1)
        if box is not None:
            # box corners use SAM's corner embeddings (labels 2/3)
            x0, y0, x1, y1 = [float(v) for v in box]
            pts = np.concatenate(
                [pts, np.array([[x0, y0], [x1, y1]], np.float32)], 0)
            labs = np.concatenate([labs, np.array([2, 3], np.int32)])
        prompts = {"point_coords": pts, "point_labels": labs}
        masks, scores, logits = seg.predict(prompts, "point", multimask)
        best = int(np.argmax(scores))
        if labs[-1] == 1:
            # refine with the best mask as a dense prompt
            # (interact_tools.py:54-68)
            prompts["mask_input"] = logits[best][None]
            masks, scores, logits = seg.predict(prompts, "both", multimask)
            best = int(np.argmax(scores))
        mask = masks[best].astype(np.uint8)
        logit_full = np.asarray(
            resize(jnp.asarray(logits[best][..., None]),
                   seg.original_size))[..., 0]
        # reference paint constants (interact_tools.py:18-27)
        painted = mask_painter(image.copy(), mask, mask_color, 0.7, 2, 5)
        pos = pts[labs == 1].astype(int)   # box corners (2/3) aren't dots
        neg = pts[labs == 0].astype(int)
        if len(pos):
            painted = point_painter(painted, pos, 8, 0.9, 15, 2, 5)
        if len(neg):
            painted = point_painter(painted, neg, 50, 0.9, 15, 2, 5)
        return mask, logit_full.astype(np.float32), painted
