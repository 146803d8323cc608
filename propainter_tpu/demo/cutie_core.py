"""Cutie inference engine: working-memory VOS tracking, host-driven.

Equivalent of the reference's InferenceCore + MemoryManager +
KeyValueMemoryStore in the web demo configuration
(web-demos/hugging_face/tracker/inference/*, tracker/config/__init__.py:1:
use_long_term=False, mem_every=5, max_mem_frames=5, top_k=30,
stagger_updates=5). The demo path keeps a single object bucket with all
objects registered on the first frame:

  * permanent memory: the first annotated frame's tokens, never evicted
    (KeyValueMemoryStore as_permanent='first');
  * working memory: FIFO over subsequent memory frames, capped at
    (max_mem_frames-1) frames' worth of tokens;
  * object memory: streaming-summed object summaries (memory_manager.py
    add_memory streaming average);
  * sensory memory: per-object GRU state updated on staggered frames.

Simplifications vs the reference (documented, demo-equivalent):
  * all objects must be provided with the first mask (the demo's flow);
    incremental object addition (inference_core.py:260-286) is out of scope;
  * no long-term memory consolidation (the demo config never enables it);
  * no flip augmentation / internal resizing (demo defaults off).

The memory token axis grows by HW tokens per memory frame and is then FIFO-
trimmed, so at most max_mem_frames distinct shapes compile.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from propainter_tpu.models.cutie import (
    CUTIE, CutieConfig, get_similarity, topk_softmax, readout)


def pad_divide_by(x: np.ndarray, d: int = 16):
    """Center-pad (H, W, ...) to multiples of d
    (reference tracker/utils/tensor_utils.py:7-25)."""
    h, w = x.shape[:2]
    new_h = h + (d - h % d) % d
    new_w = w + (d - w % d) % d
    lh = (new_h - h) // 2
    uh = new_h - h - lh
    lw = (new_w - w) // 2
    uw = new_w - w - lw
    pad = ((lh, uh), (lw, uw)) + ((0, 0),) * (x.ndim - 2)
    return np.pad(x, pad), (lh, uh, lw, uw)


def unpad(x: np.ndarray, pads):
    lh, uh, lw, uw = pads
    return x[lh : x.shape[0] - uh or None, lw : x.shape[1] - uw or None]


@dataclasses.dataclass
class CutieCoreConfig:
    mem_every: int = 5
    max_mem_frames: int = 5
    top_k: int = 30
    stagger_updates: int = 5


class CutieCore:
    """step(image, mask=None) -> (num_objects+1, H, W) probabilities."""

    def __init__(self, params, model_config: CutieConfig | None = None,
                 config: CutieCoreConfig | None = None):
        self.cfg = config or CutieCoreConfig()
        self.model = CUTIE(model_config or CutieConfig())
        self.params = params
        m = self.model

        def bind(method):
            return jax.jit(lambda *a: m.apply({"params": params}, *a,
                                              method=method))

        self._encode_image = bind("encode_image")
        self._transform_key = bind("transform_key")
        self._encode_mask = bind("encode_mask")
        self._read_first = bind("read_first")
        self._segment = jax.jit(
            lambda *a: m.apply({"params": params}, *a, method="segment"),
            static_argnums=(5,))  # update_sensory is control flow

        @jax.jit
        def _read_visual(mem_key, mem_shrinkage, mem_value, qk, qe):
            B, Ck, h, w = (qk.shape[0], qk.shape[-1], qk.shape[1],
                           qk.shape[2])
            # NHWC key maps -> (B, Ck, P)
            qk_f = qk.reshape(qk.shape[0], -1, qk.shape[-1]).transpose(
                0, 2, 1)
            qe_f = qe.reshape(qe.shape[0], -1, qe.shape[-1]).transpose(
                0, 2, 1)
            sim = get_similarity(mem_key, mem_shrinkage, qk_f, qe_f)
            aff = topk_softmax(sim, self.cfg.top_k)
            out = readout(aff, mem_value)  # (B, N, C, P)
            return out.transpose(0, 1, 3, 2).reshape(
                mem_value.shape[0], mem_value.shape[1], qk.shape[1],
                qk.shape[2], mem_value.shape[2])

        self._read_visual = _read_visual
        self.clear_memory()

        # stagger schedule (inference_core.py:36-40)
        if self.cfg.stagger_updates >= self.cfg.mem_every:
            self._stagger_ti = set(range(1, self.cfg.mem_every + 1))
        else:
            self._stagger_ti = set(
                np.round(np.linspace(1, self.cfg.mem_every,
                                     self.cfg.stagger_updates)).astype(int))

    # ---- state -----------------------------------------------------------

    def clear_memory(self):
        self.curr_ti = -1
        self.last_mem_ti = 0
        self.engaged = False
        self.mem_key = None  # (1, Ck, N_tokens)
        self.mem_shrinkage = None  # (1, 1, N_tokens)
        self.mem_value = None  # (1, N_obj, Cv, N_tokens)
        self.perm_tokens = 0
        self.obj_v = None  # (1, N_obj, Q, C+1) streaming sums
        self.sensory = None  # (1, N_obj, h, w, Cs)
        self.last_mask = None  # (1, N_obj, Hp, Wp)

    # ---- memory ops ------------------------------------------------------

    def _add_memory(self, image_j, pix_feat, prob, key, shrinkage,
                    is_deep_update=True):
        """memory_manager.add_memory + encode_mask
        (inference_core.py:70-120)."""
        if self.sensory is None:
            h, w = key.shape[1:3]
            n_obj = prob.shape[1]
            self.sensory = jnp.zeros(
                (1, n_obj, h, w, self.model.config.sensory_dim))
        value, sensory, summaries = self._encode_mask(
            image_j, pix_feat, self.sensory, prob)
        if is_deep_update:
            self.sensory = sensory

        # flatten tokens: (1, Ck, N) / (1, N_obj, Cv, N)
        kf = key.reshape(1, -1, key.shape[-1]).transpose(0, 2, 1)
        sf = shrinkage.reshape(1, -1, 1).transpose(0, 2, 1)
        vf = value.reshape(value.shape[0], value.shape[1], -1,
                           value.shape[-1]).transpose(0, 1, 3, 2)
        if self.mem_key is None:
            self.mem_key, self.mem_shrinkage, self.mem_value = kf, sf, vf
            self.perm_tokens = kf.shape[-1]  # as_permanent='first'
        else:
            self.mem_key = jnp.concatenate([self.mem_key, kf], -1)
            self.mem_shrinkage = jnp.concatenate(
                [self.mem_shrinkage, sf], -1)
            self.mem_value = jnp.concatenate([self.mem_value, vf], -1)
            # FIFO trim of non-permanent tokens
            # (kv_memory_store.remove_old_memory). The non-permanent cap is
            # (cfg.max_mem_frames - 1) * hw, matching the reference exactly:
            # memory_manager.py:38 sets self.max_mem_frames =
            # cfg.max_mem_frames - 1 (the permanent first frame no longer
            # counts), then :230 max_work_tokens = self.max_mem_frames * HW.
            # Parity-checked past the first trim (28-frame
            # test_inference_core_step_parity).
            hw = key.shape[1] * key.shape[2]
            max_work = (self.cfg.max_mem_frames - 1) * hw
            excess = (self.mem_key.shape[-1] - self.perm_tokens) - max_work
            if excess > 0:
                p = self.perm_tokens
                keep = lambda x: jnp.concatenate(
                    [x[..., :p], x[..., p + excess :]], -1)
                self.mem_key = keep(self.mem_key)
                self.mem_shrinkage = keep(self.mem_shrinkage)
                self.mem_value = keep(self.mem_value)

        # streaming object-summary average (memory_manager.py:246-268)
        if self.obj_v is None:
            self.obj_v = summaries
        else:
            self.obj_v = self.obj_v + summaries
        self.engaged = True
        self.last_mem_ti = self.curr_ti

    # ---- main step -------------------------------------------------------

    def step(self, image: np.ndarray, mask: Optional[np.ndarray] = None
             ) -> np.ndarray:
        """image (H, W, 3) uint8/float; mask (N_obj, H, W) binary on the
        first (annotation) frame, None afterwards.
        Returns (N_obj+1, H, W) probabilities (channel 0 = background)."""
        self.curr_ti += 1
        img = np.asarray(image, np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        img_p, pads = pad_divide_by(img, 16)
        image_j = jnp.asarray(img_p[None])  # (1, Hp, Wp, 3)

        is_mem_frame = ((self.curr_ti - self.last_mem_ti >= self.cfg.mem_every)
                        or (mask is not None))
        need_segment = mask is None
        update_sensory = ((self.curr_ti - self.last_mem_ti)
                          in self._stagger_ti)

        (f16, f8, f4), pix_feat = self._encode_image(image_j)
        key, shrinkage, selection = self._transform_key(f16)

        if need_segment:
            assert self.engaged, "call step(image, mask) first"
            visual = self._read_visual(self.mem_key, self.mem_shrinkage,
                                       self.mem_value, key, selection)
            mem_readout = self._read_first(
                pix_feat, visual, self.sensory, self.last_mask,
                self.obj_v[:, :, None])
            sensory, prob_with_bg = self._segment(
                f16, f8, f4, mem_readout, self.sensory, update_sensory)
            if update_sensory:
                self.sensory = sensory
            pred_prob_with_bg = prob_with_bg[0]  # (N+1, Hp, Wp)
        else:
            from propainter_tpu.models.cutie import aggregate

            m, _ = pad_divide_by(
                np.moveaxis(np.asarray(mask, np.float32), 0, -1), 16)
            m = jnp.asarray(np.moveaxis(m, -1, 0))  # (N, Hp, Wp)
            logits = aggregate(m[None], axis=1)[0]
            pred_prob_with_bg = jax.nn.softmax(logits, axis=0)

        self.last_mask = pred_prob_with_bg[None, 1:]  # (1, N, Hp, Wp)

        if is_mem_frame:
            self._add_memory(image_j, pix_feat, self.last_mask, key,
                             shrinkage, is_deep_update=True)

        out = np.moveaxis(np.asarray(pred_prob_with_bg), 0, -1)
        out = unpad(out, pads)
        return np.moveaxis(out, -1, 0)
