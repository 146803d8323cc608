"""End-to-end video inpainting pipeline (the reference's 4-stage schedule).

TPU-native re-design of reference inference_propainter.py:296-452:

  stage 1  bidirectional RAFT flow, fp32, chunked by clip length
  stage 2  flow completion, chunked by subvideo_length with 5-frame overlap
  stage 3  image propagation, chunked with 10-frame overlap
  stage 4  sliding-window feature propagation + transformer with global refs

Design notes:
  * every stage is jitted once per (static) chunk shape; chunk lengths are
    bucketed so long videos reuse the same compiled executable instead of
    recompiling per chunk;
  * all frames stay on device between stages (the reference round-trips to
    host per window in stage 4; we composite on device and transfer once);
  * the model runs bf16 on TPU when precision='bf16' (the reference's fp16
    switch, inference_propainter.py:333-337) — RAFT always fp32.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from propainter_tpu.models.raft import RAFT
from propainter_tpu.models.flow_completion import (
    RecurrentFlowCompleteNet,
    forward_bidirect_flow,
    combine_flow,
)
from propainter_tpu.models.propainter import (
    Encoder, InpaintGenerator, image_propagation)


def get_short_clip_len(width: int) -> int:
    """RAFT chunk length by width. Reference inference_propainter.py:302-309."""
    if width <= 640:
        return 12
    if width <= 720:
        return 8
    if width <= 1280:
        return 4
    return 2


def get_ref_index(mid_neighbor_id, neighbor_ids, length, ref_stride=10,
                  ref_num=-1):
    """Global reference frame selection. Reference inference_propainter.py:159-173."""
    ref_index = []
    if ref_num == -1:
        for i in range(0, length, ref_stride):
            if i not in neighbor_ids:
                ref_index.append(i)
    else:
        start_idx = max(0, mid_neighbor_id - ref_stride * (ref_num // 2))
        end_idx = min(length, mid_neighbor_id + ref_stride * (ref_num // 2))
        for i in range(start_idx, end_idx, ref_stride):
            if i not in neighbor_ids:
                if len(ref_index) > ref_num:
                    break
                ref_index.append(i)
    return ref_index


@dataclasses.dataclass
class PipelineConfig:
    ref_stride: int = 10
    neighbor_length: int = 10
    subvideo_length: int = 80
    raft_iter: int = 20
    precision: str = "fp32"  # 'fp32' | 'bf16'
    # stage-4 windows with identical shape can run as one batched generator
    # call (pad windows repeat an earlier window, weighted out of the
    # compositing average). Measured slower than per-window calls on one
    # v5e chip (HBM-bandwidth bound), so off by default; used for multi-chip
    # sharding where the window batch is split across devices.
    window_batch: int = 1
    # shard the embarrassingly-parallel batch axes (RAFT frame pairs,
    # stage-4 window batches) over all visible devices — the multi-chip
    # inference layout (SURVEY.md section 7.7: batch-of-windows sharding).
    shard_inference: bool = False
    # sparse window attention implementation.
    # 'flash' (default): dense dual-branch, with branch A's softmax fused in
    #   a pallas kernel whose K/V fit in VMEM whole — the (Tq, Tk) logits
    #   never hit HBM and the softmax runs in fp32 (measured 5.2 vs 6.4
    #   ms/block vs 'xla' in bf16, better numerics). Inference-only (no VJP).
    # 'xla': all (window, head) problems in one batched MXU einsum;
    #   differentiable — what training uses.
    # 'pallas': per-(window, head) streaming kernel — measured 6x SLOWER
    #   than 'xla' on v5e (one TensorCore: per-window grid programs
    #   serialize and under-fill the MXU); kept as an opt-in reference.
    attention_impl: str = "flash"


class ProPainterPipeline:
    """Holds the three model param trees and the jitted stage functions."""

    def __init__(self, raft_params, flowcomp_params, inpaint_params,
                 config: PipelineConfig | None = None):
        self.config = config or PipelineConfig()
        impl = self.config.attention_impl
        self.raft = RAFT(
            corr_volume_dtype=("bfloat16" if self.config.precision == "bf16"
                               else "float32"))
        self.flowcomp = RecurrentFlowCompleteNet()
        self.inpaint = InpaintGenerator(attention_impl=impl)
        self.raft_params = raft_params
        self.flowcomp_params = flowcomp_params
        self.inpaint_params = inpaint_params
        self._dtype = (jnp.bfloat16 if self.config.precision == "bf16"
                       else jnp.float32)
        if self._dtype != jnp.float32:
            cast = lambda t: jax.tree.map(
                lambda a: a.astype(self._dtype)
                if a.dtype == jnp.float32 else a, t)
            # RAFT stays fp32 (reference inference_propainter.py:311)
            self._flowcomp_params_c = cast(flowcomp_params)
            self._inpaint_params_c = cast(inpaint_params)
        else:
            self._flowcomp_params_c = flowcomp_params
            self._inpaint_params_c = inpaint_params

        self._batch_sharding = None
        if self.config.shard_inference and len(jax.devices()) > 1:
            from propainter_tpu.parallel.mesh import make_mesh, batch_sharding

            self._batch_sharding = batch_sharding(make_mesh())

        # params are passed as jit ARGUMENTS (not closure constants): XLA
        # cannot constant-fold the network away for degenerate weights, and
        # swapping checkpoints reuses the compiled executables
        self._raft_bi = jax.jit(self._raft_bi_fn, static_argnames=("iters",))
        self._complete_flow = jax.jit(self._complete_flow_fn)
        self._img_prop = jax.jit(self._img_prop_fn)
        self._generate = jax.jit(
            self._generate_fn, static_argnames=("l_t",),
            donate_argnums=(1, 2))
        self._finalize = jax.jit(self._finalize_fn)
        self._encode_all = jax.jit(self._encode_all_fn)

    # ---- stage fns -------------------------------------------------------

    def _raft_bi_fn(self, raft_params, frames, iters: int):
        """frames (B, T, H, W, 3) in [-1,1] -> (flows_f, flows_b) (B,T-1,H,W,2).
        Reference model/modules/flow_comp_raft.py:39-55."""
        B, T, H, W, C = frames.shape
        # encode each unique frame ONCE (the reference re-encodes frames up
        # to 4x across the fwd/bwd pair batches), then index pairs into one
        # batched GRU refinement: fwd pairs (t, t+1), bwd pairs (t+1, t).
        flat = frames.reshape(B * T, H, W, C)
        if self._batch_sharding is not None:
            flat = jax.lax.with_sharding_constraint(flat,
                                                    self._batch_sharding)
        fmap, net, inp = self.raft.apply(
            {"params": raft_params}, flat, method="encode")

        def pairs(x):
            x = x.reshape((B, T) + x.shape[1:])
            first = x[:, :-1].reshape((B * (T - 1),) + x.shape[2:])
            second = x[:, 1:].reshape((B * (T - 1),) + x.shape[2:])
            return first, second

        fm1, fm2 = pairs(fmap)
        nt1, nt2 = pairs(net)
        in1, in2 = pairs(inp)
        fmap1 = jnp.concatenate([fm1, fm2], axis=0)
        fmap2 = jnp.concatenate([fm2, fm1], axis=0)
        net_b = jnp.concatenate([nt1, nt2], axis=0)
        inp_b = jnp.concatenate([in1, in2], axis=0)
        if self._batch_sharding is not None:
            # pairs are independent: shard the pair axis across chips
            wsc = lambda x: jax.lax.with_sharding_constraint(
                x, self._batch_sharding)
            fmap1, fmap2, net_b, inp_b = map(wsc, (fmap1, fmap2, net_b,
                                                   inp_b))
        _, flow = self.raft.apply(
            {"params": raft_params}, fmap1, fmap2, net_b, inp_b,
            iters, method="refine")
        n = B * (T - 1)
        flows_f = flow[:n].reshape(B, T - 1, H, W, 2)
        flows_b = flow[n:].reshape(B, T - 1, H, W, 2)
        return flows_f, flows_b

    def _complete_flow_fn(self, fc_params, flows_f, flows_b, flow_masks):
        """Complete + combine flows for one chunk.
        Reference inference_propainter.py:350-356."""
        dt = self._dtype
        flows = (flows_f.astype(dt), flows_b.astype(dt))
        masks = flow_masks.astype(dt)

        def apply_fn(mf, mk, train):
            return self.flowcomp.apply({"params": fc_params}, mf, mk, train)

        pred, _ = forward_bidirect_flow(apply_fn, flows, masks)
        return combine_flow(flows, pred, masks)

    def _img_prop_fn(self, frames, flows_f, flows_b, masks_dilated):
        """Image propagation for one chunk.
        Reference inference_propainter.py:383-394."""
        dt = self._dtype
        frames = frames.astype(dt)
        masks = masks_dilated.astype(dt)
        masked_frames = frames * (1 - masks)
        prop, updated = image_propagation(
            masked_frames, flows_f.astype(dt), flows_b.astype(dt), masks,
            "nearest")
        updated_frames = frames * (1 - masks) + prop * masks
        return updated_frames, updated

    def _encode_all_fn(self, inpaint_params, frames, masks_in,
                       masks_updated):
        """Encode every frame ONCE (the encoder is per-frame; sliding
        windows would otherwise re-encode each frame up to 4x, as the
        reference does). Returns (B, T, h, w, c) features."""
        dt = self._dtype
        B, T, H, W, _ = frames.shape
        enc_in = jnp.concatenate(
            [frames.astype(dt), masks_in.astype(dt),
             masks_updated.astype(dt)], axis=-1)
        feat = Encoder().apply({"params": inpaint_params["encoder"]},
                               enc_in.reshape(B * T, H, W, 5))
        return feat.reshape((B, T) + feat.shape[1:])

    def _generate_fn(self, inpaint_params, comp_sum, comp_cnt,
                     selected_imgs, flows_f, flows_b,
                     selected_masks, selected_update_masks, frame_valid,
                     ids, w, ref_feat, l_t: int):
        """One sliding-window generator call, fused with the compositing
        accumulation (one dispatch per window — each jit call costs ~30 ms
        RTT over the axon tunnel).
        Reference inference_propainter.py:428-437. frame_valid masks padded
        reference frames (fixed window shapes -> one compile per l_t)."""
        dt = self._dtype
        if self._batch_sharding is not None:
            # windows are independent: shard the window-batch axis
            wsc = lambda x: jax.lax.with_sharding_constraint(
                x, self._batch_sharding)
            selected_imgs, flows_f, flows_b = map(
                wsc, (selected_imgs, flows_f, flows_b))
            selected_masks, selected_update_masks = map(
                wsc, (selected_masks, selected_update_masks))
        pred = self.inpaint.apply(
            {"params": inpaint_params},
            selected_imgs.astype(dt),
            (flows_f.astype(dt), flows_b.astype(dt)),
            selected_masks.astype(dt), selected_update_masks.astype(dt), l_t,
            frame_valid=frame_valid, precomputed_ref_feat=ref_feat)
        return self._accumulate_fn(comp_sum, comp_cnt,
                                   pred.astype(jnp.float32), ids, w)

    @staticmethod
    def _accumulate_fn(comp_sum, comp_cnt, pred, ids, w):
        """Accumulate a batch of windows' predictions on device.

        Double-visit frames are averaged at finalize — the reference
        (inference_propainter.py:443-450) averages 0.5/0.5 per visit;
        mean-of-visits is identical for <=2 visits up to uint8 rounding.
        w: (wb,) 1.0 for real windows, 0.0 for batch-padding duplicates.
        """
        img = (pred + 1.0) * 127.5  # [-1,1] -> [0,255]
        wex = w[:, None, None, None, None].astype(comp_sum.dtype)
        comp_sum = comp_sum.at[ids].add(img.astype(comp_sum.dtype) * wex)
        comp_cnt = comp_cnt.at[ids].add(
            jnp.broadcast_to(wex, ids.shape + (1, 1, 1)))
        return comp_sum, comp_cnt

    @staticmethod
    def _finalize_fn(comp_sum, comp_cnt, ori, masks):
        """Composite averaged predictions into the original frames.
        masks: (T, H, W, 1) binary. Returns (T, H, W, 3) uint8."""
        pred_avg = comp_sum / jnp.maximum(comp_cnt, 1.0)
        out = pred_avg * masks + ori * (1.0 - masks)
        return jnp.clip(out, 0.0, 255.0).astype(jnp.uint8)

    # ---- full pipeline ---------------------------------------------------

    def compute_flows(self, frames: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Stage 1: chunked bidirectional RAFT.
        Reference inference_propainter.py:302-330."""
        B, T, H, W, _ = frames.shape
        clip = get_short_clip_len(W)
        iters = self.config.raft_iter
        if T <= clip:
            return self._raft_bi(self.raft_params, frames, iters=iters)
        fs, bs = [], []
        for f in range(0, T, clip):
            end_f = min(T, f + clip)
            s = f if f == 0 else f - 1
            ff, fb = self._raft_bi(self.raft_params, frames[:, s:end_f], iters=iters)
            # overlap of 1 frame produces 1 duplicate flow at chunk joins
            if f != 0:
                pass  # chunk starts at f-1 so flows [s..end_f-2] start at f-1
            fs.append(ff)
            bs.append(fb)
        flows_f = jnp.concatenate(fs, axis=1)
        flows_b = jnp.concatenate(bs, axis=1)
        return flows_f, flows_b

    def complete_flows(self, gt_flows_bi, flow_masks):
        """Stage 2: chunked flow completion with 5-frame overlap trim.
        Reference inference_propainter.py:341-368."""
        flows_f, flows_b = gt_flows_bi
        flow_length = flows_f.shape[1]
        sub = self.config.subvideo_length
        if flow_length <= sub:
            return self._complete_flow(self._flowcomp_params_c, flows_f, flows_b, flow_masks)
        pred_f, pred_b = [], []
        pad_len = 5
        for f in range(0, flow_length, sub):
            s_f = max(0, f - pad_len)
            e_f = min(flow_length, f + sub + pad_len)
            pad_len_s = max(0, f) - s_f
            pad_len_e = e_f - min(flow_length, f + sub)
            pf, pb = self._complete_flow(
                self._flowcomp_params_c,
                flows_f[:, s_f:e_f], flows_b[:, s_f:e_f],
                flow_masks[:, s_f : e_f + 1])
            pred_f.append(pf[:, pad_len_s : e_f - s_f - pad_len_e])
            pred_b.append(pb[:, pad_len_s : e_f - s_f - pad_len_e])
        return (jnp.concatenate(pred_f, axis=1),
                jnp.concatenate(pred_b, axis=1))

    def propagate_images(self, frames, pred_flows_bi, masks_dilated):
        """Stage 3: chunked image propagation with 10-frame overlap trim.
        Reference inference_propainter.py:371-404."""
        T = frames.shape[1]
        sub = min(100, self.config.subvideo_length)
        flows_f, flows_b = pred_flows_bi
        if T <= sub:
            return self._img_prop(frames, flows_f, flows_b, masks_dilated)
        upd_frames, upd_masks = [], []
        pad_len = 10
        for f in range(0, T, sub):
            s_f = max(0, f - pad_len)
            e_f = min(T, f + sub + pad_len)
            pad_len_s = max(0, f) - s_f
            pad_len_e = e_f - min(T, f + sub)
            uf, um = self._img_prop(
                frames[:, s_f:e_f], flows_f[:, s_f : e_f - 1],
                flows_b[:, s_f : e_f - 1], masks_dilated[:, s_f:e_f])
            upd_frames.append(uf[:, pad_len_s : e_f - s_f - pad_len_e])
            upd_masks.append(um[:, pad_len_s : e_f - s_f - pad_len_e])
        return (jnp.concatenate(upd_frames, axis=1),
                jnp.concatenate(upd_masks, axis=1))

    def generate(self, updated_frames, pred_flows_bi, masks_dilated,
                 updated_masks, ori_frames: np.ndarray):
        """Stage 4: sliding-window transformer inference + compositing.
        Reference inference_propainter.py:407-452.

        Args:
          ori_frames: (T, H, W, 3) uint8 original frames (host).
        Returns:
          (T, H, W, 3) uint8 composited frames — a DEVICE array (callers
          that need host frames convert once; keeping it on device avoids
          paying the transfer in benchmarks/pipelines that keep going).
        """
        cfg = self.config
        B, video_length, H, W, _ = updated_frames.shape
        neighbor_stride = cfg.neighbor_length // 2
        if video_length > cfg.subvideo_length:
            ref_num = cfg.subvideo_length // cfg.ref_stride
        else:
            ref_num = -1

        # fixed reference-frame count: pad shorter ref lists (masked via
        # frame_valid, numerically exact) so every window with the same l_t
        # shares one compiled executable
        ref_pad = max(1, -(-min(video_length, cfg.subvideo_length)
                           // cfg.ref_stride))

        # on-device accumulation: predictions never round-trip to host per
        # window (the reference downloads every window,
        # inference_propainter.py:438); one uint8 transfer at the end.
        comp_sum = jnp.zeros((video_length, H, W, 3), jnp.float32)
        comp_cnt = jnp.zeros((video_length, 1, 1, 1), jnp.float32)
        flows_f, flows_b = pred_flows_bi
        assert B == 1, "stage 4 batches windows over the batch axis"
        # NOTE: one-shot whole-video encoding + per-window feature gather
        # measured SLOWER than re-encoding inside each window executable
        # (materialize+gather beats fused redundant encodes) — see PERF.md.
        # The GLOBAL reference frames are different: the same ~8 stride
        # frames repeat in EVERY window (16x redundant encodes), and their
        # features feed only attention keys — encode them once and gather.

        # build all windows, then group same-shape windows into batched
        # calls. Window refs index into the encoded ref-union (ref_pos);
        # padded slots point at union entry 0 and are masked by frame_valid.
        ref_union = sorted({rid
                            for f in range(0, video_length, neighbor_stride)
                            for rid in get_ref_index(
                                f,
                                list(range(max(0, f - neighbor_stride),
                                           min(video_length,
                                               f + neighbor_stride + 1))),
                                video_length, cfg.ref_stride, ref_num)})
        if not ref_union:
            # short videos can have no refs at all (every frame is a
            # neighbor); keep one dummy union entry for the padded
            # (frame_valid=False) slots
            ref_union = [0]
        ref_index = {rid: i for i, rid in enumerate(ref_union)}
        ru = np.asarray(ref_union, np.int32)
        ref_feat_all = self._encode_all(
            self._inpaint_params_c, updated_frames[:, ru],
            masks_dilated[:, ru], updated_masks[:, ru])[0]

        windows = []  # (neighbor_ids, ref_pos, frame_valid)
        for f in range(0, video_length, neighbor_stride):
            neighbor_ids = list(
                range(max(0, f - neighbor_stride),
                      min(video_length, f + neighbor_stride + 1)))
            ref_ids = get_ref_index(f, neighbor_ids, video_length,
                                    cfg.ref_stride, ref_num)
            l_t = len(neighbor_ids)
            n_valid_refs = len(ref_ids)
            ref_pos = ([ref_index[rid] for rid in ref_ids]
                       + [0] * (ref_pad - n_valid_refs))[:ref_pad]
            frame_valid = np.ones(l_t + ref_pad, np.bool_)
            frame_valid[l_t + min(n_valid_refs, ref_pad):] = False
            windows.append((neighbor_ids, ref_pos, frame_valid))

        groups: dict[int, list] = {}
        for wdw in windows:
            groups.setdefault(len(wdw[0]), []).append(wdw)

        wb = max(1, self.config.window_batch)
        for l_t, grp in groups.items():
            for start in range(0, len(grp), wb):
                batch = grp[start : start + wb]
                n_real = len(batch)
                if len(grp) > wb and n_real < wb:
                    # pad to the full batch by repeating windows: their
                    # predictions accumulate into sum AND count, so the
                    # final average is unchanged
                    batch = (batch * wb)[:wb]
                nb = np.array([w_[0] for w_ in batch], np.int32)  # (wb, l_t)
                rp = np.array([w_[1] for w_ in batch], np.int32)  # (wb, rpad)
                fv = np.array([w_[2] for w_ in batch])

                w = np.zeros(len(batch), np.float32)
                w[:n_real] = 1.0
                comp_sum, comp_cnt = self._generate(
                    self._inpaint_params_c, comp_sum, comp_cnt,
                    updated_frames[0, nb], flows_f[0, nb[:, :-1]],
                    flows_b[0, nb[:, :-1]], masks_dilated[0, nb],
                    updated_masks[0, nb], jnp.asarray(fv),
                    jnp.asarray(nb), jnp.asarray(w), ref_feat_all[rp], l_t)

        return self._finalize(
            comp_sum, comp_cnt,
            jnp.asarray(ori_frames.astype(np.float32)), masks_dilated[0])

    def inpaint_video(self, frames_np: np.ndarray, flow_masks_np: np.ndarray,
                      masks_dilated_np: np.ndarray,
                      timings: dict | None = None) -> list[np.ndarray]:
        """Full 4-stage pipeline.

        Args:
          frames_np: (T, H, W, 3) uint8.
          flow_masks_np / masks_dilated_np: (T, H, W) bool/uint8 (1 = hole).
          timings: optional dict that receives per-stage wall seconds
            (keys raft/flow_completion/image_propagation/generation) — the
            jax.profiler-friendly analogue of the reference's coarse
            cuda-synchronized timers (scripts/evaluate_propainter.py:100-184).
        Returns:
          list of (H, W, 3) uint8 inpainted frames.
        """
        import time

        frames = jnp.asarray(
            frames_np[None].astype(np.float32) / 255.0 * 2.0 - 1.0)
        flow_masks = jnp.asarray(
            flow_masks_np[None, ..., None].astype(np.float32))
        masks_dilated = jnp.asarray(
            masks_dilated_np[None, ..., None].astype(np.float32))

        def timed(key, fn):
            t0 = time.perf_counter()
            out = fn()
            jax.block_until_ready(out)
            if timings is not None:
                # 1-element readback: block_until_ready alone does not await
                # device completion on remote/tunneled backends
                np.asarray(jax.tree.leaves(out)[0].ravel()[0])
                timings[key] = timings.get(key, 0.0) + time.perf_counter() - t0
            return out

        gt_flows_bi = timed("raft", lambda: self.compute_flows(frames))
        pred_flows_bi = timed(
            "flow_completion",
            lambda: self.complete_flows(gt_flows_bi, flow_masks))
        updated_frames, updated_masks = timed(
            "image_propagation",
            lambda: self.propagate_images(frames, pred_flows_bi,
                                          masks_dilated))
        out_dev = timed(
            "generation",
            lambda: self.generate(updated_frames, pred_flows_bi,
                                  masks_dilated, updated_masks, frames_np))
        t0 = time.perf_counter()
        out_np = np.asarray(out_dev)
        if timings is not None:
            timings["readback"] = (timings.get("readback", 0.0)
                                   + time.perf_counter() - t0)
        return [out_np[i] for i in range(out_np.shape[0])]
