"""END-TO-END pipeline parity: the full 4-stage orchestration vs the torch
reference.

Module-level parity tests prove each model matches; this test proves the
*orchestration* matches: RAFT chunk joins (1-frame overlap), flow-completion
pad-5 chunk trim, image-propagation pad-10 chunk trim, sliding-window
schedule, reference-frame selection/padding, double-visit averaging and
uint8 compositing. The reference's staged loop lives in an unimportable
``if __name__ == '__main__'`` block (inference_propainter.py:296-452), so
``reference_inpaint`` below transcribes it faithfully (line citations inline)
and runs it with the same randomly-initialized weights our pipeline gets via
the mechanical converter.

Tolerance: generate() reproduces the reference's sequential compositing
exactly (comp = comp/2 + img/2, uint8-truncated per visit,
inference_propainter.py:441-449), so the compositing scheme itself
contributes zero error; the <=2 uint8 LSB allowance covers only fp drift
accumulated through the 4 stages (conv-order and fusion differences between
XLA and torch), which crosses a truncation boundary on a few pixels.
"""

import argparse

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from propainter_tpu.models.raft import RAFT, convert_raft_state_dict
from propainter_tpu.models.flow_completion import (
    RecurrentFlowCompleteNet, convert_flowcomp_state_dict)
from propainter_tpu.models.propainter import (
    InpaintGenerator, convert_inpaint_state_dict)
from propainter_tpu.pipeline import ProPainterPipeline, PipelineConfig
from tests.torch_ref import import_reference_module


def _randomize(model, seed=0):
    """Fan-in-scaled random weights (same recipe as the module parity tests)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            fan_in = int(np.prod(p.shape[1:])) if p.ndim > 1 else 1
            p.copy_(torch.randn(p.shape, generator=g) / max(fan_in, 1) ** 0.5)
    return model


def reference_inpaint(frames_np, flow_masks_np, masks_dilated_np,
                      raft, flowcomp, gen, *, ref_stride, neighbor_length,
                      subvideo_length, raft_iter):
    """The reference's staged inference, transcribed from
    inference_propainter.py:296-452 (fp32 path, compositing included).

    frames_np: (T, H, W, 3) uint8; masks: (T, H, W) {0,1} float/uint8.
    Returns list of (H, W, 3) uint8 frames.
    """
    get_ref_index = import_reference_module("inference_propainter").get_ref_index

    device = torch.device("cpu")
    T, h, w, _ = frames_np.shape
    frames = (torch.from_numpy(
        frames_np.astype(np.float32) / 255.0).permute(0, 3, 1, 2)[None]
        * 2 - 1).to(device)
    flow_masks = torch.from_numpy(
        flow_masks_np.astype(np.float32))[None, :, None]
    masks_dilated = torch.from_numpy(
        masks_dilated_np.astype(np.float32))[None, :, None]
    video_length = T

    with torch.no_grad():
        # ---- stage 1: chunked RAFT (inference_propainter.py:302-330) ----
        if w <= 640:
            short_clip_len = 12
        elif w <= 720:
            short_clip_len = 8
        elif w <= 1280:
            short_clip_len = 4
        else:
            short_clip_len = 2

        def raft_bi(fr, iters):
            # RAFT_bi.forward (model/modules/flow_comp_raft.py:39-55)
            b, l_t, c, hh, ww = fr.size()
            f1 = fr[:, :-1].reshape(-1, c, hh, ww)
            f2 = fr[:, 1:].reshape(-1, c, hh, ww)
            _, ff = raft(f1, f2, iters=iters, test_mode=True)
            _, fb = raft(f2, f1, iters=iters, test_mode=True)
            return (ff.view(b, l_t - 1, 2, hh, ww),
                    fb.view(b, l_t - 1, 2, hh, ww))

        if video_length > short_clip_len:
            gt_f, gt_b = [], []
            for f in range(0, video_length, short_clip_len):
                end_f = min(video_length, f + short_clip_len)
                s = f if f == 0 else f - 1
                ff, fb = raft_bi(frames[:, s:end_f], raft_iter)
                gt_f.append(ff)
                gt_b.append(fb)
            gt_flows_bi = (torch.cat(gt_f, dim=1), torch.cat(gt_b, dim=1))
        else:
            gt_flows_bi = raft_bi(frames, raft_iter)

        # ---- stage 2: chunked flow completion (:341-368) ----
        flow_length = gt_flows_bi[0].size(1)
        if flow_length > subvideo_length:
            pred_f, pred_b = [], []
            pad_len = 5
            for f in range(0, flow_length, subvideo_length):
                s_f = max(0, f - pad_len)
                e_f = min(flow_length, f + subvideo_length + pad_len)
                pad_len_s = max(0, f) - s_f
                pad_len_e = e_f - min(flow_length, f + subvideo_length)
                sub, _ = flowcomp.forward_bidirect_flow(
                    (gt_flows_bi[0][:, s_f:e_f], gt_flows_bi[1][:, s_f:e_f]),
                    flow_masks[:, s_f:e_f + 1])
                sub = flowcomp.combine_flow(
                    (gt_flows_bi[0][:, s_f:e_f], gt_flows_bi[1][:, s_f:e_f]),
                    sub, flow_masks[:, s_f:e_f + 1])
                pred_f.append(sub[0][:, pad_len_s:e_f - s_f - pad_len_e])
                pred_b.append(sub[1][:, pad_len_s:e_f - s_f - pad_len_e])
            pred_flows_bi = (torch.cat(pred_f, dim=1),
                             torch.cat(pred_b, dim=1))
        else:
            pred_flows_bi, _ = flowcomp.forward_bidirect_flow(
                gt_flows_bi, flow_masks)
            pred_flows_bi = flowcomp.combine_flow(
                gt_flows_bi, pred_flows_bi, flow_masks)

        # ---- stage 3: chunked image propagation (:371-404) ----
        masked_frames = frames * (1 - masks_dilated)
        subvideo_length_img_prop = min(100, subvideo_length)
        if video_length > subvideo_length_img_prop:
            updated_frames, updated_masks = [], []
            pad_len = 10
            for f in range(0, video_length, subvideo_length_img_prop):
                s_f = max(0, f - pad_len)
                e_f = min(video_length,
                          f + subvideo_length_img_prop + pad_len)
                pad_len_s = max(0, f) - s_f
                pad_len_e = e_f - min(video_length,
                                      f + subvideo_length_img_prop)
                b, t = masks_dilated[:, s_f:e_f].size()[:2]
                flows_sub = (pred_flows_bi[0][:, s_f:e_f - 1],
                             pred_flows_bi[1][:, s_f:e_f - 1])
                prop_sub, upd_masks_sub = gen.img_propagation(
                    masked_frames[:, s_f:e_f], flows_sub,
                    masks_dilated[:, s_f:e_f], 'nearest')
                upd_frames_sub = (
                    frames[:, s_f:e_f] * (1 - masks_dilated[:, s_f:e_f])
                    + prop_sub.view(b, t, 3, h, w)
                    * masks_dilated[:, s_f:e_f])
                updated_frames.append(
                    upd_frames_sub[:, pad_len_s:e_f - s_f - pad_len_e])
                updated_masks.append(
                    upd_masks_sub.view(b, t, 1, h, w)
                    [:, pad_len_s:e_f - s_f - pad_len_e])
            updated_frames = torch.cat(updated_frames, dim=1)
            updated_masks = torch.cat(updated_masks, dim=1)
        else:
            b, t = masks_dilated.size()[:2]
            prop_imgs, upd_local = gen.img_propagation(
                masked_frames, pred_flows_bi, masks_dilated, 'nearest')
            updated_frames = (frames * (1 - masks_dilated)
                              + prop_imgs.view(b, t, 3, h, w) * masks_dilated)
            updated_masks = upd_local.view(b, t, 1, h, w)

        # ---- stage 4: sliding-window generation + compositing (:407-452) ----
        ori_frames = [frames_np[i] for i in range(T)]
        comp_frames = [None] * video_length
        neighbor_stride = neighbor_length // 2
        if video_length > subvideo_length:
            ref_num = subvideo_length // ref_stride
        else:
            ref_num = -1

        for f in range(0, video_length, neighbor_stride):
            neighbor_ids = list(
                range(max(0, f - neighbor_stride),
                      min(video_length, f + neighbor_stride + 1)))
            ref_ids = get_ref_index(f, neighbor_ids, video_length,
                                    ref_stride, ref_num)
            selected_imgs = updated_frames[:, neighbor_ids + ref_ids]
            selected_masks = masks_dilated[:, neighbor_ids + ref_ids]
            selected_update_masks = updated_masks[:, neighbor_ids + ref_ids]
            selected_pred_flows_bi = (
                pred_flows_bi[0][:, neighbor_ids[:-1]],
                pred_flows_bi[1][:, neighbor_ids[:-1]])
            l_t = len(neighbor_ids)
            pred_img = gen(selected_imgs, selected_pred_flows_bi,
                           selected_masks, selected_update_masks, l_t)
            pred_img = pred_img.view(-1, 3, h, w)
            pred_img = (pred_img + 1) / 2
            pred_img = pred_img.cpu().permute(0, 2, 3, 1).numpy() * 255
            binary_masks = masks_dilated[0, neighbor_ids].cpu().permute(
                0, 2, 3, 1).numpy().astype(np.uint8)
            for i in range(len(neighbor_ids)):
                idx = neighbor_ids[i]
                img = (np.array(pred_img[i]).astype(np.uint8)
                       * binary_masks[i]
                       + ori_frames[idx] * (1 - binary_masks[i]))
                if comp_frames[idx] is None:
                    comp_frames[idx] = img
                else:
                    comp_frames[idx] = (
                        comp_frames[idx].astype(np.float32) * 0.5
                        + img.astype(np.float32) * 0.5)
                comp_frames[idx] = comp_frames[idx].astype(np.uint8)
    return comp_frames


@pytest.fixture(scope="module")
def torch_models():
    raft_mod = import_reference_module("RAFT.raft")
    fc_mod = import_reference_module("model.recurrent_flow_completion")
    pp_mod = import_reference_module("model.propainter")

    args = argparse.Namespace(small=False, mixed_precision=False,
                              alternate_corr=False)
    torch.manual_seed(0)
    raft = raft_mod.RAFT(args)  # default torch init: sane flow numerics
    raft.eval()
    flowcomp = _randomize(fc_mod.RecurrentFlowCompleteNet(), seed=1)
    flowcomp.eval()
    gen = _randomize(pp_mod.InpaintGenerator(init_weights=True), seed=2)
    gen.eval()
    return raft, flowcomp, gen


def _make_video(rng, T, H, W):
    """Smooth random video: low-frequency content upsampled 8x, so sub-pixel
    flow differences between frameworks stay sub-LSB after warping (random
    per-pixel noise would chaotically amplify any fp drift)."""
    import cv2

    small = rng.uniform(0, 255, (T, H // 8, W // 8, 3)).astype(np.float32)
    frames = np.stack([
        cv2.resize(small[t], (W, H), interpolation=cv2.INTER_CUBIC)
        for t in range(T)])
    return np.clip(frames, 0, 255).astype(np.uint8)


def test_full_pipeline_parity(torch_models, rng):
    raft_t, flowcomp_t, gen_t = torch_models
    # T > 12 forces RAFT chunking (clip len 12 @ w<=640); H, W >= 128 keeps
    # the coarsest corr-pyramid level >= 2x2 (smaller degenerates to NaN in
    # BOTH frameworks)
    T, H, W = 14, 128, 128
    cfg = dict(ref_stride=3, neighbor_length=4, subvideo_length=8,
               raft_iter=5)

    frames = _make_video(rng, T, H, W)
    mask = np.zeros((T, H, W), np.uint8)
    for t in range(T):  # moving hole; 2 frames fully clean (sparse windows)
        if t in (0, 13):
            continue
        mask[t, 20 + 2 * t : 60 + 2 * t, 30 + 3 * t : 70 + 3 * t] = 1

    ref_out = reference_inpaint(frames, mask, mask, raft_t, flowcomp_t,
                                gen_t, **cfg)

    pipe = ProPainterPipeline(
        convert_raft_state_dict(raft_t.state_dict()),
        convert_flowcomp_state_dict(flowcomp_t.state_dict()),
        convert_inpaint_state_dict(gen_t.state_dict()),
        PipelineConfig(precision="fp32", **cfg))
    ours = pipe.inpaint_video(frames, mask, mask)

    assert len(ours) == len(ref_out) == T
    worst = 0
    for t, (a, b) in enumerate(zip(ours, ref_out)):
        d = np.abs(a.astype(np.int32) - b.astype(np.int32))
        worst = max(worst, int(d.max()))
        # outside the mask both equal the original exactly
        outside = mask[t] == 0
        assert d[outside].max() == 0, f"frame {t}: mismatch outside mask"
    # 2 LSB uint8-rounding envelope (see module docstring) + fp drift
    assert worst <= 2, f"max per-pixel deviation {worst} > 2 uint8 LSB"
