"""Per-stage diff between the torch reference orchestration and ours."""
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import jax
jax.config.update("jax_platforms", "cpu")  # never touch the shared TPU chip

import numpy as np
import torch
import jax.numpy as jnp

from tests.test_pipeline_parity import (
    _randomize, _make_video, reference_inpaint)
from tests.torch_ref import import_reference_module
from propainter_tpu.models.raft import RAFT, convert_raft_state_dict
from propainter_tpu.models.flow_completion import (
    RecurrentFlowCompleteNet, convert_flowcomp_state_dict)
from propainter_tpu.models.propainter import (
    InpaintGenerator, convert_inpaint_state_dict)
from propainter_tpu.pipeline import ProPainterPipeline, PipelineConfig

import argparse

raft_mod = import_reference_module("RAFT.raft")
fc_mod = import_reference_module("model.recurrent_flow_completion")
pp_mod = import_reference_module("model.propainter")

args = argparse.Namespace(small=False, mixed_precision=False,
                          alternate_corr=False)
torch.manual_seed(0)
raft_t = raft_mod.RAFT(args); raft_t.eval()
flowcomp_t = _randomize(fc_mod.RecurrentFlowCompleteNet(), seed=1)
flowcomp_t.eval()
gen_t = _randomize(pp_mod.InpaintGenerator(init_weights=True), seed=2)
gen_t.eval()

rng = np.random.default_rng(0)
T, H, W = 14, 128, 128
cfg = dict(ref_stride=3, neighbor_length=4, subvideo_length=8, raft_iter=5)

frames = _make_video(rng, T, H, W)
mask = np.zeros((T, H, W), np.uint8)
for t in range(T):
    if t in (0, 13):
        continue
    mask[t, 20 + 2 * t: 60 + 2 * t, 30 + 3 * t: 70 + 3 * t] = 1

# ---- torch stages ----
frames_pt = (torch.from_numpy(frames.astype(np.float32) / 255.0)
             .permute(0, 3, 1, 2)[None] * 2 - 1)
flow_masks_pt = torch.from_numpy(mask.astype(np.float32))[None, :, None]
masks_dil_pt = flow_masks_pt.clone()

with torch.no_grad():
    # stage 1 chunked
    clip = 12
    gt_f, gt_b = [], []
    def raft_bi(fr, iters):
        b, l_t, c, hh, ww = fr.size()
        f1 = fr[:, :-1].reshape(-1, c, hh, ww)
        f2 = fr[:, 1:].reshape(-1, c, hh, ww)
        _, ff = raft_t(f1, f2, iters=iters, test_mode=True)
        _, fb = raft_t(f2, f1, iters=iters, test_mode=True)
        return (ff.view(b, l_t - 1, 2, hh, ww),
                fb.view(b, l_t - 1, 2, hh, ww))
    for f in range(0, T, clip):
        end_f = min(T, f + clip)
        s = f if f == 0 else f - 1
        ff, fb = raft_bi(frames_pt[:, s:end_f], cfg["raft_iter"])
        gt_f.append(ff); gt_b.append(fb)
    gt_bi_t = (torch.cat(gt_f, 1), torch.cat(gt_b, 1))
    print("torch gt flows:", gt_bi_t[0].shape)

    # stage 2 chunked
    pred_f, pred_b = [], []
    pad_len = 5
    sub = cfg["subvideo_length"]
    FL = gt_bi_t[0].size(1)
    for f in range(0, FL, sub):
        s_f = max(0, f - pad_len)
        e_f = min(FL, f + sub + pad_len)
        ps = max(0, f) - s_f
        pe = e_f - min(FL, f + sub)
        sub_bi, _ = flowcomp_t.forward_bidirect_flow(
            (gt_bi_t[0][:, s_f:e_f], gt_bi_t[1][:, s_f:e_f]),
            flow_masks_pt[:, s_f:e_f + 1])
        sub_bi = flowcomp_t.combine_flow(
            (gt_bi_t[0][:, s_f:e_f], gt_bi_t[1][:, s_f:e_f]), sub_bi,
            flow_masks_pt[:, s_f:e_f + 1])
        pred_f.append(sub_bi[0][:, ps:e_f - s_f - pe])
        pred_b.append(sub_bi[1][:, ps:e_f - s_f - pe])
    pred_bi_t = (torch.cat(pred_f, 1), torch.cat(pred_b, 1))

    # stage 3 chunked
    masked_pt = frames_pt * (1 - masks_dil_pt)
    subi = min(100, sub)
    uf, um = [], []
    pad_len = 10
    for f in range(0, T, subi):
        s_f = max(0, f - pad_len)
        e_f = min(T, f + subi + pad_len)
        ps = max(0, f) - s_f
        pe = e_f - min(T, f + subi)
        b, t = masks_dil_pt[:, s_f:e_f].size()[:2]
        fsub = (pred_bi_t[0][:, s_f:e_f - 1], pred_bi_t[1][:, s_f:e_f - 1])
        prop_sub, upd_sub = gen_t.img_propagation(
            masked_pt[:, s_f:e_f], fsub, masks_dil_pt[:, s_f:e_f], 'nearest')
        ufr = (frames_pt[:, s_f:e_f] * (1 - masks_dil_pt[:, s_f:e_f])
               + prop_sub.view(b, t, 3, H, W) * masks_dil_pt[:, s_f:e_f])
        uf.append(ufr[:, ps:e_f - s_f - pe])
        um.append(upd_sub.view(b, t, 1, H, W)[:, ps:e_f - s_f - pe])
    updated_frames_t = torch.cat(uf, 1)
    updated_masks_t = torch.cat(um, 1)

# ---- jax stages ----
pipe = ProPainterPipeline(
    convert_raft_state_dict(raft_t.state_dict()),
    convert_flowcomp_state_dict(flowcomp_t.state_dict()),
    convert_inpaint_state_dict(gen_t.state_dict()),
    PipelineConfig(precision="fp32", **cfg))

frames_j = jnp.asarray(frames[None].astype(np.float32) / 255.0 * 2 - 1)
fm_j = jnp.asarray(mask[None, ..., None].astype(np.float32))

gt_bi_j = pipe.compute_flows(frames_j)
pred_bi_j = pipe.complete_flows(gt_bi_j, fm_j)
upd_frames_j, upd_masks_j = pipe.propagate_images(frames_j, pred_bi_j, fm_j)


def tdiff(name, jx, tt):
    a = np.asarray(jx)
    b = np.moveaxis(tt.numpy(), 2, -1)
    print(f"{name}: max|d|={np.abs(a - b).max():.5f} "
          f"mean|d|={np.abs(a - b).mean():.6f} shapes {a.shape} {b.shape}")

tdiff("gt_flow_f", gt_bi_j[0], gt_bi_t[0])
tdiff("gt_flow_b", gt_bi_j[1], gt_bi_t[1])
tdiff("pred_flow_f", pred_bi_j[0], pred_bi_t[0])
tdiff("pred_flow_b", pred_bi_j[1], pred_bi_t[1])
tdiff("updated_frames", upd_frames_j, updated_frames_t)
tdiff("updated_masks", upd_masks_j, updated_masks_t)

# ---- stage 4, window by window ----
from propainter_tpu.pipeline import get_ref_index as our_gri
ref_gri = import_reference_module("inference_propainter").get_ref_index

neighbor_stride = cfg["neighbor_length"] // 2
ref_num = sub // cfg["ref_stride"] if T > sub else -1
for f in range(0, T, neighbor_stride):
    nids = list(range(max(0, f - neighbor_stride),
                      min(T, f + neighbor_stride + 1)))
    r_ref = ref_gri(f, nids, T, cfg["ref_stride"], ref_num)
    r_our = our_gri(f, nids, T, cfg["ref_stride"], ref_num)
    print(f"f={f} nids={nids} refs ref={r_ref} ours={r_our}")
    l_t = len(nids)
    with torch.no_grad():
        sel = nids + r_ref
        pred_t = gen_t(updated_frames_t[:, sel],
                       (pred_bi_t[0][:, nids[:-1]],
                        pred_bi_t[1][:, nids[:-1]]),
                       masks_dil_pt[:, sel], updated_masks_t[:, sel], l_t)
    pred_j = pipe.inpaint.apply(
        {"params": pipe.inpaint_params},
        upd_frames_j[:, np.array(sel)],
        (pred_bi_j[0][:, np.array(nids[:-1])],
         pred_bi_j[1][:, np.array(nids[:-1])]),
        fm_j[:, np.array(sel)], upd_masks_j[:, np.array(sel)], l_t)
    a = np.asarray(pred_j)
    b = np.moveaxis(pred_t.view(1, -1, 3, H, W).numpy(), 2, -1)
    print(f"  window pred: max|d|={np.abs(a - b).max():.5f}")
