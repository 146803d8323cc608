"""Measure FlowMaskTracker IoU on the bmx-trees DAVIS fixture.

The reference bundles 80 frames + per-frame GT masks
(inputs/object_removal/bmx-trees{,_mask}) — the only in-repo tracking ground
truth. Seeds the tracker with the first GT mask and reports per-frame IoU of
the tracked mask vs GT, for the plain flow-warp tracker and the
fb-gated + GrabCut-re-anchored one. Results go into COVERAGE.md.

Usage: python tools/track_iou.py [--height 240 --width 432] [--cpu]
"""
import argparse
import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def load_seq(h, w):
    import cv2

    root = "/root/reference/inputs/object_removal"
    fdir, mdir = f"{root}/bmx-trees", f"{root}/bmx-trees_mask"
    names = sorted(os.listdir(fdir))
    frames, masks = [], []
    for n in names:
        f = cv2.cvtColor(cv2.imread(os.path.join(fdir, n)),
                         cv2.COLOR_BGR2RGB)
        base = os.path.splitext(n)[0]
        mp = None
        for ext in (".png", ".jpg"):
            c = os.path.join(mdir, base + ext)
            if os.path.exists(c):
                mp = c
        m = cv2.imread(mp, cv2.IMREAD_GRAYSCALE)
        frames.append(cv2.resize(f, (w, h), interpolation=cv2.INTER_AREA))
        masks.append((cv2.resize(m, (w, h),
                                 interpolation=cv2.INTER_NEAREST) > 127
                      ).astype(np.uint8))
    return np.stack(frames), np.stack(masks)


def iou(a, b):
    inter = np.logical_and(a, b).sum()
    union = np.logical_or(a, b).sum()
    return inter / max(union, 1)


def farneback_flow(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Classical dense flow a->b (dx, dy) — stand-in for trained RAFT in
    this weight-free environment; the tracker logic under test (warp,
    fb-gate, re-anchor) is identical either way."""
    import cv2

    ga = cv2.cvtColor(a, cv2.COLOR_RGB2GRAY)
    gb = cv2.cvtColor(b, cv2.COLOR_RGB2GRAY)
    return cv2.calcOpticalFlowFarneback(
        ga, gb, None, pyr_scale=0.5, levels=4, winsize=21, iterations=3,
        poly_n=7, poly_sigma=1.5, flags=0).astype(np.float32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=240)
    p.add_argument("--width", type=int, default=432)
    p.add_argument("--raft_iter", type=int, default=20)
    p.add_argument("--weights", default="weights/raft-things.pth",
                   help="raft checkpoint; falls back to Farneback flow "
                        "when absent (no released weights in this image)")
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from propainter_tpu.demo.tracking import FlowMaskTracker

    flow_kw: dict
    if os.path.exists(args.weights):
        from propainter_tpu.convert.torch_to_jax import load_torch_checkpoint
        from propainter_tpu.models.raft import convert_raft_state_dict

        flow_kw = dict(raft_params=convert_raft_state_dict(
            load_torch_checkpoint(args.weights)), raft_iter=args.raft_iter)
        print("flow: RAFT (trained weights)")
    else:
        flow_kw = dict(flow_fn=farneback_flow)
        print("flow: Farneback (no trained RAFT weights in this image)")

    frames, gt = load_seq(args.height, args.width)
    T = len(frames)

    for label, kw in (("flow-only", dict(reanchor=False)),
                      ("fb+reanchor", dict(reanchor=True))):
        tracker = FlowMaskTracker(**flow_kw, **kw)
        ious = []
        for t in range(T):
            m, _, _ = tracker.track(frames[t], gt[0] if t == 0 else None)
            if t > 0:
                ious.append(iou(m, gt[t]))
        ious = np.array(ious)
        print(f"{label}: mean IoU {ious.mean():.3f}  "
              f"median {np.median(ious):.3f}  last-10 {ious[-10:].mean():.3f} "
              f" min {ious.min():.3f}", flush=True)


if __name__ == "__main__":
    main()
