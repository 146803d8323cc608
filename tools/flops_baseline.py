"""Derive BASELINE_FPS (the A100-class estimate bench.py divides by) from
measured FLOPs.

Method: AOT-compile every pipeline stage executable at the benchmark shapes
(80 frames, 432x240, default settings) and sum XLA's cost analysis over the
calls one video makes. The reference's networks are numerically identical
(parity-tested), so its per-video FLOPs are the same up to orchestration
overhead. An A100 at fp16 peaks at 312 TFLOP/s dense; video-inpainting
inference (conv/attention mix, chunked stages, per-window python loop +
host round-trips in the reference) lands at ~10-20% MFU in practice —
E2FGVI/ProPainter-class pipelines measure ~0.1 s/frame on datacenter GPUs.

Prints per-stage FLOPs, totals, and the implied A100 fps band.

Run on the TPU (compiles are remote + persistently cached):
    python tools/flops_baseline.py
"""
import os
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")  # lowering-only: no TPU needed

import numpy as np
import jax.numpy as jnp

import bench
from propainter_tpu.pipeline import get_short_clip_len


def cost(jitted, *args, **kwargs):
    """XLA client-side HLO cost analysis on the lowered module (no backend
    compile)."""
    c = jitted.lower(*args, **kwargs).cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return float(c.get("flops", 0.0))


def main():
    T, H, W = bench.T, bench.H, bench.W
    pipe = bench.build_pipeline("bf16")
    frames_np, mask_np = bench.make_inputs()
    frames = jnp.asarray(frames_np[None].astype(np.float32) / 255 * 2 - 1)
    masks = jnp.asarray(mask_np[None, ..., None].astype(np.float32))

    total = 0.0

    # stage 1: RAFT chunks
    clip = get_short_clip_len(W)
    n_full = 0
    flops1 = 0.0
    for f in range(0, T, clip):
        s = f if f == 0 else f - 1
        e = min(T, f + clip)
        flops1 += cost(pipe._raft_bi, pipe.raft_params, frames[:, s:e],
                       iters=pipe.config.raft_iter)
        n_full += 1
    print(f"stage1 RAFT: {flops1/1e12:.2f} TFLOP ({n_full} chunks)")
    total += flops1

    # stage 2: flow completion (single chunk at T=80)
    ff = jnp.zeros((1, T - 1, H, W, 2))
    flops2 = cost(pipe._complete_flow, pipe._flowcomp_params_c, ff, ff, masks)
    print(f"stage2 flow completion: {flops2/1e12:.2f} TFLOP")
    total += flops2

    # stage 3: image propagation
    flops3 = cost(pipe._img_prop, frames, ff, ff, masks)
    print(f"stage3 image propagation: {flops3/1e12:.2f} TFLOP")
    total += flops3

    # stage 4: sum per-window generator lowerings over the window schedule
    from propainter_tpu.models.propainter import InpaintGenerator

    neighbor_stride = pipe.config.neighbor_length // 2
    windows = []
    for f in range(0, T, neighbor_stride):
        nids = list(range(max(0, f - neighbor_stride),
                          min(T, f + neighbor_stride + 1)))
        windows.append(len(nids))
    ref_pad = max(1, -(-min(T, pipe.config.subvideo_length)
                       // pipe.config.ref_stride))
    gen = pipe.inpaint
    per_lt = {}
    for l_t in sorted(set(windows)):
        Tw = l_t + ref_pad
        a = jnp.zeros((1, Tw, H, W, 3), jnp.bfloat16)
        fl = jnp.zeros((1, l_t - 1, H, W, 2), jnp.bfloat16)
        m = jnp.zeros((1, Tw, H, W, 1), jnp.bfloat16)
        fn = jax.jit(lambda p, a, fl, m, l_t=l_t: gen.apply(
            {"params": p}, a, (fl, fl), m, m, l_t))
        per_lt[l_t] = cost(fn, pipe._inpaint_params_c, a, fl, m)
    flops4 = sum(per_lt[l] for l in windows)
    print(f"stage4 generator: {flops4/1e12:.2f} TFLOP "
          f"({len(windows)} windows, per-l_t {per_lt})")
    total += flops4

    per_frame = total / T
    print(f"TOTAL per video: {total/1e12:.2f} TFLOP; "
          f"per frame: {per_frame/1e9:.1f} GFLOP")
    for mfu in (0.1, 0.15, 0.2, 0.3):
        print(f"A100 fp16 @ {int(mfu*100)}% MFU: "
              f"{312e12*mfu/per_frame:.1f} fps")


if __name__ == "__main__":
    main()
