"""DAVIS / YouTube-VOS evaluation harness.

Equivalent of reference scripts/evaluate_propainter.py: per-video staged
pipeline (unchunked flow completion / propagation, neighbor_length=20
default), per-frame PSNR/SSIM, per-video I3D activations -> final VFID,
per-frame wall time, results written to
results_eval/{dataset}_rs_{ref_stride}_nl_{neighbor_length}/metrics.txt.

Usage:
  python -m propainter_tpu.cli.evaluate --dataset davis \
      --video_root <path>/JPEGImages --mask_root <path>/test_masks \
      --json_path datasets/davis/test.json [--weights weights]
      [--task video_completion|object_removal] [--save_results]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def build_argparser():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="davis",
                   choices=["davis", "youtube-vos"])
    p.add_argument("--video_root", required=True)
    p.add_argument("--mask_root", required=True)
    p.add_argument("--json_path", default=None)
    p.add_argument("--height", type=int, default=240)
    p.add_argument("--width", type=int, default=432)
    p.add_argument("--ref_stride", type=int, default=10)
    p.add_argument("--neighbor_length", type=int, default=20)
    p.add_argument("--subvideo_length", type=int, default=-1,
                   help="-1 (default) = UNCHUNKED flow completion and image "
                        "propagation, the reference eval protocol "
                        "(scripts/evaluate_propainter.py:127-131 runs both "
                        "whole-video; RAFT still chunks by 60 frames, :108). "
                        "Set a positive value to eval under the inference "
                        "chunking schedule instead.")
    p.add_argument("--raft_iter", type=int, default=20)
    p.add_argument("--task", default="video_completion",
                   choices=["video_completion", "object_removal"])
    p.add_argument("--weights", default="weights")
    p.add_argument("--i3d_path", default="weights/i3d_rgb_imagenet.pt")
    p.add_argument("--save_results", action="store_true")
    p.add_argument("--output", default="results_eval")
    p.add_argument("--max_videos", type=int, default=-1)
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="write a jax.profiler trace of the 2nd video "
                        "(post-compile) to DIR")
    p.add_argument("--warp_error", action="store_true",
                   help="also compute E_warp on the inpainted output "
                        "(native; the reference delegates this to an "
                        "external repo, README.md:281)")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)

    from propainter_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax.numpy as jnp
    import jax

    from propainter_tpu.cli.inference import load_params
    from propainter_tpu.core.dataset import TestDataset
    from propainter_tpu.core.metrics import (
        calc_psnr_and_ssim, calculate_vfid)
    from propainter_tpu.pipeline import ProPainterPipeline, PipelineConfig

    json_path = args.json_path or os.path.join(
        "datasets", args.dataset, "test.json")
    dataset = TestDataset(args.video_root, args.mask_root, json_path,
                          w=args.width, h=args.height)

    params = load_params(args.weights)
    # reference eval protocol: whole-video stages 2+3 + uncapped refs
    # (unchunked=True), RAFT chunked by 60 frames
    # (scripts/evaluate_propainter.py:29-34,108,127-137)
    unchunked = args.subvideo_length <= 0
    pipe = ProPainterPipeline(
        params["raft"], params["flowcomp"], params["inpaint"],
        PipelineConfig(ref_stride=args.ref_stride,
                       neighbor_length=args.neighbor_length,
                       subvideo_length=(80 if unchunked
                                        else args.subvideo_length),
                       unchunked=unchunked,
                       raft_clip_len=60 if unchunked else None,
                       raft_iter=args.raft_iter))

    i3d_apply = None
    if args.task == "video_completion" and os.path.exists(args.i3d_path):
        from propainter_tpu.models.i3d import (
            InceptionI3d, convert_i3d_state_dict)
        from propainter_tpu.convert.torch_to_jax import load_torch_checkpoint

        i3d = InceptionI3d()
        i3d_params = convert_i3d_state_dict(
            load_torch_checkpoint(args.i3d_path))
        i3d_apply = jax.jit(
            lambda v: i3d.apply({"params": i3d_params}, v))

    out_dir = os.path.join(
        args.output,
        f"{args.dataset}_rs_{args.ref_stride}_nl_{args.neighbor_length}")
    os.makedirs(out_dir, exist_ok=True)

    all_psnr, all_ssim, all_ewarp = [], [], []
    real_acts, fake_acts = [], []
    total_frames, total_time = 0, 0.0

    n = len(dataset) if args.max_videos < 0 else min(args.max_videos,
                                                     len(dataset))
    for vi in range(n):
        item = dataset[vi]
        frames, masks = item["frames"], item["masks"]
        name = item["video_name"]

        stage_times: dict = {}
        profiling = args.profile and vi == 1  # 2nd video: compiles are warm
        if profiling:
            jax.profiler.start_trace(args.profile)
        t0 = time.perf_counter()
        comp = pipe.inpaint_video(frames, masks, masks, timings=stage_times)
        dt = time.perf_counter() - t0
        if profiling:
            jax.profiler.stop_trace()
            print(f"profiler trace written to {args.profile}")
        total_frames += len(frames)
        total_time += dt

        if args.task == "video_completion":
            for gt, pred in zip(frames, comp):
                psnr, ssim = calc_psnr_and_ssim(
                    gt.astype(np.float64), pred.astype(np.float64))
                all_psnr.append(psnr)
                all_ssim.append(ssim)
            if i3d_apply is not None:
                gt_v = jnp.asarray(
                    frames[None].astype(np.float32) / 255.0 * 2 - 1)
                pr = np.stack(comp)
                pr_v = jnp.asarray(pr[None].astype(np.float32) / 255.0 * 2 - 1)
                real_acts.append(np.asarray(i3d_apply(gt_v)).ravel())
                fake_acts.append(np.asarray(i3d_apply(pr_v)).ravel())

        if args.warp_error:
            from propainter_tpu.core.metrics import calculate_warping_error

            comp_arr = np.stack(comp)
            comp_dev = jnp.asarray(
                comp_arr[None].astype(np.float32) / 255.0 * 2 - 1)
            ewf, ewb = pipe.compute_flows(comp_dev)
            all_ewarp.append(calculate_warping_error(
                comp_arr, np.asarray(ewf[0]), np.asarray(ewb[0])))

        if args.save_results:
            from propainter_tpu.utils.video import write_frames
            write_frames(comp, os.path.join(out_dir, name))

        stages = " ".join(f"{k}={v:.2f}s" for k, v in stage_times.items())
        msg = (f"[{vi + 1}/{n}] {name}: {len(frames)} frames, "
               f"{dt / len(frames):.3f} s/frame [{stages}]")
        if all_psnr:
            msg += f", psnr {np.mean(all_psnr):.4f}, ssim {np.mean(all_ssim):.4f}"
        print(msg, flush=True)

    lines = [
        f"task: {args.task}",
        f"videos: {n}",
        f"avg s/frame: {total_time / max(total_frames, 1):.4f}",
    ]
    if all_psnr:
        lines += [f"psnr: {np.mean(all_psnr):.4f}",
                  f"ssim: {np.mean(all_ssim):.4f}"]
    if all_ewarp:
        lines.append(f"ewarp: {np.mean(all_ewarp):.6f}")
    if real_acts:
        vfid = calculate_vfid(real_acts, fake_acts)
        lines.append(f"vfid: {vfid:.4f}")
    report = "\n".join(lines)
    with open(os.path.join(out_dir, f"{args.dataset}_metrics.txt"), "w") as f:
        f.write(report + "\n")
    print(report)


if __name__ == "__main__":
    main()
