"""Video inpainting CLI — flag-compatible with the reference driver.

Usage (same flags as reference inference_propainter.py:181-217):
  python -m propainter_tpu.cli.inference -i <video|frame_dir> -m <mask|mask_dir> \
      [-o results] [--resize_ratio r] [--height H --width W] [--mask_dilation 4]
      [--ref_stride 10] [--neighbor_length 10] [--subvideo_length 80]
      [--raft_iter 20] [--mode video_inpainting|video_outpainting]
      [--scale_h 1.0 --scale_w 1.2] [--save_fps 24] [--save_frames] [--bf16]

Outputs masked_in.mp4 and inpaint_out.mp4 under <output>/<video_name>/, like
the reference (inference_propainter.py:455-472).

Weights: pass --weights DIR containing orbax-converted params, or the
reference's .pth files (raft-things.pth, recurrent_flow_completion.pth,
ProPainter.pth) which are converted on the fly.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def load_params(weights_dir: str):
    """Load (raft, flowcomp, inpaint) params from a weights directory.

    Prefers pre-converted orbax checkpoints (subdirs raft/, flowcomp/,
    inpaint/); falls back to converting the reference's .pth files.
    'random' loads random-initialized params (pipeline smoke runs without
    released checkpoints).
    """
    from propainter_tpu.checkpoints import load_params_bundle, save_params_bundle

    if weights_dir == "random":
        import jax
        import jax.numpy as jnp
        from propainter_tpu.models.raft import RAFT
        from propainter_tpu.models.flow_completion import (
            RecurrentFlowCompleteNet)
        from propainter_tpu.models.propainter import InpaintGenerator

        key = jax.random.PRNGKey(0)
        H = W = 64
        return {
            "raft": RAFT().init(key, jnp.zeros((1, H, W, 3)),
                                jnp.zeros((1, H, W, 3)), iters=1)["params"],
            "flowcomp": RecurrentFlowCompleteNet().init(
                key, jnp.zeros((1, 2, H, W, 2)),
                jnp.zeros((1, 2, H, W, 1)))["params"],
            "inpaint": InpaintGenerator().init(
                key, jnp.zeros((1, 3, H, W, 3)),
                (jnp.zeros((1, 1, H, W, 2)), jnp.zeros((1, 1, H, W, 2))),
                jnp.zeros((1, 3, H, W, 1)), jnp.zeros((1, 3, H, W, 1)),
                2)["params"],
        }

    orbax_dir = os.path.join(weights_dir, "jax")
    if os.path.isdir(orbax_dir):
        return load_params_bundle(orbax_dir)

    # convert from torch checkpoints
    from propainter_tpu.convert.torch_to_jax import load_torch_checkpoint
    from propainter_tpu.models.raft import convert_raft_state_dict
    from propainter_tpu.models.flow_completion import convert_flowcomp_state_dict
    from propainter_tpu.models.propainter import convert_inpaint_state_dict

    paths = {
        "raft": os.path.join(weights_dir, "raft-things.pth"),
        "flowcomp": os.path.join(weights_dir, "recurrent_flow_completion.pth"),
        "inpaint": os.path.join(weights_dir, "ProPainter.pth"),
    }
    for k, p in paths.items():
        if not os.path.exists(p):
            raise FileNotFoundError(
                f"missing {p}; place the released checkpoints in "
                f"{weights_dir} or a converted bundle in {orbax_dir}")
    params = {
        "raft": convert_raft_state_dict(load_torch_checkpoint(paths["raft"])),
        "flowcomp": convert_flowcomp_state_dict(
            load_torch_checkpoint(paths["flowcomp"])),
        "inpaint": convert_inpaint_state_dict(
            load_torch_checkpoint(paths["inpaint"])),
    }
    save_params_bundle(orbax_dir, params)
    return params


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-i", "--video", type=str,
                   default="inputs/object_removal/bmx-trees")
    p.add_argument("-m", "--mask", type=str,
                   default="inputs/object_removal/bmx-trees_mask")
    p.add_argument("-o", "--output", type=str, default="results")
    p.add_argument("--resize_ratio", type=float, default=1.0)
    p.add_argument("--height", type=int, default=-1)
    p.add_argument("--width", type=int, default=-1)
    p.add_argument("--mask_dilation", type=int, default=4)
    p.add_argument("--ref_stride", type=int, default=10)
    p.add_argument("--neighbor_length", type=int, default=10)
    p.add_argument("--subvideo_length", type=int, default=80)
    p.add_argument("--raft_iter", type=int, default=20)
    p.add_argument("--mode", default="video_inpainting",
                   choices=["video_inpainting", "video_outpainting"])
    p.add_argument("--scale_h", type=float, default=1.0)
    p.add_argument("--scale_w", type=float, default=1.2)
    p.add_argument("--save_fps", type=int, default=24)
    p.add_argument("--save_frames", action="store_true")
    p.add_argument("--fp16", "--bf16", dest="bf16", action="store_true",
                   help="half precision (bf16 on TPU)")
    p.add_argument("--weights", type=str, default="weights")
    p.add_argument("--platform", type=str, default=None,
                   choices=["cpu", "tpu", "axon"],
                   help="force a jax backend (e.g. cpu to debug without a "
                        "TPU; this image pins JAX_PLATFORMS=axon at "
                        "interpreter start, so an env var cannot)")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)

    from propainter_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from propainter_tpu.pipeline import ProPainterPipeline, PipelineConfig
    from propainter_tpu.utils.video import (
        read_frames, resize_frames, write_video, write_frames,
        overlay_mask_green)
    from propainter_tpu.utils.masks import read_masks, prepare_outpainting

    frames, fps, size, video_name = read_frames(args.video)
    if args.width != -1 and args.height != -1:
        size = (args.width, args.height)
    if args.resize_ratio != 1.0:
        size = (int(args.resize_ratio * size[0]),
                int(args.resize_ratio * size[1]))
    frames, process_size, out_size = resize_frames(frames, size)
    fps = args.save_fps if fps is None else fps

    if args.mode == "video_inpainting":
        flow_masks, masks_dilated = read_masks(
            args.mask, len(frames), process_size,
            flow_mask_dilates=args.mask_dilation,
            mask_dilates=args.mask_dilation)
    else:
        frames, flow_masks, masks_dilated, process_size = prepare_outpainting(
            frames, (args.scale_h, args.scale_w))
        out_size = process_size

    params = load_params(args.weights)
    pipe = ProPainterPipeline(
        params["raft"], params["flowcomp"], params["inpaint"],
        PipelineConfig(
            ref_stride=args.ref_stride,
            neighbor_length=args.neighbor_length,
            subvideo_length=args.subvideo_length,
            raft_iter=args.raft_iter,
            precision="bf16" if args.bf16 else "fp32",
        ))

    print(f"Processing: {video_name} [{len(frames)} frames] "
          f"at {process_size}...")
    comp_frames = pipe.inpaint_video(frames, flow_masks, masks_dilated)

    save_root = os.path.join(args.output, video_name)
    os.makedirs(save_root, exist_ok=True)

    if args.save_frames:
        write_frames(comp_frames, os.path.join(save_root, "frames"), out_size)

    import cv2

    masked = overlay_mask_green(frames, masks_dilated)
    masked = [cv2.resize(f, out_size) for f in masked]
    comp = [cv2.resize(f, out_size) for f in comp_frames]
    write_video(masked, os.path.join(save_root, "masked_in.mp4"), fps)
    write_video(comp, os.path.join(save_root, "inpaint_out.mp4"), fps)
    print(f"All results are saved in {save_root}")


if __name__ == "__main__":
    main()
