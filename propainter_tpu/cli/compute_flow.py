"""Offline RAFT flow precomputation for training datasets.

Equivalent of reference scripts/compute_flow.py: for every video folder,
resize frames to (w, h), run bidirectional RAFT, save fp16-quantized .flo
files named {cur}_{next}_f.flo / {next}_{cur}_b.flo.

Usage:
  python -m propainter_tpu.cli.compute_flow --root <JPEGImages> \
      --save_path <flow_root> [--height 240 --width 432] [--raft_iter 20]
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):

    from propainter_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True)
    p.add_argument("--save_path", required=True)
    p.add_argument("--height", type=int, default=240)
    p.add_argument("--width", type=int, default=432)
    p.add_argument("--raft_iter", type=int, default=20)
    p.add_argument("--raft_path", default="weights/raft-things.pth")
    args = p.parse_args(argv)

    import cv2
    import numpy as np
    import jax
    import jax.numpy as jnp

    from propainter_tpu.models.raft import RAFT, convert_raft_state_dict
    from propainter_tpu.convert.torch_to_jax import load_torch_checkpoint
    from propainter_tpu.utils.flow_io import flowwrite

    raft = RAFT()
    params = convert_raft_state_dict(load_torch_checkpoint(args.raft_path))

    @jax.jit
    def flow_pair(im1, im2):
        _, f = raft.apply({"params": params}, im1, im2,
                          iters=args.raft_iter)
        return f

    for video in sorted(os.listdir(args.root)):
        vdir = os.path.join(args.root, video)
        if not os.path.isdir(vdir):
            continue
        out_dir = os.path.join(args.save_path, video)
        os.makedirs(out_dir, exist_ok=True)
        frame_files = sorted(os.listdir(vdir))
        frames = []
        for ff in frame_files:
            img = cv2.imread(os.path.join(vdir, ff))
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            img = cv2.resize(img, (args.width, args.height),
                             interpolation=cv2.INTER_LINEAR)
            frames.append(img.astype(np.float32) / 255.0 * 2 - 1)
        for i in range(len(frames) - 1):
            a = jnp.asarray(frames[i][None])
            b = jnp.asarray(frames[i + 1][None])
            ff = np.asarray(flow_pair(a, b)[0])
            fb = np.asarray(flow_pair(b, a)[0])
            cur = frame_files[i][:-4]
            nxt = frame_files[i + 1][:-4]
            flowwrite(ff, os.path.join(out_dir, f"{cur}_{nxt}_f.flo"),
                      quantize=True)
            flowwrite(fb, os.path.join(out_dir, f"{nxt}_{cur}_b.flo"),
                      quantize=True)
        print(f"{video}: {len(frames)} frames", flush=True)


if __name__ == "__main__":
    main()
