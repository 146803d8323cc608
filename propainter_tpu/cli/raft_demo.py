"""Standalone RAFT flow demo: run RAFT over consecutive frame pairs in a
folder and save Middlebury-color flow visualizations (+ optional .flo).

Equivalent of reference RAFT/demo.py:50-67 (load frames, pad to /8, 20
refinement iterations, flow_viz PNG per pair), restructured around the
JAX model: frames are batched into ONE device call per pair, padding is
the same replicate-%8 scheme the pipeline uses, and --weights random
gives a weights-free smoke path like the other CLIs.

Usage:
  python -m propainter_tpu.cli.raft_demo --path <frames_dir> \
      --output <out_dir> [--iters 20] [--save_flo] \
      [--weights weights/raft-things.pth | random]
"""

from __future__ import annotations

import argparse
import os


def pad8(img):
    """Replicate-pad H/W up to multiples of 8 (reference
    RAFT/utils/utils.py InputPadder 'sintel' mode pads top+sides)."""
    import numpy as np

    h, w = img.shape[:2]
    ph = (8 - h % 8) % 8
    pw = (8 - w % 8) % 8
    return (np.pad(img, ((ph, 0), (pw // 2, pw - pw // 2), (0, 0)),
                   mode="edge"), (ph, pw))


def main(argv=None):
    from propainter_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--path", required=True, help="frame folder (png/jpg)")
    p.add_argument("--output", required=True)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--weights", default="weights/raft-things.pth",
                   help="'random' = seeded random weights (smoke mode)")
    p.add_argument("--save_flo", action="store_true")
    args = p.parse_args(argv)

    import cv2
    import numpy as np
    import jax
    import jax.numpy as jnp

    from propainter_tpu.models.raft import RAFT, convert_raft_state_dict
    from propainter_tpu.utils.flow_io import flowwrite
    from propainter_tpu.utils.flow_viz import flow_to_image

    raft = RAFT()
    if args.weights == "random":
        params = raft.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 240, 432, 3)), jnp.zeros((1, 240, 432, 3)),
            iters=1)["params"]
    else:
        from propainter_tpu.convert.torch_to_jax import \
            load_torch_checkpoint

        params = convert_raft_state_dict(
            load_torch_checkpoint(args.weights))

    files = sorted(
        f for f in os.listdir(args.path)
        if f.lower().endswith((".png", ".jpg", ".jpeg", ".ppm")))
    if len(files) < 2:
        raise SystemExit(f"need >= 2 frames in {args.path}")
    os.makedirs(args.output, exist_ok=True)

    @jax.jit
    def flow_pair(pp, im1, im2):
        _, f = raft.apply({"params": pp}, im1, im2, iters=args.iters)
        return f

    prev = None
    prev_name = None
    for name in files:
        img = cv2.cvtColor(cv2.imread(os.path.join(args.path, name)),
                           cv2.COLOR_BGR2RGB)
        padded, (ph, pw) = pad8(img)
        cur = jnp.asarray(
            padded[None].astype(np.float32) / 255.0 * 2 - 1)
        if prev is not None:
            flow = np.asarray(flow_pair(params, prev, cur)[0])
            flow = flow[ph:, pw // 2: flow.shape[1] - (pw - pw // 2)]
            stem = os.path.splitext(prev_name)[0]
            viz = flow_to_image(flow)
            cv2.imwrite(os.path.join(args.output, f"{stem}_flow.png"),
                        cv2.cvtColor(viz, cv2.COLOR_RGB2BGR))
            if args.save_flo:
                flowwrite(flow,
                          os.path.join(args.output, f"{stem}.flo"))
            print(f"{stem}: flow |max| {np.abs(flow).max():.2f}",
                  flush=True)
        prev, prev_name = cur, name


if __name__ == "__main__":
    main()
