"""Flow-completion EPE evaluation.

Equivalent of reference scripts/evaluate_flow_completion.py: for each test
video, compute bidirectional RAFT flow on GT frames, complete the masked flow
with RecurrentFlowCompleteNet, and report end-point error of the completed
flow vs the RAFT flow, plus per-frame time.

Usage:
  python -m propainter_tpu.cli.evaluate_flow_completion --dataset davis \
      --video_root <JPEGImages> --mask_root <masks> [--weights weights]
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def main(argv=None):

    from propainter_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="davis")
    p.add_argument("--video_root", required=True)
    p.add_argument("--mask_root", required=True)
    p.add_argument("--json_path", default=None)
    p.add_argument("--height", type=int, default=240)
    p.add_argument("--width", type=int, default=432)
    p.add_argument("--raft_iter", type=int, default=20)
    p.add_argument("--weights", default="weights")
    p.add_argument("--max_videos", type=int, default=-1)
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from propainter_tpu.cli.inference import load_params
    from propainter_tpu.core.dataset import TestDataset
    from propainter_tpu.core.metrics import calculate_epe
    from propainter_tpu.pipeline import ProPainterPipeline, PipelineConfig

    json_path = args.json_path or os.path.join(
        "datasets", args.dataset, "test.json")
    dataset = TestDataset(args.video_root, args.mask_root, json_path,
                          w=args.width, h=args.height)
    params = load_params(args.weights)
    pipe = ProPainterPipeline(
        params["raft"], params["flowcomp"], params["inpaint"],
        PipelineConfig(raft_iter=args.raft_iter))

    epes = []
    total_frames, total_time = 0, 0.0
    n = len(dataset) if args.max_videos < 0 else min(args.max_videos,
                                                     len(dataset))
    for vi in range(n):
        item = dataset[vi]
        frames = jnp.asarray(
            item["frames"][None].astype(np.float32) / 255.0 * 2 - 1)
        masks = jnp.asarray(
            item["masks"][None, ..., None].astype(np.float32))

        t0 = time.perf_counter()
        gt_flows_bi = pipe.compute_flows(frames)
        pred_flows_bi = pipe.complete_flows(gt_flows_bi, masks)
        dt = time.perf_counter() - t0

        epe = (calculate_epe(np.asarray(pred_flows_bi[0]),
                             np.asarray(gt_flows_bi[0]))
               + calculate_epe(np.asarray(pred_flows_bi[1]),
                               np.asarray(gt_flows_bi[1]))) / 2
        epes.append(epe)
        total_frames += item["frames"].shape[0]
        total_time += dt
        print(f"[{vi + 1}/{n}] {item['video_name']}: epe {epe:.4f}",
              flush=True)

    print(f"avg epe: {np.mean(epes):.4f}; "
          f"avg s/frame: {total_time / max(total_frames, 1):.4f}")


if __name__ == "__main__":
    main()
