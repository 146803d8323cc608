"""A/B the round-3 stage-4 optimizations at the bench shapes.

Measures pipe.generate() wall time (fenced) on the bench's 80-frame
432x240 workload for the four (occupancy_bucketing, encoder_carry)
configurations, plus the occupancy-bitmap overhead on its own. Run from
the repo root with NOTHING else using the chip:

    python tools/stage4_opt_ab.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import numpy as np
import jax

from propainter_tpu.utils.jax_cache import enable_persistent_cache

enable_persistent_cache()
import jax.numpy as jnp


def fence(x):
    np.asarray(jax.tree.leaves(x)[0].ravel()[0])


def main():
    from bench import build_pipeline, make_inputs, T
    from propainter_tpu.pipeline import ProPainterPipeline, PipelineConfig

    frames_np, mask_np = make_inputs()
    frames = jnp.asarray(frames_np[None].astype(np.float32) / 255 * 2 - 1)
    masks = jnp.asarray(mask_np[None, ..., None].astype(np.float32))
    ori = jnp.asarray(frames_np).astype(jnp.float32)
    rng = np.random.default_rng(1)
    flows = (jnp.asarray(rng.standard_normal(
                 (1, T - 1, 240, 432, 2)).astype(np.float32) * 2),
             jnp.asarray(rng.standard_normal(
                 (1, T - 1, 240, 432, 2)).astype(np.float32) * 2))

    base = build_pipeline("bf16")
    results = {}
    combos = ((False, False), (True, True))
    if os.environ.get("AB_ALL") == "1":  # singles too (2 more compiles)
        combos = ((False, False), (True, False), (False, True), (True, True))
    for bucketing, carry in combos:
        pipe = ProPainterPipeline(
            base.raft_params, base.flowcomp_params, base.inpaint_params,
            PipelineConfig(precision="bf16", occupancy_bucketing=bucketing,
                           encoder_carry=carry))
        out = pipe.generate(frames, flows, masks, masks, ori)  # compile
        fence(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = pipe.generate(frames, flows, masks, masks, ori)
            fence(out)
            best = min(best, time.perf_counter() - t0)
        results[(bucketing, carry)] = best
        print(f"bucketing={bucketing} carry={carry}: {best*1e3:8.1f} ms",
              flush=True)

    # occupancy bitmap overhead alone (compute + readback)
    pipe = ProPainterPipeline(
        base.raft_params, base.flowcomp_params, base.inpaint_params,
        PipelineConfig(precision="bf16"))
    nb = np.stack([np.arange(11) + 5 * i for i in range(14)]).astype(np.int32)
    bm = np.asarray(pipe._window_occ(masks, jnp.asarray(nb)))  # compile
    t0 = time.perf_counter()
    for _ in range(5):
        bm = np.asarray(pipe._window_occ(masks, jnp.asarray(nb)))
    print(f"occupancy bitmap (compute+readback): "
          f"{(time.perf_counter()-t0)/5*1e3:6.1f} ms; "
          f"masked windows/window: {bm.sum(1).tolist()}", flush=True)


if __name__ == "__main__":
    main()
