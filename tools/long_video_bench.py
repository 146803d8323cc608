"""Long-video staged bench: the 80-frame bench never exercises the
stage-2/3 subvideo chunking (80 == subvideo_length) or the stage-4
ref_num cap under timing. Runs the staged device-resident bench at
T=240 (3 subvideo chunks) and prints per-stage fenced seconds + fps.

Run from the repo root with nothing else using the TPU:
    python tools/long_video_bench.py [T]
"""

import os
import sys
import json
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from propainter_tpu.utils.jax_cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np


def main():
    import bench

    bench.T = int(sys.argv[1]) if len(sys.argv) > 1 else 240
    T = bench.T

    import jax
    import jax.numpy as jnp

    pipe = bench.build_pipeline("bf16")
    frames_np, mask_np = bench.make_inputs()

    frames = jnp.asarray(frames_np[None].astype(np.float32) / 255 * 2 - 1)
    masks = jnp.asarray(mask_np[None, ..., None].astype(np.float32))
    ori_dev = jnp.asarray(frames_np).astype(jnp.float32)

    def fence(x):
        np.asarray(jax.tree.leaves(x)[0].ravel()[0])

    def run(timings=None):
        def timed(key, fn):
            t0 = time.perf_counter()
            out = fn()
            fence(out)
            if timings is not None:
                timings[key] = time.perf_counter() - t0
            return out

        gt = timed("raft", lambda: pipe.compute_flows(frames))
        pred = timed("flow_completion",
                     lambda: pipe.complete_flows(gt, masks))
        uf, um = timed("image_propagation",
                       lambda: pipe.propagate_images(frames, pred, masks))
        return timed("generation",
                     lambda: pipe.generate(uf, pred, masks, um, ori_dev))

    t0 = time.perf_counter()
    run()
    print(f"warmup (compile): {time.perf_counter() - t0:.1f}s", flush=True)

    best = None
    for _ in range(3):
        timings = {}
        run(timings)
        timings["total"] = sum(timings.values())
        timings = {k: round(v, 3) for k, v in timings.items()}
        timings["fps"] = round(T / timings["total"], 2)
        print(json.dumps(timings), flush=True)
        if best is None or timings["total"] < best["total"]:
            best = timings
    print("BEST:", json.dumps(best), flush=True)


if __name__ == "__main__":
    main()
