"""Per-stage e2e benchmark: the bench.py workload with per-stage timings.

Run from the repo root with nothing else using CPU or the TPU:
  python tools/staged_bench.py            # inpaint_video (uploads per pass —
                                          # measures the dev tunnel's ~55 MB/s
                                          # H2D on this harness, see PERF.md)
  DEVRES=1 python tools/staged_bench.py   # device-resident (bench.py stages)
"""

import os
import sys
import json
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

from propainter_tpu.utils.jax_cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np


def main():
    from bench import build_pipeline, make_inputs, T

    pipe = build_pipeline("bf16")
    wb = int(os.environ.get("WB", "1"))
    pipe.config.window_batch = wb
    if wb > 1:
        print(f"window_batch={wb}")
    frames_np, mask_np = make_inputs()

    if os.environ.get("DEVRES"):
        import jax
        import jax.numpy as jnp

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
    else:
        def run(timings=None):
            return pipe.inpaint_video(frames_np, mask_np, mask_np,
                                      timings=timings)

    t0 = time.perf_counter()
    run()  # warmup/compile
    print(f"warmup (compile): {time.perf_counter() - t0:.1f}s", flush=True)

    n_passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    best = None
    for _ in range(n_passes):
        timings = {}
        t0 = time.perf_counter()
        run(timings)
        total = time.perf_counter() - t0
        print(json.dumps({k: round(v, 3) for k, v in timings.items()}
                         | {"total": round(total, 3),
                            "fps": round(T / total, 2)}), flush=True)
        if best is None or total < best[0]:
            best = (total, timings)
    print("BEST:", json.dumps({k: round(v, 3) for k, v in best[1].items()}
                              | {"total": round(best[0], 3),
                                 "fps": round(T / best[0], 2)}))


if __name__ == "__main__":
    main()
