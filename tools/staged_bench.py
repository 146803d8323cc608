"""Per-stage e2e benchmark: the bench.py workload with per-stage timings.

Run from the repo root with nothing else using CPU or the TPU:
  python tools/staged_bench.py
"""

import os
import sys
import json
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np


def main():
    from bench import build_pipeline, make_inputs, T

    pipe = build_pipeline("bf16")
    wb = int(os.environ.get("WB", "1"))
    pipe.config.window_batch = wb
    if wb > 1:
        print(f"window_batch={wb}")
    frames_np, mask_np = make_inputs()

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
