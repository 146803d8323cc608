"""A/B: chunked RAFT (reference width-based clips) vs ONE all-pairs call.

RAFT frame pairs are independent — the reference chunks stage 1 only to cap
GPU memory (inference_propainter.py:302-330), so computing all T-1 pairs in
a single batched dispatch is numerically identical while filling the MXU
with a 7x larger batch and paying one dispatch instead of 7.

Run from the repo root with nothing else using the TPU:
  python tools/raft_oneshot_ab.py
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

    pipe = build_pipeline("bf16")
    frames_np, _ = make_inputs()
    frames = jnp.asarray(frames_np[None].astype(np.float32) / 255 * 2 - 1)

    def timeit(name, fn, n=3):
        out = fn()
        fence(out)
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn()
            fence(out)
            best = min(best, time.perf_counter() - t0)
        print(f"{name:28s} {best * 1e3:8.1f} ms", flush=True)
        return out

    a = timeit("chunked (clip=12)", lambda: pipe.compute_flows(frames))
    b = timeit("one-shot (all 79 pairs)",
               lambda: pipe._raft_bi(pipe.raft_params, frames,
                                     iters=pipe.config.raft_iter))
    da = np.asarray(a[0], np.float32)
    db = np.asarray(b[0], np.float32)
    print("max |delta| fwd flow:", float(np.abs(da - db).max()))


if __name__ == "__main__":
    main()
