"""A/B: flowcomp decoder resize impl at the REAL 158-frame shapes.

tools/resize_ab.py measured the per-window generator shapes (T=11/12);
the flowcomp decoder upsamples 158 frames to 240x432 where the matmul-form
resize must transpose ~1 GB tensors to put H/W in contraction position.
Times each resize shape standalone (gather vs mxu) and the full decoder
stack with each impl choice.

Run from the repo root with nothing else using the TPU:
    python tools/flowcomp_decoder_ab.py
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

from propainter_tpu.ops.interp import resize


def fence(x):
    np.asarray(jax.tree.leaves(x)[0].ravel()[0])


def timeit(name, fn, *args, n=10):
    out = fn(*args)
    fence(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        fence(out)
        best = min(best, (time.perf_counter() - t0) / n * 1e3)
    print(f"{name:58s} {best:8.2f} ms", flush=True)
    return best


CASES = [
    ("fc dec2_2 (158,30,54,128)->(60,108)", (158, 30, 54, 128), (60, 108)),
    ("fc dec1_2 (158,60,108,64)->(120,216)", (158, 60, 108, 64), (120, 216)),
    ("fc ups2 (158,120,216,32)->(240,432)", (158, 120, 216, 32), (240, 432)),
]


def main():
    rng = np.random.default_rng(0)
    for label, shape, size in CASES:
        x = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
        for impl in ("gather", "mxu"):
            f = jax.jit(lambda v, size=size, impl=impl: resize(
                v, size, "bilinear", True, impl=impl))
            timeit(f"{label} {impl}", f, x)


if __name__ == "__main__":
    main()
