"""A/B: gather-form vs matmul-form bilinear resize at the pipeline's hot
shapes (decoder 2x upsamples, per-window flow downsample, flowcomp deconv).

Run from the repo root with nothing else on the chip:
    python tools/resize_ab.py
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
    np.asarray(x.ravel()[0])


def timeit(name, fn, *args, n=30):
    out = fn(*args)
    fence(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        fence(out)
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{name:52s} {best * 1e3:8.3f} ms", flush=True)
    return best


CASES = [
    # (label, in_shape, out_size, align)
    ("decoder_0 up2x (11,60,108,128)->(120,216) ac=T", (11, 60, 108, 128), (120, 216), True),
    ("decoder_4 up2x (11,120,216,64)->(240,432) ac=T", (11, 120, 216, 64), (240, 432), True),
    ("flow ds (20,240,432,2)->(60,108) ac=F", (20, 240, 432, 2), (60, 108), False),
    ("flowcomp dec up2x (12,30,54,128)->(60,108) ac=T", (12, 30, 54, 128), (60, 108), True),
]


def main():
    rng = np.random.default_rng(0)
    for label, shape, size, ac in CASES:
        x = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
        g = jax.jit(lambda v, size=size, ac=ac: resize(
            v, size, "bilinear", ac, impl="gather"))
        m = jax.jit(lambda v, size=size, ac=ac: resize(
            v, size, "bilinear", ac, impl="mxu"))
        tg = timeit(f"{label} gather", g, x)
        tm = timeit(f"{label} mxu   ", m, x)
        err = float(jnp.max(jnp.abs(g(x).astype(jnp.float32)
                                    - m(x).astype(jnp.float32))))
        print(f"  -> mxu/gather {tm / tg:5.2f}x, max abs err {err:.3e}",
              flush=True)


if __name__ == "__main__":
    main()
