"""A/B: XLA lowering variants for the matmul-form bilinear resize at the
flowcomp decoder's 158-frame shapes, before reaching for a pallas kernel.

Variants:
  mxu      — current ops/interp.resize impl='mxu' (intermediate-size order)
  wfirst   — W-contraction first, then H
  merge    — H-contraction as a batched matmul on x.reshape(B,H,W*C), then
             W-contraction producing bhpc directly
  nearest  — static dyadic nearest upsample (NOT equivalent; lower bound
             for 'what would a free resize cost')

Run from the repo root with nothing else using the TPU:
    python tools/resize_form_ab.py
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

from propainter_tpu.ops.interp import resize, _linear_matrix


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
    return out


def wfirst(x, size):
    B, H, W, C = x.shape
    Ho, Wo = size
    my = jnp.asarray(_linear_matrix(H, Ho, True), x.dtype)
    mx = jnp.asarray(_linear_matrix(W, Wo, True), x.dtype)
    cols = jnp.einsum("pw,bhwc->bhpc", mx, x)
    return jnp.einsum("oh,bhpc->bopc", my, cols)


def merge(x, size):
    B, H, W, C = x.shape
    Ho, Wo = size
    my = jnp.asarray(_linear_matrix(H, Ho, True), x.dtype)
    mx = jnp.asarray(_linear_matrix(W, Wo, True), x.dtype)
    rows = jnp.einsum("oh,bhk->bok", my, x.reshape(B, H, W * C))
    rows = rows.reshape(B, Ho, W, C)
    return jnp.einsum("pw,bhwc->bhpc", mx, rows)


def nearest2x(x, size):
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


CASES = [
    ("dec1_2 (158,60,108,64)->(120,216)", (158, 60, 108, 64), (120, 216)),
    ("ups2 (158,120,216,32)->(240,432)", (158, 120, 216, 32), (240, 432)),
]


def main():
    rng = np.random.default_rng(0)
    for label, shape, size in CASES:
        x = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
        ref = None
        for name, fn in (
            ("mxu", lambda v, size=size: resize(v, size, "bilinear", True,
                                                impl="mxu")),
            ("wfirst", lambda v, size=size: wfirst(v, size)),
            ("merge", lambda v, size=size: merge(v, size)),
            ("nearest(proxy)", lambda v, size=size: nearest2x(v, size)),
        ):
            f = jax.jit(fn)
            out = timeit(f"{label} {name}", f, x)
            if name == "mxu":
                ref = out
            elif name != "nearest(proxy)":
                d = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                          - ref.astype(jnp.float32))))
                print(f"  -> max |{name} - mxu| = {d:.2e}", flush=True)


if __name__ == "__main__":
    main()
