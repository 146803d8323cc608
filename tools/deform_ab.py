"""A/B the deform-conv formulations at flow-completion scan-step shapes.

Run from repo root: python tools/deform_ab.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp


def fence(x):
    np.asarray(jax.tree.leaves(x)[0].ravel()[0])


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
    print(f"{name:44s} {best * 1e3:8.2f} ms", flush=True)


def main():
    from propainter_tpu.ops.deform import (
        modulated_deform_conv2d_mxu, modulated_deform_conv2d_banded)

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    # flow-completion SecondOrderDeformableAlignment step shapes:
    # x = (prop1, prop2) stacked -> 256ch, cond drives offsets; B=2 (fwd+bwd)
    B, H, W, C, dg = 2, 30, 54, 256, 16
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), dt)
    offset = jnp.asarray(5 * np.tanh(rng.standard_normal((B, H, W, dg, 9, 2))), dt)
    mask = jnp.asarray(rng.uniform(0, 1, (B, H, W, dg, 9)), dt)
    weight = jnp.asarray(rng.standard_normal((3, 3, C, 128)) * 0.05, dt)
    bias = jnp.asarray(rng.standard_normal((128,)) * 0.05, dt)

    mxu = jax.jit(lambda *a: modulated_deform_conv2d_mxu(*a))
    banded = jax.jit(lambda *a: modulated_deform_conv2d_banded(*a, band=8))
    timeit("flowcomp-shape mxu (adaptive chunks)", mxu, x, offset, mask,
           weight, bias)
    timeit("flowcomp-shape banded", banded, x, offset, mask, weight, bias)

    # generator DeformableAlignment step shapes (for context; flow offsets
    # unbounded there so banded is not applicable in the model)
    B, H, W, C, dg = 1, 60, 108, 128, 16
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), dt)
    offset = jnp.asarray(3 * np.tanh(rng.standard_normal((B, H, W, dg, 9, 2))), dt)
    mask = jnp.asarray(rng.uniform(0, 1, (B, H, W, dg, 9)), dt)
    weight = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, dt)
    bias = jnp.asarray(rng.standard_normal((C,)) * 0.05, dt)
    mxu8 = jax.jit(lambda *a: modulated_deform_conv2d_mxu(*a, row_chunk=8))
    banded2 = jax.jit(lambda *a: modulated_deform_conv2d_banded(*a, band=8))
    timeit("generator-shape mxu (rc=8)", mxu8, x, offset, mask, weight, bias)
    timeit("generator-shape banded (hypothetical)", banded2, x, offset, mask,
           weight, bias)


if __name__ == "__main__":
    main()
