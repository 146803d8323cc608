"""Decompose one feature-propagation scan step and sweep deform row_chunk.

The stage-4 featprop (34 ms/window, 22 scanned steps) is the largest
single generator component. Times the step's sub-ops at the real step
shape (B=1, 60x108, C=128, dg=16) and sweeps
modulated_deform_conv2d_mxu's row_chunk there.

Run from the repo root with nothing else on the chip:
    python tools/featprop_breakdown.py
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


def timeit(name, fn, *args, n=20):
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
    return best


def main():
    from propainter_tpu.ops.deform import modulated_deform_conv2d_mxu
    from propainter_tpu.ops.warp import flow_warp

    B, H, W, C = 1, 60, 108, 128
    dg, K = 16, 9
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    x = jnp.asarray(rng.standard_normal((B, H, W, C)), dt)
    offset = jnp.asarray(rng.standard_normal((B, H, W, dg, K, 2)) * 2, dt)
    dmask = jnp.asarray(rng.uniform(size=(B, H, W, dg, K)), dt)
    kernel = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, dt)
    bias = jnp.zeros((C,), dt)
    flow = jnp.asarray(rng.standard_normal((B, H, W, 2)) * 2, dt)
    cond = jnp.asarray(rng.standard_normal((B, H, W, 2 * C + 5)), dt)

    # deform row_chunk sweep at the featprop step shape
    for rc in (8, 12, 15, 20, 30, 60):
        fn = jax.jit(lambda x, o, m, k, b, rc=rc: modulated_deform_conv2d_mxu(
            x, o, m, k, b, row_chunk=rc))
        timeit(f"deform row_chunk={rc}", fn, x, offset, dmask, kernel, bias)

    # sub-op costs (each includes the ~3 ms dispatch floor when measured
    # standalone; relative ordering is what matters)
    timeit("flow_warp (130ch shared-grid gather)", jax.jit(
        lambda f, fl: flow_warp(jnp.concatenate([fl, f], -1), fl)), x, flow)

    w1 = jnp.asarray(rng.standard_normal((3, 3, 2 * C + 5, C)) * 0.05, dt)
    w2 = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, dt)
    w3 = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, dt)
    w4 = jnp.asarray(rng.standard_normal((3, 3, C, 27 * dg)) * 0.05, dt)

    def offset_stack(c):
        o = jax.nn.leaky_relu(jax.lax.conv_general_dilated(
            c, w1, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")), 0.1)
        o = jax.nn.leaky_relu(jax.lax.conv_general_dilated(
            o, w2, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")), 0.1)
        o = jax.nn.leaky_relu(jax.lax.conv_general_dilated(
            o, w3, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")), 0.1)
        return jax.lax.conv_general_dilated(
            o, w4, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    timeit("offset conv stack (4 convs)", jax.jit(offset_stack), cond)

    wb1 = jnp.asarray(rng.standard_normal((3, 3, 2 * C + 2, C)) * 0.05, dt)
    wb2 = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, dt)

    def backbone(a, b_, m):
        f = jnp.concatenate([a, b_, m], -1)
        y = jax.nn.leaky_relu(jax.lax.conv_general_dilated(
            f, wb1, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")), 0.2)
        return jax.lax.conv_general_dilated(
            y, wb2, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    m2 = jnp.asarray(rng.uniform(size=(B, H, W, 2)), dt)
    timeit("backbone (2 convs)", jax.jit(backbone), x, x, m2)


if __name__ == "__main__":
    main()
