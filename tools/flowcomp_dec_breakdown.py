"""Piecewise timing of the flowcomp decoder stack at the real 158-frame
shapes (bf16) — finds where the 69 ms goes (convs vs resizes vs layout
padding on the C<=32 full-res tensors).

Run from the repo root with nothing else using the TPU:
    python tools/flowcomp_dec_breakdown.py
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
import flax.linen as nn

from propainter_tpu.models.layers import conv2d, leaky_relu
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


class _Conv(nn.Module):
    feat: int
    k: int = 3

    @nn.compact
    def __call__(self, x):
        return conv2d(self.feat, self.k, 1, self.k // 2, name="c")(x)


def conv_fn(feat, shape, k=3):
    m = _Conv(feat, k)
    rngp = jax.random.PRNGKey(0)
    x0 = jnp.zeros(shape, jnp.bfloat16)
    params = m.init(rngp, x0)
    pa = jax.device_put(jax.tree.map(
        lambda a: jnp.asarray(np.random.default_rng(0).standard_normal(
            a.shape), jnp.bfloat16), params))
    f = jax.jit(lambda p, v: m.apply(p, v))
    return lambda v: f(pa, v)


def main():
    rng = np.random.default_rng(0)
    B = 158

    x30 = jnp.asarray(rng.standard_normal((B, 30, 54, 128)), jnp.bfloat16)
    x60_128 = jnp.asarray(
        rng.standard_normal((B, 60, 108, 128)), jnp.bfloat16)
    x60 = jnp.asarray(rng.standard_normal((B, 60, 108, 64)), jnp.bfloat16)
    x120_64 = jnp.asarray(
        rng.standard_normal((B, 120, 216, 64)), jnp.bfloat16)
    x120 = jnp.asarray(rng.standard_normal((B, 120, 216, 32)), jnp.bfloat16)
    x240 = jnp.asarray(rng.standard_normal((B, 240, 432, 32)), jnp.bfloat16)

    timeit("dec2_0 conv 128->128 @30x54", conv_fn(128, x30.shape), x30)
    timeit("dec2_2 resize 30->60 (mxu, C=128)", jax.jit(
        lambda v: resize(v, (60, 108), "bilinear", True, impl="mxu")), x30)
    timeit("dec2_2 conv 128->64 @60x108", conv_fn(64, x60_128.shape), x60_128)
    timeit("dec1_0 conv 64->64 @60x108", conv_fn(64, x60.shape), x60)
    timeit("dec1_2 resize 60->120 (mxu, C=64)", jax.jit(
        lambda v: resize(v, (120, 216), "bilinear", True, impl="mxu")), x60)
    timeit("dec1_2 conv 64->32 @120x216", conv_fn(32, x120_64.shape), x120_64)
    timeit("ups_0 conv 32->32 @120x216", conv_fn(32, x120.shape), x120)
    timeit("ups_2 resize 120->240 (mxu, C=32)", jax.jit(
        lambda v: resize(v, (240, 432), "bilinear", True, impl="mxu")), x120)
    timeit("ups_2 conv 32->2 @240x432", conv_fn(2, x240.shape), x240)
    timeit("pure copy (158,240,432,32) bf16", jax.jit(
        lambda v: v + jnp.bfloat16(1.0)), x240)

    # NCHW-ish alternative for the C=2 output: W on lanes
    x240t = jnp.asarray(
        rng.standard_normal((B, 32, 240, 432)), jnp.bfloat16)
    timeit("pure copy (158,32,240,432) bf16 (W lanes)", jax.jit(
        lambda v: v + jnp.bfloat16(1.0)), x240t)


if __name__ == "__main__":
    main()
