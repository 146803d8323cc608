"""A/B: FeaturePropagation per-window (B=1, called 16x) vs batched (B=16).

Stage-4 runs 16 sliding windows; each window's featprop is a 2x11-step
sequential scan whose per-step bodies sit near the ~1.5 ms fused dispatch
floor (tools/featprop_breakdown.py). Window outputs are independent of one
another (only the 0.5/0.5 compositing is order-dependent), so featprop for
ALL windows can run as ONE batched scan: if the step is latency-bound, the
batch rides along nearly free.

Run from the repo root with nothing else on the chip:
    python tools/featprop_batch_ab.py
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


def timeit(name, fn, *args, n=5):
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
    from propainter_tpu.models.propainter import FeaturePropagation

    T, H, W, C = 11, 60, 108, 128
    NW = 16  # windows in the 80-frame default video
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    mod = FeaturePropagation(C)
    x1 = jnp.asarray(rng.standard_normal((1, T, H, W, C)), dt)
    ff1 = jnp.asarray(rng.standard_normal((1, T - 1, H, W, 2)) * 2, dt)
    fb1 = jnp.asarray(rng.standard_normal((1, T - 1, H, W, 2)) * 2, dt)
    m1 = jnp.asarray(rng.uniform(size=(1, T, H, W, 2)) > 0.7, dt)
    params = mod.init(
        jax.random.PRNGKey(0), x1.astype(jnp.float32),
        ff1.astype(jnp.float32), fb1.astype(jnp.float32),
        m1.astype(jnp.float32))
    # random (non-zero-foldable) weights, cast to the pipeline dtype
    params = jax.tree.map(
        lambda p: jnp.asarray(rng.standard_normal(p.shape) * 0.05, dt),
        params)

    apply1 = jax.jit(lambda p, *a: mod.apply(p, *a))

    xN = jnp.asarray(rng.standard_normal((NW, T, H, W, C)), dt)
    ffN = jnp.asarray(rng.standard_normal((NW, T - 1, H, W, 2)) * 2, dt)
    fbN = jnp.asarray(rng.standard_normal((NW, T - 1, H, W, 2)) * 2, dt)
    mN = jnp.asarray(rng.uniform(size=(NW, T, H, W, 2)) > 0.7, dt)
    applyN = jax.jit(lambda p, *a: mod.apply(p, *a))

    t1 = timeit("featprop B=1 (one window)", apply1, params, x1, ff1, fb1, m1)
    print(f"{'  -> x16 windows':44s} {t1 * 16e3:8.2f} ms", flush=True)
    tN = timeit("featprop B=16 (all windows, one call)",
                applyN, params, xN, ffN, fbN, mN, n=3)

    # numerics: batched row 3 == single-window on that row's inputs
    y3 = applyN(params, xN, ffN, fbN, mN)[3]
    y3s = apply1(params, xN[3:4], ffN[3:4], fbN[3:4], mN[3:4])[0]
    err = float(jnp.max(jnp.abs(y3.astype(jnp.float32)
                                - y3s.astype(jnp.float32))))
    print(f"batched-vs-single max abs err: {err:.3e}")
    print(f"speedup vs 16x per-window: {t1 * 16 / tN:.2f}x")


if __name__ == "__main__":
    main()
