"""A/B: FeaturePropagation scan unroll at the stage-4 window shape.

Run from the repo root with nothing else using the TPU:
  python tools/featprop_unroll_ab.py
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
    from propainter_tpu.models.propainter import FeaturePropagation

    B, T, h, w, c = 1, 19, 60, 108, 128
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    x = jax.random.normal(key, (B, T, h, w, c), dt)
    ff = jax.random.normal(key, (B, T - 1, h, w, 2), dt) * 2
    fb = jax.random.normal(key, (B, T - 1, h, w, 2), dt) * 2
    mk = (jax.random.uniform(key, (B, T, h, w, 2)) > 0.7).astype(dt)

    params = FeaturePropagation(c).init(
        jax.random.PRNGKey(1),
        x.astype(jnp.float32), ff.astype(jnp.float32),
        fb.astype(jnp.float32), mk.astype(jnp.float32))["params"]
    params = jax.tree.map(lambda a: a.astype(dt)
                          if a.dtype == jnp.float32 else a, params)

    for u in (1, 2, 4):
        model = FeaturePropagation(c, unroll=u)

        @jax.jit
        def f(p, x, ff, fb, mk):
            return model.apply({"params": p}, x, ff, fb, mk)

        out = f(params, x, ff, fb, mk)
        fence(out)
        # dispatch n back-to-back, fence once (sub-30ms ops: per-call fences
        # would measure the tunnel RTT)
        n = 16
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(params, x, ff, fb, mk)
        fence(out)
        dtms = (time.perf_counter() - t0) / n * 1e3
        print(f"featprop unroll={u}: {dtms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
