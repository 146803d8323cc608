"""A/B: FeaturePropagation step warp impl at the stage-4 window shape.

'xla'    — plain flow_warp (4 corner gathers per step)
'packed' — channel-packed single-gather warp (ops/warp.flow_warp_packed),
           the same trick that took image propagation 211 -> 88 ms.

Shape matches the generator's local-only featprop call (l_t=11, 60x108,
C=128, bf16). Run from the repo root with nothing else on the chip:
    python tools/featprop_warp_ab.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from propainter_tpu.utils.jax_cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np


def fence(x):
    np.asarray(jax.tree.leaves(x)[0].ravel()[0])


def main():
    from propainter_tpu.models.propainter import FeaturePropagation

    B, T, h, w, c = 1, 11, 60, 108, 128
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

    outs = {}
    for impl in ("xla", "packed"):
        model = FeaturePropagation(c, warp_impl=impl)

        @jax.jit
        def f(p, x, ff, fb, mk):
            return model.apply({"params": p}, x, ff, fb, mk)

        out = f(params, x, ff, fb, mk)
        fence(out)
        n = 16
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(n):
                out = f(params, x, ff, fb, mk)
            fence(out)
            best = min(best, (time.perf_counter() - t0) / n * 1e3)
        outs[impl] = np.asarray(out, np.float32)
        print(f"featprop warp={impl}: {best:7.2f} ms", flush=True)

    frac = float(np.mean(outs["xla"] != outs["packed"]))
    print(f"output mismatch fraction {frac:.5%} "
          f"(bf16 boundary flips only; bit-exact on CPU)")


if __name__ == "__main__":
    main()
