"""A/B: column-window select inside the corr lookup kernel —
'reduce' (masked one-hot sublane reduce) vs 'rotate' (per-lane sublane
log-shift). Outputs must be bitwise-identical; only speed differs.

Run from the repo root with nothing else using the TPU:
    python tools/corr_colimpl_ab.py
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


def timeit(label, f, *args, n=10):
    out = f(*args)
    fence(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(*args)
        fence(out)
        best = min(best, (time.perf_counter() - t0) / n * 1e3)
    print(f"{label:46s} {best:8.2f} ms")
    return out


def main():
    from propainter_tpu.ops.corr_pallas import (
        corr_pyramid_flat, corr_lookup_flat, corr_lookup_flat_moenc)

    # inference shape: 158-pair batch, 1/8-res 30x54 grid, 256-d features
    B, H, W, D = 158, 30, 54, 256
    F = 256
    k = jax.random.PRNGKey(0)
    f1 = jax.random.normal(jax.random.fold_in(k, 0), (B, H, W, D))
    f2 = jax.random.normal(jax.random.fold_in(k, 1), (B, H, W, D))
    coords = (jax.random.uniform(jax.random.fold_in(k, 2), (B, H, W, 2))
              * 60 - 5)
    w = jax.random.normal(jax.random.fold_in(k, 3), (4 * 81, F)) * 0.05
    b = jax.random.normal(jax.random.fold_in(k, 4), (F,)) * 0.05

    for dtype in (jnp.bfloat16, jnp.float32):
        tag = np.dtype(dtype).name
        pyr = jax.jit(lambda a, c: corr_pyramid_flat(a, c, out_dtype=dtype)
                      )(f1, f2)
        fence(pyr)
        for impl in ("reduce", "rotate"):
            lk = jax.jit(lambda p, c, impl=impl: corr_lookup_flat(
                list(p), c, 4, col_impl=impl))
            o = timeit(f"[{tag}] lookup flat col={impl}", lk, tuple(pyr),
                       coords)
            me = jax.jit(lambda p, c, w_, b_, impl=impl:
                         corr_lookup_flat_moenc(list(p), c, w_, b_, 4,
                                                col_impl=impl))
            om = timeit(f"[{tag}] lookup flat+moenc col={impl}", me,
                        tuple(pyr), coords, w, b)
            if impl == "reduce":
                o_ref, om_ref = o, om
            else:
                d1 = float(jnp.max(jnp.abs(o - o_ref)))
                d2 = float(jnp.max(jnp.abs(om - om_ref)))
                print(f"[{tag}] max |rotate - reduce|: plain {d1:.2e} "
                      f"moenc {d2:.2e}")


if __name__ == "__main__":
    main()
