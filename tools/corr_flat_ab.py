"""A/B: flat (pair-batch-in-lanes) vs batched corr pyramid + lookup.

The batched layout pads every pair's 1620 query pixels to 2048 kernel
lanes (21% dead lanes, plus a whole-pyramid pad copy per call); the flat
layout packs B*H*W onto one lane axis padded once to a 128 multiple.
Run from the repo root with nothing else using the TPU:

    python tools/corr_flat_ab.py
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


def timeit(label, f, *args, n=8):
    out = f(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    fence(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{label:42s} {dt:8.2f} ms")
    return out


def main():
    from propainter_tpu.ops.corr_pallas import (
        corr_pyramid_t, corr_lookup_fused, corr_pyramid_flat,
        corr_lookup_flat)

    B, H, W, D = 158, 30, 54, 256
    f1 = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, D), jnp.float32)
    f2 = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, D), jnp.float32)
    coords = jax.random.uniform(
        jax.random.PRNGKey(2), (B, H, W, 2), jnp.float32) * 50 - 5

    for dtype in (jnp.bfloat16, jnp.float32):
        tag = np.dtype(dtype).name
        pyr_t = jax.jit(lambda a, b: [c.astype(dtype)
                                      for c in corr_pyramid_t(a, b)])
        pyr_f = jax.jit(lambda a, b: corr_pyramid_flat(a, b,
                                                       out_dtype=dtype))
        pt = timeit(f"[{tag}] corr_pyramid_t (build)", pyr_t, f1, f2)
        pf = timeit(f"[{tag}] corr_pyramid_flat (build)", pyr_f, f1, f2)

        lk_t = jax.jit(lambda p, c: corr_lookup_fused(list(p), c, 4))
        lk_f = jax.jit(lambda p, c: corr_lookup_flat(list(p), c, 4))
        o_t = timeit(f"[{tag}] lookup batched", lk_t, tuple(pt), coords)
        o_f = timeit(f"[{tag}] lookup flat", lk_f, tuple(pf), coords)
        d = float(jnp.max(jnp.abs(o_t.astype(jnp.float32)
                                  - o_f.astype(jnp.float32))))
        print(f"[{tag}] max |flat - batched| = {d:.2e}")


if __name__ == "__main__":
    main()
