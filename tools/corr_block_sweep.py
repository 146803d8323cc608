"""Sweep the pallas corr-lookup lane-block size at the bench RAFT shape.

Run from the repo root with nothing else using the TPU:
  python tools/corr_block_sweep.py
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
    from propainter_tpu.ops.corr_pallas import (corr_pyramid_t,
                                                corr_lookup_fused)

    B, H, W, D = 158, 30, 54, 256
    key = jax.random.PRNGKey(0)
    f1 = jax.random.normal(key, (B, H, W, D), jnp.float32)
    f2 = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, D), jnp.float32)
    # jit: EAGER big-tensor ops stall for many minutes on the axon tunnel
    pyr = jax.jit(lambda a, b: [c.astype(jnp.bfloat16)
                                for c in corr_pyramid_t(a, b)])(f1, f2)
    coords = jax.random.uniform(key, (B, H, W, 2), jnp.float32) * 50 - 5
    fence(pyr)

    ref = None
    for block in (256, 512, 1024, 2048):
        f = jax.jit(lambda c: corr_lookup_fused(pyr, c, block=block))
        out = f(coords)
        fence(out)
        n = 8
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(coords)
        fence(out)
        dt = (time.perf_counter() - t0) / n * 1e3
        if ref is None:
            ref = np.asarray(out)
            delta = 0.0
        else:
            delta = float(np.abs(np.asarray(out) - ref).max())
        print(f"block={block:5d}: {dt:7.2f} ms  (max|d|={delta:.2e})",
              flush=True)


if __name__ == "__main__":
    main()
