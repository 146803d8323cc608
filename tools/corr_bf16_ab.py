"""Time corr_lookup_fused with bf16 vs f32 volumes (in-kernel native dtype).

Run from the repo root with nothing else using the TPU:
  python tools/corr_bf16_ab.py
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
    pyr32 = jax.jit(corr_pyramid_t)(f1, f2)
    pyr16 = jax.jit(lambda p: [c.astype(jnp.bfloat16) for c in p])(pyr32)
    coords = jax.random.uniform(key, (B, H, W, 2), jnp.float32) * 50 - 5
    fence(pyr32)

    outs = {}
    for name, pyr in (("f32", pyr32), ("bf16", pyr16)):
        # pyramid as jit ARGUMENT: a closure capture bakes it in as a
        # 2.18 GB constant and the compile runs for >25 min
        f = jax.jit(lambda p, c: corr_lookup_fused(p, c))
        out = f(pyr, coords)
        fence(out)
        n = 8
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(pyr, coords)
        fence(out)
        print(f"{name}: {(time.perf_counter() - t0) / n * 1e3:7.2f} ms",
              flush=True)
        outs[name] = np.asarray(out[:2])     # small slice only (slow D2H)
    d = np.abs(outs["f32"] - outs["bf16"]).max()
    print(f"max |f32 - bf16| on slice: {d:.4f} "
          f"(scale: corr std {outs['f32'].std():.3f})")


if __name__ == "__main__":
    main()
