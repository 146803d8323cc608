"""Retest scan unroll for the flowcomp bidirectional propagation.

r2 measured NO effect (297 ms at unroll 1/2/4/8) when the step bodies
were conv-heavy; after the col-first deform + whole-axis grid-block wins
the scan is latency-bound (~0.69 ms/step vs ~53 us of FLOPs —
tools/flowcomp_breakdown.py), which is exactly the regime where unroll
amortizes loop bookkeeping. Times the full prop module at the real
bench shape for unroll in {1, 2, 4}.

Run from the repo root with nothing else using the TPU:
    python tools/flowcomp_unroll_ab.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from propainter_tpu.utils.jax_cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from propainter_tpu.models.flow_completion import BidirectionalPropagation3D


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
    print(f"{name:54s} {best:8.2f} ms", flush=True)
    return out


def main():
    rng = np.random.default_rng(0)
    # bench shape: bi-batched directions (B=2), T-1=79 steps, 30x54x128
    x = jnp.asarray(
        rng.standard_normal((2, 79, 30, 54, 128)) * 0.3, jnp.bfloat16)

    ref = None
    params = None
    for unroll in (1, 2, 4):
        m = BidirectionalPropagation3D(128, unroll=unroll)
        if params is None:
            params = m.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 4, 30, 54, 128), jnp.float32))
            # the bf16 pipeline casts params to bf16 (pipeline.py)
            params = jax.device_put(jax.tree.map(
                lambda a: jnp.asarray(
                    rng.standard_normal(a.shape) * 0.05, jnp.bfloat16),
                params))
        f = jax.jit(lambda p, v, m=m: m.apply(p, v))
        out = timeit(f"bidirectional prop unroll={unroll}", f, params, x)
        got = np.asarray(out, np.float32)
        if ref is None:
            ref = got
        else:
            print(f"  max|d| vs unroll=1: {np.abs(got - ref).max():.3e}",
                  flush=True)


if __name__ == "__main__":
    main()
