"""Decompose the RAFT stage into per-component device times.

encode (80 unique frames) / transposed corr pyramid / fused window lookup /
refine at several iteration counts (slope = per-iteration cost) / convex
upsampling. Methodology as tools/stage4_breakdown.py: back-to-back
dispatches fenced once (a fence per call would measure the ~30 ms tunnel).

Run from the repo root with nothing else using the TPU:
  python tools/raft_breakdown.py
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


def timeit(name, fn, *args, n=6):
    out = fn(*args)
    fence(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        fence(out)
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{name:36s} {best * 1e3:8.1f} ms", flush=True)
    return out


def main():
    from bench import build_pipeline, T, H, W
    from propainter_tpu.ops.corr_pallas import corr_pyramid_t, corr_lookup_fused
    from propainter_tpu.models.raft import upsample_flow_convex

    pipe = build_pipeline("bf16")
    rp = pipe.raft_params
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.standard_normal((T, H, W, 3)), jnp.float32)

    enc = jax.jit(lambda p, x: pipe.raft.apply({"params": p}, x,
                                               method="encode"))
    fmap, net, inp = timeit("encode (unique frames)", enc, rp, frames)

    def mkpairs(fmap, net, inp):
        def pairs(x):
            x = x.reshape((1, T) + x.shape[1:])
            return (x[:, :-1].reshape((T - 1,) + x.shape[2:]),
                    x[:, 1:].reshape((T - 1,) + x.shape[2:]))
        fm1, fm2 = pairs(fmap)
        nt1, _ = pairs(net)
        in1, _ = pairs(inp)
        return (jnp.concatenate([fm1, fm2]), jnp.concatenate([fm2, fm1]),
                jnp.concatenate([nt1, nt1]), jnp.concatenate([in1, in1]))

    fmap1, fmap2, net_b, inp_b = jax.jit(mkpairs)(fmap, net, inp)
    print(f"pair batch: {fmap1.shape}")

    pyrT = timeit("corr_pyramid_t", jax.jit(corr_pyramid_t), fmap1, fmap2)
    Hc, Wc = fmap1.shape[1:3]
    coords = jnp.asarray(
        rng.uniform(0, min(Hc, Wc), (fmap1.shape[0], Hc, Wc, 2)), jnp.float32)
    timeit("corr_lookup_fused (1 iter's)", jax.jit(
        lambda p, c: corr_lookup_fused(list(p), c, 4)), tuple(pyrT), coords)

    flow = jnp.asarray(
        rng.standard_normal((fmap1.shape[0], Hc, Wc, 2)), jnp.float32)
    um = jnp.asarray(
        rng.standard_normal((fmap1.shape[0], Hc, Wc, 576)), jnp.float32)
    timeit("upsample_flow_convex", jax.jit(upsample_flow_convex), flow, um)

    times = {}
    for it in (1, 5, 20):
        ref = jax.jit(lambda p, a, b, c, d, it=it: pipe.raft.apply(
            {"params": p}, a, b, c, d, it, method="refine"))
        out = ref(rp, fmap1, fmap2, net_b, inp_b)
        fence(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(2):
                out = ref(rp, fmap1, fmap2, net_b, inp_b)
            fence(out)
            best = min(best, (time.perf_counter() - t0) / 2)
        times[it] = best
        print(f"{'refine iters=%d' % it:36s} {best * 1e3:8.1f} ms",
              flush=True)
    slope = (times[20] - times[5]) / 15
    fixed = times[1] - slope
    print("-" * 48)
    print(f"{'per-iteration (slope)':36s} {slope * 1e3:8.1f} ms")
    print(f"{'fixed (pyramid+upsample+misc)':36s} {fixed * 1e3:8.1f} ms")


if __name__ == "__main__":
    main()
