"""A/B: scan unroll factors for the latency-bound propagation scans.

Stages 2 (flow completion) and 3 (image propagation) are sequential scans
whose per-step bodies are tiny; unrolling amortizes loop bookkeeping and
lets XLA fuse across consecutive steps. Numerics are unchanged (unroll is
a pure scheduling knob).

Run from the repo root with nothing else using the TPU:
  python tools/unroll_ab.py
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


def timeit(name, fn, n=3):
    t0 = time.perf_counter()
    out = fn()
    fence(out)
    print(f"{name:34s} compile+1st {time.perf_counter() - t0:6.1f}s",
          flush=True)
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        fence(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:34s} {best * 1e3:8.1f} ms", flush=True)
    return out


def main():
    from bench import build_pipeline, make_inputs
    from propainter_tpu.models.flow_completion import (
        RecurrentFlowCompleteNet, forward_bidirect_flow, combine_flow)
    from propainter_tpu.models.propainter import image_propagation

    pipe = build_pipeline("bf16")
    frames_np, mask_np = make_inputs()
    frames = jnp.asarray(frames_np[None].astype(np.float32) / 255 * 2 - 1)
    masks = jnp.asarray(mask_np[None, ..., None].astype(np.float32))

    gt = pipe.compute_flows(frames)
    fence(gt)
    dt = jnp.bfloat16
    flows_f, flows_b = gt[0].astype(dt), gt[1].astype(dt)
    fmasks = masks.astype(dt)
    fc_params = pipe._flowcomp_params_c

    def stage2(unroll):
        model = RecurrentFlowCompleteNet(scan_unroll=unroll)

        @jax.jit
        def f(params, ff, fb, mk):
            def apply_fn(mf, m, train):
                return model.apply({"params": params}, mf, m, train)
            pred, _ = forward_bidirect_flow(apply_fn, (ff, fb), mk)
            return combine_flow((ff, fb), pred, mk)

        return lambda: f(fc_params, flows_f, flows_b, fmasks)

    for u in (1, 2, 4, 8):
        timeit(f"flowcomp unroll={u}", stage2(u))

    pred = stage2(1)()
    fence(pred)
    fr = frames.astype(dt)
    masked = fr * (1 - fmasks)

    def stage3(unroll):
        @jax.jit
        def f(x, ff, fb, mk):
            return image_propagation(x, ff, fb, mk, "nearest", unroll=unroll)
        return lambda: f(masked, pred[0], pred[1], fmasks)

    for u in (1, 2, 4, 8):
        timeit(f"imgprop unroll={u}", stage3(u))


if __name__ == "__main__":
    main()
