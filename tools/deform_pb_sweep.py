"""Sweep the deform kernel's position-block size (grid program count).

_pick_pos_block originally minimized pad waste over 256..768; at the
flowcomp prop shape (P=1620) that gave PB=256 -> 224 grid programs per
call, and the prop scan runs 158 of them per video. Per-program overhead
may dominate: sweep PB at the two hot shapes inside a 16-step scan
harness (the in-scan cost is what the pipeline pays).

Run from the repo root with nothing else using the TPU:
    python tools/deform_pb_sweep.py
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

import propainter_tpu.ops.deform_pallas as dp

N = 16
DT = jnp.bfloat16


def fence(x):
    np.asarray(jax.tree.leaves(x)[0].ravel()[0])


def case(tag, B, H, W, C, O):
    key = jax.random.PRNGKey(0)
    dg = 16
    kernel = 0.02 * jax.random.normal(key, (3, 3, C, O), DT)
    bias = jnp.zeros((O,), DT)

    @jax.jit
    def make_inputs(k):
        return {
            "x": jax.random.normal(jax.random.fold_in(k, 0),
                                   (N, B, H, W, C), DT),
            "o": jax.random.normal(jax.random.fold_in(k, 1),
                                   (N, B, H, W, dg, 9, 2), DT),
            "m": jax.random.normal(jax.random.fold_in(k, 2),
                                   (N, B, H, W, dg, 9), DT),
        }

    xs = make_inputs(jax.random.PRNGKey(1))
    fence(xs)
    P = H * W
    print(f"-- {tag} (P={P})", flush=True)

    ref = None
    for pb in (256, 512, 896, 1664, 3328, 6528):
        if pb > -(-P // 128) * 128:
            continue
        os.environ["DEFORM_PB"] = str(pb)

        def step(carry, inp):
            x = inp["x"].at[..., :O].add(0.1 * carry)
            out = dp.modulated_deform_conv2d_fused_out(
                x, inp["o"], inp["m"], kernel, bias)
            return out, ()

        f = jax.jit(lambda xs: jax.lax.scan(
            step, jnp.zeros((B, H, W, O), DT), xs)[0])
        out = f(xs)
        fence(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = f(xs)
            fence(out)
            best = min(best, (time.perf_counter() - t0) / N * 1e3)
        n_prog = B * (-(-P // pb)) * dg
        print(f"  PB={pb:5d} ({n_prog:4d} programs) {best:7.3f} ms/call",
              flush=True)
        if ref is None:
            ref = out
        else:
            d = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                      - ref.astype(jnp.float32))))
            print(f"      max|diff vs PB=256| = {d:.2e}", flush=True)
    del os.environ["DEFORM_PB"]


def main():
    case("flowcomp prop step (B=2,30x54,C=256->128)", 2, 30, 54, 256, 128)
    case("generator featprop step (B=1,60x108,C=128->128)",
         1, 60, 108, 128, 128)


if __name__ == "__main__":
    main()
