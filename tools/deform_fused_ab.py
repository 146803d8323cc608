"""A/B: modulated_deform_conv2d_mxu out_fused=True vs False.

out_fused moves the mask multiply + (K*C, O) output contraction inside the
per-chunk lax.map body (weight pre-permuted to the natural (dg, K, Cg)
order), so the (B, Ho, Wo, K*C) sampled tensor and its two big transposes
never exist. 16-iteration scan harness, generator + flowcomp shapes.

Run from the repo root with NOTHING else on the chip:
    python tools/deform_fused_ab.py
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

from propainter_tpu.ops.deform import modulated_deform_conv2d_mxu
from propainter_tpu.ops.deform_pallas import modulated_deform_conv2d_fused_out

N = 16
DT = jnp.bfloat16


def fence(x):
    np.asarray(jax.tree.leaves(x)[0].ravel()[0])


def case(tag, B, H, W, C, O, rc, with_flow):
    key = jax.random.PRNGKey(0)
    dg = 16
    kernel = 0.02 * jax.random.normal(key, (3, 3, C, C if O is None else O),
                                      DT)
    bias = jnp.zeros((kernel.shape[-1],), DT)
    spec = {"x": ((B, H, W, C), DT), "o": ((B, H, W, dg, 9, 2), DT),
            "m": ((B, H, W, dg, 9), DT)}
    if with_flow:
        spec["fl"] = ((B, H, W, 2), DT)

    @jax.jit
    def make_inputs(k):
        out = {}
        for i, (kk, (shape, dt)) in enumerate(sorted(spec.items())):
            out[kk] = jax.random.normal(jax.random.fold_in(k, i), (N,) + shape,
                                        dt)
        return out

    xs = make_inputs(jax.random.PRNGKey(1))
    fence(xs)
    print(f"-- {tag}", flush=True)

    for fused in (False, True, "pallas"):
        def f(a, x):
            off = 3.0 * jnp.tanh(x["o"])
            if with_flow:
                off = off + x["fl"][..., None, None, :]
            if fused == "pallas":
                return modulated_deform_conv2d_fused_out(
                    x["x"], off, jax.nn.sigmoid(x["m"]), a["k"], a["b"])
            return modulated_deform_conv2d_mxu(
                x["x"], off, jax.nn.sigmoid(x["m"]), a["k"], a["b"],
                row_chunk=rc, out_fused=fused)

        @jax.jit
        def run(a, xs):
            def body(carry, x):
                y = f(a, x)
                return carry + y.ravel()[:1].astype(jnp.float32), None
            acc, _ = jax.lax.scan(body, jnp.zeros((1,), jnp.float32), xs)
            return acc

        args = {"k": kernel, "b": bias}
        fence(run(args, xs))
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            fence(run(args, xs))
            best = min(best, time.perf_counter() - t0)
        print(f"  out_fused={fused}:  {best / N * 1e3:7.3f} ms/call",
              flush=True)


def main():
    case("generator featprop (1,60,108,128) rc=8 +flow", 1, 60, 108, 128,
         128, 8, True)
    case("flowcomp prop (2,30,54,256->128) rc=adaptive", 2, 30, 54, 256,
         128, None, False)


if __name__ == "__main__":
    main()
