"""A/B the fold_dense_conv lowering at the FusionFFN fc1 / SoftComp shapes.

Variants (same math, different XLA lowerings):
  dilated — current: one lhs-dilated conv (XLA phase-decomposes into s*s
            convs with C output channels; C=40 for fc1 -> ~31% lane util).
  phase   — explicit: ONE stride-1 conv with s*s*C output channels
            (full lanes, 1.65x im2col FLOPs) + depth-to-space.
  matmul  — token matmul (M=B*L, K=Cin, N=C*k*k; clean MXU) + fold_matmul.

Each runs inside a 16-iteration lax.scan over varying inputs (no hoisting),
one fence at the end — the same harness as tools/stage4_scan_breakdown.py.

Run from the repo root with NOTHING else on the chip:
    python tools/ffn_fold_ab.py
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

from propainter_tpu.ops.patches import fold_dense_conv, fold_matmul

N = 16
T = 19
h, w = 60, 108
FH, FW = 20, 36
KERNEL, STRIDE, PADDING = (7, 7), (3, 3), (3, 3)
DT = jnp.bfloat16


def fence(x):
    np.asarray(jax.tree.leaves(x)[0].ravel()[0])


def timed_scan(name, fn, args, xs, n_meas=4):
    @jax.jit
    def run(args, xs):
        def body(carry, x):
            y = fn(args, x)
            return carry + y.ravel()[:1].astype(jnp.float32), None
        acc, _ = jax.lax.scan(body, jnp.zeros((1,), jnp.float32), xs)
        return acc

    fence(run(args, xs))
    best = float("inf")
    for _ in range(n_meas):
        t0 = time.perf_counter()
        fence(run(args, xs))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:38s} {best / N * 1e3:7.3f} ms/call  ({best*1e3:7.1f} /16)",
          flush=True)


def case(tag, cin, c):
    key = jax.random.PRNGKey(0)
    kernel = 0.02 * jax.random.normal(key, (cin, c * 49), DT)
    bias = 0.1 * jax.random.normal(key, (c * 49,), DT)
    xs = jax.random.normal(key, (N, T, FH, FW, cin), DT)
    fence(xs)

    print(f"-- {tag}: Cin={cin} C={c} tokens {T}x{FH}x{FW} -> {T}x{h}x{w}")

    def dilated(a, x):
        return fold_dense_conv(x, a["k"], a["b"], (h, w), KERNEL, STRIDE,
                               PADDING).astype(DT)

    def phase(a, x):
        return fold_dense_conv(x, a["k"], a["b"], (h, w), KERNEL, STRIDE,
                               PADDING, impl="phase").astype(DT)

    def matmul(a, x):
        taps = (x.reshape(x.shape[0], FH * FW, cin) @ a["k"]
                + a["b"]).astype(DT)
        return fold_matmul(taps, (h, w), KERNEL, STRIDE,
                           PADDING).astype(DT)

    args = {"k": kernel, "b": bias}

    # correctness first (single call, fp32 compare on one frame)
    x1 = np.asarray(xs[0, :1], np.float32)
    outs = {}
    for nm, f in (("dilated", dilated), ("phase", phase), ("matmul", matmul)):
        outs[nm] = np.asarray(jax.jit(f)(
            {"k": kernel.astype(jnp.float32), "b": bias.astype(jnp.float32)},
            jnp.asarray(x1)), np.float32)
    for nm in ("phase", "matmul"):
        d = np.abs(outs[nm] - outs["dilated"])
        scale = np.abs(outs["dilated"]).mean()
        print(f"  {nm} vs dilated: max|d| {d.max():.3e} (mean|ref| "
              f"{scale:.3e})", flush=True)

    for nm, f in (("dilated", dilated), ("phase", phase), ("matmul", matmul)):
        timed_scan(f"  {nm}", f, args, xs)


def main():
    case("FusionFFN fc1", 512, 40)
    case("SoftComp embedding", 512, 128)


if __name__ == "__main__":
    main()
