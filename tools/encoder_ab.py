"""A/B: stage-4 encoder grouped-conv lowering variants.

The encoder runs at ~44 TF/s (21.6 ms for 19 frames, ~950 GFLOP) — well
under the v5e bf16 peak. Suspects: the grouped fusion convs
(feature_group_count lowering) and the low-channel high-res head.

Variants:
  grouped   nn.Conv(feature_group_count=g)       (current)
  split     g dense convs on channel slices + concat
  batchmm   im2col + per-group batched einsum (MXU directly)

Run from the repo root with nothing else using the TPU:
  python tools/encoder_ab.py
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


def timeit(name, fn, *args, n=12):
    out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    fence(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:36s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    T = 19
    h, w = 60, 108

    # ---- the fusion-stage grouped convs at their real shapes
    # (cin includes the regrouped stage-8 skip concat)
    specs = [
        ("layers_10 g=2 640->512", 640, 512, 2),
        ("layers_12 g=4 768->384", 768, 384, 4),
        ("layers_14 g=8 640->256", 640, 256, 8),
    ]
    for name, cin, cout, g in specs:
        x = jax.random.normal(key, (T, h, w, cin), dt)
        k = jax.random.normal(key, (3, 3, cin // g, cout), dt) * 0.02

        @jax.jit
        def grouped(x, k):
            return jax.lax.conv_general_dilated(
                x, k, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=g,
                preferred_element_type=jnp.float32).astype(dt)

        @jax.jit
        def split(x, k):
            outs = []
            cig, cog = cin // g, cout // g
            for i in range(g):
                outs.append(jax.lax.conv_general_dilated(
                    x[..., i * cig:(i + 1) * cig],
                    k[..., i * cog:(i + 1) * cog], (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32))
            return jnp.concatenate(outs, -1).astype(dt)

        @jax.jit
        def batchmm(x, k):
            cig, cog = cin // g, cout // g
            # im2col: 9 shifted copies -> (T*h*w, 9, g, cig)
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            taps = [xp[:, i:i + h, j:j + w] for i in range(3)
                    for j in range(3)]
            col = jnp.stack(taps, axis=-2)            # (T,h,w,9,cin)
            col = col.reshape(T * h * w, 9, g, cig)
            kk = k.reshape(9, g, cig, cog)
            out = jnp.einsum("ntgc,tgcd->ngd", col, kk,
                             preferred_element_type=jnp.float32)
            return out.reshape(T, h, w, cout).astype(dt)

        gflop = 2 * T * h * w * 9 * (cin // g) * cout / 1e9
        ta = timeit(f"{name} grouped", grouped, x, k)
        tb = timeit(f"{name} split", split, x, k)
        tc = timeit(f"{name} batchmm", batchmm, x, k)
        print(f"   {gflop:.1f} GFLOP -> grouped {gflop/ta/1e3:.0f}"
              f" / split {gflop/tb/1e3:.0f}"
              f" / batchmm {gflop/tc/1e3:.0f} TF/s", flush=True)

    # ---- the high-res head convs
    H, W = 240, 432
    for name, cin, cout, stride, hh, ww in [
            ("layers_0 5->64 s2 @240x432", 5, 64, 2, H, W),
            ("layers_2 64->64 @120x216", 64, 64, 1, H // 2, W // 2),
            ("layers_4 64->128 s2 @120x216", 64, 128, 2, H // 2, W // 2)]:
        x = jax.random.normal(key, (T, hh, ww, cin), dt)
        k = jax.random.normal(key, (3, 3, cin, cout), dt) * 0.02

        @jax.jit
        def conv(x, k):
            return jax.lax.conv_general_dilated(
                x, k, (stride, stride), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(dt)

        ho, wo = hh // stride, ww // stride
        gflop = 2 * T * ho * wo * 9 * cin * cout / 1e9
        t = timeit(name, conv, x, k)
        print(f"   {gflop:.1f} GFLOP -> {gflop/t/1e3:.0f} TF/s", flush=True)


if __name__ == "__main__":
    main()
