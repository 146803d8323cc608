"""Micro-breakdown inside one transformer block (FFN + attention internals).

Run from repo root: python tools/block_breakdown.py
"""

import os
import sys
import time
import math

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
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        fence(out)
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{name:40s} {best * 1e3:8.2f} ms", flush=True)
    return best


def main():
    from propainter_tpu.ops.patches import overlap_renorm
    from propainter_tpu.models.propainter import (
        _window_partition, _valid_rolled_indices)

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    T, h, w = 19, 60, 108
    fh, fw = 20, 36
    C = 512
    n = T * fh * fw  # 13680 tokens

    x = jnp.asarray(rng.standard_normal((1, n, 1960)), dt)
    xc = jnp.asarray(rng.standard_normal((1, n, C)), dt)
    w1 = jnp.asarray(rng.standard_normal((C, 1960)) * 0.02, dt)
    w2 = jnp.asarray(rng.standard_normal((1960, C)) * 0.02, dt)

    timeit("fc1 matmul", jax.jit(lambda a, b: a @ b), xc, w1)
    timeit("renorm (matmul form)", jax.jit(
        lambda a: overlap_renorm(a.reshape(-1, fh * fw, 1960), (h, w),
                                 (7, 7), (3, 3), (3, 3))), x)
    timeit("gelu exact", jax.jit(
        lambda a: jax.nn.gelu(a, approximate=False)), x)
    timeit("gelu tanh", jax.jit(
        lambda a: jax.nn.gelu(a, approximate=True)), x)
    timeit("fc2 matmul", jax.jit(lambda a, b: a @ b), x, w2)
    timeit("ffn chain (no renorm)", jax.jit(
        lambda a, b, c: jax.nn.gelu(a @ b, approximate=False) @ c),
        xc, w1, w2)

    # ---- attention internals
    n_head, ch = 4, 128
    window = (5, 9)
    xs = jnp.asarray(rng.standard_normal((1, T, fh, fw, C)), dt)
    qw = jnp.asarray(rng.standard_normal((C, C)) * 0.02, dt)

    def qkv(xs, qw):
        return xs @ qw, xs @ qw, xs @ qw

    timeit("qkv dense x3", jax.jit(qkv), xs, qw)

    k = jnp.asarray(rng.standard_normal((1, T, fh, fw, C)), dt)
    valid_idx = _valid_rolled_indices(window, (3, 5))
    shifts = [(-3, -5), (-3, 5), (3, -5), (3, 5)]

    def rolls(k):
        rk = [_window_partition(jnp.roll(k, s, axis=(2, 3)), window, n_head)
              for s in shifts]
        out = jnp.concatenate(rk, axis=4)[:, :, :, :, valid_idx]
        return out

    timeit("4 rolls+partition+sel (k only)", jax.jit(rolls), k)

    nW = 16
    Ts = 10
    k_tok = 45 + len(valid_idx) + 45
    win_q = jnp.asarray(rng.standard_normal((1, nW, n_head, T * 45, ch)), dt)
    win_k = jnp.asarray(
        rng.standard_normal((1, nW, n_head, Ts * k_tok, ch)), dt)
    win_v = jnp.asarray(
        rng.standard_normal((1, nW, n_head, Ts * k_tok, ch)), dt)
    scale = 1.0 / math.sqrt(ch)

    def branch_a(q, kk, vv):
        att = jnp.einsum("bwhqc,bwhkc->bwhqk", q, kk,
                         preferred_element_type=jnp.float32) * scale
        att = jax.nn.softmax(att, axis=-1).astype(q.dtype)
        return jnp.einsum("bwhqk,bwhkc->bwhqc", att, vv,
                          preferred_element_type=jnp.float32).astype(q.dtype)

    timeit(f"branch A attention (keys={Ts * k_tok})", jax.jit(branch_a),
           win_q, win_k, win_v)

    def branch_a_logits(q, kk):
        return jnp.einsum("bwhqc,bwhkc->bwhqk", q, kk,
                          preferred_element_type=jnp.float32)

    timeit("  logits einsum only", jax.jit(branch_a_logits), win_q, win_k)

    wq5 = jnp.asarray(
        rng.standard_normal((1, nW, n_head, T, 45, ch)), dt)
    wk5 = jnp.asarray(
        rng.standard_normal((1, nW, n_head, T, 45, ch)), dt)

    def branch_b(q, kk):
        att = jnp.einsum("bwhtqc,bwhtkc->bwhtqk", q, kk,
                         preferred_element_type=jnp.float32) * scale
        att = jax.nn.softmax(att, axis=-1).astype(q.dtype)
        return jnp.einsum("bwhtqk,bwhtkc->bwhtqc", att, kk,
                          preferred_element_type=jnp.float32).astype(q.dtype)

    timeit("branch B attention", jax.jit(branch_b), wq5, wk5)


if __name__ == "__main__":
    main()
