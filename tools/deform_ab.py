"""A/B the deform-conv formulations at flow-completion scan-step shapes.

Run from repo root: python tools/deform_ab.py
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


def timeit(name, fn, *args, n=30):
    out = fn(*args)
    fence(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        fence(out)
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{name:44s} {best * 1e3:8.2f} ms", flush=True)


def col_first_mxu(x, offset, mask, weight, bias, row_chunk):
    """Prototype: contract the (wider) W dim on the MXU first, then reduce H
    elementwise — W=54/108 vs H=30/60 contraction lanes."""
    B, H, W, C = x.shape
    kh, kw, Cw, O = weight.shape
    K = kh * kw
    _, Ho, Wo, dg, _, _ = offset.shape
    Cg = C // dg

    ky = jnp.arange(kh, dtype=x.dtype) - 1.0
    kx = jnp.arange(kw, dtype=x.dtype) - 1.0
    py = (jnp.arange(Ho, dtype=x.dtype)[:, None, None]
          + jnp.broadcast_to(ky[:, None], (kh, kw)).reshape(-1))
    px = (jnp.arange(Wo, dtype=x.dtype)[None, :, None]
          + jnp.broadcast_to(kx[None, :], (kh, kw)).reshape(-1))
    sy = py[None, :, :, None, :] + offset[..., 0]
    sx = px[None, :, :, None, :] + offset[..., 1]

    x_g = x.reshape(B, H, W, dg, Cg).transpose(0, 3, 1, 2, 4)
    x_hw = x_g.reshape(B * dg, H, W, Cg)

    iot_h = jax.lax.broadcasted_iota(x.dtype, (H,), 0)
    iot_w = jax.lax.broadcasted_iota(x.dtype, (W,), 0)

    n_chunks = -(-Ho // row_chunk)
    pad_rows = n_chunks * row_chunk - Ho
    if pad_rows:
        sy = jnp.pad(sy, ((0, 0), (0, pad_rows), (0, 0), (0, 0), (0, 0)),
                     constant_values=-2.0)
        sx = jnp.pad(sx, ((0, 0), (0, pad_rows), (0, 0), (0, 0), (0, 0)),
                     constant_values=-2.0)

    def to_chunks(s):
        s = s.transpose(1, 0, 3, 4, 2)
        s = s.reshape(n_chunks, row_chunk, B, dg, K, Wo)
        s = s.transpose(0, 2, 3, 4, 1, 5)
        return s.reshape(n_chunks, B * dg, K, row_chunk * Wo)

    sy_c = to_chunks(sy)
    sx_c = to_chunks(sx)

    def chunk_fn(args):
        syk, sxk = args  # (BG, K, P)
        Sx = jax.nn.relu(1.0 - jnp.abs(sxk[..., None] - iot_w))  # (BG,K,P,W)
        Sy = jax.nn.relu(1.0 - jnp.abs(syk[..., None] - iot_h))  # (BG,K,P,H)
        tmp = jnp.einsum("gkpw,ghwc->gkphc", Sx, x_hw,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        val = jnp.einsum("gkph,gkphc->gkpc", Sy, tmp,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        return val

    vals = jax.lax.map(chunk_fn, (sy_c, sx_c))
    vals = vals.reshape(n_chunks, B, dg, K, row_chunk, Wo, Cg)
    vals = vals.transpose(1, 0, 4, 5, 2, 3, 6)
    vals = vals.reshape(B, n_chunks * row_chunk, Wo, dg, K, Cg)
    if pad_rows:
        vals = vals[:, :Ho]
    sampled = vals * mask[..., None]
    sampled = sampled.transpose(0, 1, 2, 4, 3, 5).reshape(B, Ho, Wo, K * C)
    w = weight.reshape(K, C, O).reshape(K * C, O)
    out = jnp.einsum("bhwk,ko->bhwo", sampled, w,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    return out + bias


def main():
    from propainter_tpu.ops.deform import (
        modulated_deform_conv2d_mxu, modulated_deform_conv2d_banded)

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    # flow-completion SecondOrderDeformableAlignment step shapes:
    # x = (prop1, prop2) stacked -> 256ch, cond drives offsets; B=2 (fwd+bwd)
    B, H, W, C, dg = 2, 30, 54, 256, 16
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), dt)
    offset = jnp.asarray(5 * np.tanh(rng.standard_normal((B, H, W, dg, 9, 2))), dt)
    mask = jnp.asarray(rng.uniform(0, 1, (B, H, W, dg, 9)), dt)
    weight = jnp.asarray(rng.standard_normal((3, 3, C, 128)) * 0.05, dt)
    bias = jnp.asarray(rng.standard_normal((128,)) * 0.05, dt)

    mxu = jax.jit(lambda *a: modulated_deform_conv2d_mxu(*a))
    banded = jax.jit(lambda *a: modulated_deform_conv2d_banded(*a, band=8))
    timeit("flowcomp-shape mxu (adaptive chunks)", mxu, x, offset, mask,
           weight, bias)
    for rc in (8, 15, 30):
        fn = jax.jit(
            lambda *a, rc=rc: col_first_mxu(*a, row_chunk=rc))
        timeit(f"flowcomp-shape COL-FIRST (rc={rc})", fn, x, offset, mask,
               weight, bias)
    ref = np.asarray(mxu(x, offset, mask, weight, bias), np.float32)
    got = np.asarray(jax.jit(lambda *a: col_first_mxu(*a, row_chunk=30))(
        x, offset, mask, weight, bias), np.float32)
    print("col-first max err:", np.abs(ref - got).max())
    timeit("flowcomp-shape banded", banded, x, offset, mask, weight, bias)

    # generator DeformableAlignment step shapes (for context; flow offsets
    # unbounded there so banded is not applicable in the model)
    B, H, W, C, dg = 1, 60, 108, 128, 16
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), dt)
    offset = jnp.asarray(3 * np.tanh(rng.standard_normal((B, H, W, dg, 9, 2))), dt)
    mask = jnp.asarray(rng.uniform(0, 1, (B, H, W, dg, 9)), dt)
    weight = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, dt)
    bias = jnp.asarray(rng.standard_normal((C,)) * 0.05, dt)
    mxu8 = jax.jit(lambda *a: modulated_deform_conv2d_mxu(*a, row_chunk=8))
    timeit("generator-shape mxu (rc=8)", mxu8, x, offset, mask, weight, bias)
    for rc in (8, 15, 20, 30, 60):
        fn = jax.jit(lambda *a, rc=rc: col_first_mxu(*a, row_chunk=rc))
        timeit(f"generator-shape COL-FIRST (rc={rc})", fn, x, offset, mask,
               weight, bias)


if __name__ == "__main__":
    main()
