"""A/B: layout strategies for the flowcomp decoder TAIL — the C<=32
full-res ops that measure 5-10x over bandwidth roofline under NHWC
(lane padding: C=32 pads 4x, C=2 pads 64x; tools/flowcomp_dec_breakdown).

Candidates for the `ups` pair [resize (120,216,32)->(240,432) + conv 32->2,
23.6 ms NHWC baseline]:
  * nhwc      — current model path (resize impl='mxu' + NHWC conv)
  * nchw      — transpose to (B,C,H,W) once, resize via einsum over the two
                minor dims (W pads 432->512 = 1.19x instead of 64x), conv
                with NCHW dimension numbers, output (B,2,H,W)
  * hpack     — H packed by 4 into lanes: (B,30,216,128)-style tensors,
                3x3 conv as a block-structured packed kernel, W-resize as a
                full-lane einsum, H-resize as a packed einsum
All variants are checked against the NHWC reference on the same inputs
(bf16 tolerance) before timing.

Run from the repo root with nothing else using the TPU:
    python tools/packed_tail_ab.py [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from propainter_tpu.utils.jax_cache import enable_persistent_cache


def fence(x):
    import jax

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
    print(f"{name:58s} {best:8.2f} ms", flush=True)
    return out


def resize_weights(n_out, n_in):
    """align_corners=True bilinear row matrix (n_out, n_in), fp32."""
    pos = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    i0 = np.clip(np.floor(pos).astype(np.int64), 0, n_in - 2)
    f = pos - i0
    R = np.zeros((n_out, n_in), np.float32)
    R[np.arange(n_out), i0] = 1 - f
    R[np.arange(n_out), i0 + 1] = f
    return R


def pack_kernel_h(k, p):
    """(kh, kw, ci, co) 3x3 'same' kernel -> H-packed block kernel
    (kh', kw, p*ci, p*co) with kh'=3: output phase po at row p*h'+po reads
    input rows p*h'+po+d (d=-1..1) = packed (h'+q, pi) with
    q*p+pi = po+d."""
    kh, kw, ci, co = k.shape
    assert kh == 3
    kp = np.zeros((3, kw, p * ci, p * co), k.dtype)
    for po in range(p):
        for d in (-1, 0, 1):
            t = po + d
            q, pi = t // p, t % p
            # packed kernel tap index along h': q + 1 (q in -1..1)
            kp[q + 1, :, pi * ci:(pi + 1) * ci, po * co:(po + 1) * co] = \
                k[d + 1]
    return kp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    enable_persistent_cache()
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from propainter_tpu.ops.interp import resize

    rng = np.random.default_rng(0)
    B = 4 if args.cpu else 158
    H, W, C = 120, 216, 32
    P = 4
    dt = jnp.bfloat16

    y = jnp.asarray(rng.standard_normal((B, H, W, C)), dt)
    k = rng.standard_normal((3, 3, C, 2)).astype(np.float32) * 0.1
    b = rng.standard_normal((2,)).astype(np.float32) * 0.1
    kj = jnp.asarray(k, dt)
    bj = jnp.asarray(b, dt)

    Rh = resize_weights(2 * H, H)
    Rw = resize_weights(2 * W, W)
    Rhj = jnp.asarray(Rh, dt)
    Rwj = jnp.asarray(Rw, dt)

    # ---- nhwc baseline (model path)
    def nhwc(v):
        u = resize(v, (2 * H, 2 * W), "bilinear", True, impl="mxu")
        return jax.lax.conv_general_dilated(
            u, kj, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bj

    # ---- nchw: one entry transpose, einsum resizes, NCHW conv
    def nchw(v):
        t = v.transpose(0, 3, 1, 2)                      # (B, C, H, W)
        u = jnp.einsum("oh,bchw->bcow", Rhj, t)
        u = jnp.einsum("pw,bchw->bchp", Rwj, u)          # (B, C, 2H, 2W)
        out = jax.lax.conv_general_dilated(
            u, kj, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NCHW", "HWIO", "NCHW"))
        return out + bj[None, :, None, None]

    # ---- hpack: (B, H/P, W, P*C) tensors end to end
    kp = jnp.asarray(pack_kernel_h(k, P), dt)
    # packed H-resize matrix: out (h'o, po) <- in (h'i, pi)
    Rhp = Rh.reshape(2 * H // P, P, H // P, P)
    Rhpj = jnp.asarray(Rhp, dt)

    def hpack(v):
        # pack: (B, h', w, p*C) with h-phase major in the lane dim
        t = v.reshape(B, H // P, P, W, C).transpose(0, 1, 3, 2, 4)
        t = t.reshape(B, H // P, W, P * C)
        # W resize at full lanes
        u = jnp.einsum("pw,bhwc->bhpc", Rwj, t)          # (B, 30, 432, 128)
        # H resize in packed form
        u5 = u.reshape(B, H // P, 2 * W, P, C)
        z = jnp.einsum("OoIi,bIwic->bOwoc", Rhpj, u5)
        z = z.reshape(B, 2 * H // P, 2 * W, P * C)
        # packed conv
        out = jax.lax.conv_general_dilated(
            z, kp, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = out + jnp.tile(bj, P)
        # unpack
        out = out.reshape(B, 2 * H // P, 2 * W, P, 2)
        return out.transpose(0, 1, 3, 2, 4).reshape(B, 2 * H, 2 * W, 2)

    f_nhwc = jax.jit(nhwc)
    f_nchw = jax.jit(nchw)
    f_hpack = jax.jit(hpack)

    ref = np.asarray(f_nhwc(y), np.float32)
    got_nchw = np.asarray(f_nchw(y), np.float32).transpose(0, 2, 3, 1)
    got_hp = np.asarray(f_hpack(y), np.float32)
    s = np.abs(ref).mean()
    print(f"|ref| mean {s:.3f}; nchw max|d| "
          f"{np.abs(got_nchw - ref).max():.4f}; hpack max|d| "
          f"{np.abs(got_hp - ref).max():.4f}", flush=True)

    timeit("ups tail nhwc (resize mxu + conv)", f_nhwc, y)
    timeit("ups tail nchw (transpose + einsum + nchw conv)", f_nchw, y)
    timeit("ups tail hpack (packed kernel + einsums)", f_hpack, y)


if __name__ == "__main__":
    main()
