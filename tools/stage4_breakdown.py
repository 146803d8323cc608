"""Decompose one stage-4 generator window into per-component device times.

Times each sub-module of InpaintGenerator (encoder, feature propagation,
transformer stack, soft split/comp, decoder) as separate jitted calls.
Per-call device time is measured by dispatching N back-to-back calls and
fencing ONCE at the end (async dispatch overlaps the ~30 ms tunnel RTT;
a fence per call would measure the tunnel).

Run from the repo root: python tools/stage4_breakdown.py
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


def timeit(name, fn, *args, n=8):
    out = fn(*args)  # compile
    fence(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    fence(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:32s} {dt * 1e3:8.1f} ms")
    return dt


def main():
    from bench import build_pipeline
    from propainter_tpu.models.propainter import (
        Encoder, FeaturePropagation, SoftSplit, SoftComp,
        TemporalSparseTransformer, FusionFeedForward, SparseWindowAttention,
        _Deconv, conv2d, leaky_relu, max_pool2d, KERNEL, STRIDE, PADDING)
    from propainter_tpu.ops.interp import resize

    pipe = build_pipeline("bf16")
    p = pipe._inpaint_params_c
    dt = jnp.bfloat16

    l_t, ref_pad = 11, 8
    T = l_t + ref_pad
    H, W = 240, 432
    h, w, c = 60, 108, 128
    rng = np.random.default_rng(0)

    frames = jnp.asarray(rng.standard_normal((1, T, H, W, 3)), dt)
    masks_in = jnp.asarray(rng.integers(0, 2, (1, T, H, W, 1)), dt)
    masks_upd = jnp.asarray(rng.integers(0, 2, (1, T, H, W, 1)), dt)
    flows_f = jnp.asarray(rng.standard_normal((1, l_t - 1, H, W, 2)), dt)
    flows_b = jnp.asarray(rng.standard_normal((1, l_t - 1, H, W, 2)), dt)
    frame_valid = np.ones(T, np.bool_)

    # ---- full generator (reference point)
    @jax.jit
    def full(p, frames, ff, fb, mi, mu):
        return pipe.inpaint.apply({"params": p}, frames, (ff, fb), mi, mu,
                                  l_t, frame_valid=frame_valid)

    t_full = timeit("FULL generator", full, p, frames, flows_f, flows_b,
                    masks_in, masks_upd, n=4)

    # ---- encoder
    enc_in = jnp.concatenate([frames, masks_in, masks_upd], -1).reshape(
        T, H, W, 5)

    @jax.jit
    def enc(p, x):
        return Encoder().apply({"params": p["encoder"]}, x)

    t_enc = timeit("encoder (T frames)", enc, p, enc_in)
    enc_feat = enc(p, enc_in).reshape(1, T, h, w, c)
    local_feat = enc_feat[:, :l_t]

    # ---- downsampled flows/masks
    ds_ff = jnp.asarray(rng.standard_normal((1, l_t - 1, h, w, 2)), dt)
    ds_fb = jnp.asarray(rng.standard_normal((1, l_t - 1, h, w, 2)), dt)
    ds_mask2 = jnp.asarray(rng.integers(0, 2, (1, l_t, h, w, 2)), dt)

    @jax.jit
    def featprop(p, x, ff, fb, m):
        return FeaturePropagation(128).apply(
            {"params": p["feat_prop_module"]}, x, ff, fb, m)

    t_fp = timeit("feature propagation", featprop, p, local_feat, ds_ff,
                  ds_fb, ds_mask2)

    # ---- soft split
    @jax.jit
    def ss(p, x):
        return SoftSplit(512).apply({"params": p["ss"]},
                                    x.reshape(-1, h, w, c), 1, (h, w))

    t_ss = timeit("soft split", ss, p, enc_feat)
    trans_feat = ss(p, enc_feat)

    mask_pool = jnp.asarray(
        rng.integers(0, 2, (1, l_t, 20, 36, 1)), dt)

    # ---- one transformer block (dilation pattern 0)
    static_sel = np.zeros(T, np.bool_)
    static_sel[0::2] = True

    @jax.jit
    def one_block(p, x, m):
        return TemporalSparseTransformer(512, name="transformer_0").apply(
            {"params": p["transformers"]["transformer_0"]}, x, (h, w), m,
            (static_sel, jnp.asarray(frame_valid)))

    t_blk = timeit("1 transformer block", one_block, p, trans_feat, mask_pool)

    # ---- attention alone / ffn alone within a block
    @jax.jit
    def attn_only(p, x, m):
        return SparseWindowAttention(512).apply(
            {"params": p["transformers"]["transformer_0"]["attention"]},
            x, m, (static_sel, jnp.asarray(frame_valid)))

    t_attn = timeit("  attention only", attn_only, p, trans_feat, mask_pool)

    @jax.jit
    def ffn_only(p, x):
        B, Tt, hh, ww, C = x.shape
        return FusionFeedForward(512).apply(
            {"params": p["transformers"]["transformer_0"]["mlp"]},
            x.reshape(B, Tt * hh * ww, C), (h, w))

    t_ffn = timeit("  ffn only", ffn_only, p, trans_feat)

    # ---- soft comp
    @jax.jit
    def sc(p, x):
        return SoftComp(128).apply({"params": p["sc"]}, x, T, (h, w))

    t_sc = timeit("soft comp", sc, p, trans_feat)

    # ---- decoder on l_t frames
    dec_in = jnp.asarray(rng.standard_normal((l_t, h, w, c)), dt)

    @jax.jit
    def dec(p, x):
        x = leaky_relu(_Deconv(128, name="decoder_0").apply(
            {"params": p["decoder_0"]}, x), 0.2)
        x = leaky_relu(conv2d(64, 3, 1, 1).apply(
            {"params": p["decoder_2"]}, x), 0.2)
        x = leaky_relu(_Deconv(64, name="decoder_4").apply(
            {"params": p["decoder_4"]}, x), 0.2)
        return conv2d(3, 3, 1, 1).apply({"params": p["decoder_6"]}, x)

    t_dec = timeit("decoder (l_t frames)", dec, p, dec_in)

    print("-" * 44)
    accounted = t_enc + t_fp + t_ss + 8 * t_blk + t_sc + t_dec
    print(f"{'8 x block':32s} {8 * t_blk * 1e3:8.1f} ms")
    print(f"{'sum of parts':32s} {accounted * 1e3:8.1f} ms")
    print(f"{'full':32s} {t_full * 1e3:8.1f} ms")


if __name__ == "__main__":
    main()
