"""Fused (flash-style) attention for SparseWindowAttention's full branch.

The generator's branch-A attention (reference
model/modules/sparse_transformer.py:229-266: masked windows attending over
all selected frames' window + rolled + pooled keys) has, at inference
shapes, 64 (window, head) problems of q=855 x kv=2380 x ch=128. The XLA
formulation materializes the (q, kv) logits tensor — ~260 MB bf16 per
transformer block — and reads/writes it ~4x through softmax (HBM-bound).

One (window, head)'s K/V is only ~0.6 MB bf16: it fits in VMEM whole. So no
online/streaming softmax is needed — each grid program loads K/V once,
computes one q-tile's logits in fp32, softmaxes, and contracts with V
entirely on-chip. The logits never exist in HBM, and the softmax runs in
fp32 at bf16-logits speed (better numerics than the dense bf16 path).

Grid: (N = B*nW*n_head, n_q_blocks). K/V block index maps are constant in
the minor (fastest) grid dimension, so Mosaic keeps them resident across a
problem's q-tiles instead of re-fetching.

Inference-only (no custom VJP); training uses the dense XLA formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale):
    s = jax.lax.dot_general(
        q_ref[0].astype(jnp.float32), k_ref[0].astype(jnp.float32),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale    # (QB, Tk)
    s = s + bias_ref[0]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / l).astype(v_ref.dtype)
    o_ref[0] = jax.lax.dot_general(
        p, v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _pick_q_block(tq_pad: int) -> int:
    for qb in (448, 384, 256, 128):
        if tq_pad % qb == 0:
            return qb
    return tq_pad


def flash_window_attention(q, k, v, key_bias, scale, interpret=None):
    """Softmax(q @ k^T * scale + key_bias) @ v without materializing logits.

    Args:
      q: (B, G, Tq, ch) queries — G problems (e.g. nW * n_head) per batch.
      k, v: (B, G, Tk, ch) keys / values.
      key_bias: (B, Tk) fp32 additive logit bias shared across G (0 for
        live keys, -1e9 for masked frames), or None.
      scale: softmax temperature applied to the logits.
    Returns:
      (B, G, Tq, ch) in q.dtype.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, G, Tq, ch = q.shape
    Tk = k.shape[2]
    N = B * G
    tq_pad = -(-Tq // 128) * 128
    tk_pad = -(-Tk // 128) * 128

    qf = q.reshape(N, Tq, ch)
    kf = k.reshape(N, Tk, ch)
    vf = v.reshape(N, Tk, ch)
    if key_bias is None:
        bias = jnp.zeros((B, Tk), jnp.float32)
    else:
        bias = key_bias.astype(jnp.float32)
    if tq_pad != Tq:
        qf = jnp.pad(qf, ((0, 0), (0, tq_pad - Tq), (0, 0)))
    if tk_pad != Tk:
        kf = jnp.pad(kf, ((0, 0), (0, tk_pad - Tk), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, tk_pad - Tk), (0, 0)))
        bias = jnp.pad(bias, ((0, 0), (0, tk_pad - Tk)),
                       constant_values=NEG_INF)
    # expand the per-batch bias to per-problem (tiny) — an n//G index_map
    # does not lower through Mosaic; 3D so the block's trailing dims equal
    # the array's (Mosaic requires (x8, x128)-divisible or full-dim blocks)
    bias = jnp.broadcast_to(bias[:, None], (B, G, tk_pad))
    bias = bias.reshape(N, 1, tk_pad)

    qb = _pick_q_block(tq_pad)
    grid = (N, tq_pad // qb)

    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((N, tq_pad, ch), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, qb, ch), lambda n, i: (n, i, 0)),
            pl.BlockSpec((1, tk_pad, ch), lambda n, i: (n, 0, 0)),
            pl.BlockSpec((1, tk_pad, ch), lambda n, i: (n, 0, 0)),
            pl.BlockSpec((1, 1, tk_pad), lambda n, i: (n, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, qb, ch), lambda n, i: (n, i, 0)),
        interpret=interpret,
    )(qf, kf, vf, bias)
    return out[:, :Tq].reshape(B, G, Tq, ch)
