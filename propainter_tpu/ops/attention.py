"""Pallas TPU kernel: mask-guided sparse window attention.

The generator's SparseWindowAttention (reference
model/modules/sparse_transformer.py:117-281) routes each (5, 9) token window
through one of two paths:

  * dirty windows (mask occupancy > 0): queries attend over all (selected)
    frames' keys — window + 4 rolled-band copies + pooled global tokens;
  * clean windows: queries attend only within-window, same-frame.

The XLA formulation (models/propainter.py) computes BOTH branches densely
for every window and selects afterwards. This kernel restores the
reference's sparsity with static shapes: one grid program per
(batch*head, window), predicated on the window's occupancy scalar —
clean windows skip the full-attention branch entirely (~50x fewer FLOPs) —
and the softmax is streamed over frames (flash-style running max/sum), so
the (q, k) logits never hit HBM.

Layouts (ch = C / n_head):
  q/k/v windows:  (BH, nW, T, win, ch)  — pre-partitioned per window
  rolled k/v:     (BH, nW, 4, T, win, ch) with a static valid mask (4*win,)
  pooled k/v:     (BH, T, P, ch)
  occupancy:      (BnW = B*nW,) int32 (scalar-prefetched)
  frame_select:   (B, T) bool -> int32 (scalar-prefetched)
Output:           (BH, nW, T, win, ch)
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _kernel(occ_ref, fsel_ref, q_ref, k_ref, v_ref, kr_ref, vr_ref,
            kp_ref, vp_ref, rmask_ref, out_ref, *, T, win, P, ch, n_head,
            nW, scale):
    prog = pl.program_id(0)
    w = pl.program_id(1)
    b = prog // n_head  # batch index (heads share occupancy / frame_select)

    occ = occ_ref[b * nW + w]

    q = q_ref[0, 0].astype(jnp.float32) * scale  # (T, win, ch)

    @pl.when(occ > 0)
    def dirty():
        # keys per frame: win (center) + 4*win (rolled, masked) + P (pooled)
        ktok = win + 4 * win + P
        qf = q.reshape(T * win, ch)

        def frame_step(t, carry):
            m, s, acc = carry
            kc = k_ref[0, 0, t].astype(jnp.float32)            # (win, ch)
            kr = kr_ref[0, 0, :, t].reshape(4 * win, ch).astype(jnp.float32)
            kp = kp_ref[0, t].astype(jnp.float32)              # (P, ch)
            kt = jnp.concatenate([kc, kr, kp], axis=0)         # (ktok, ch)
            vc = v_ref[0, 0, t].astype(jnp.float32)
            vr = vr_ref[0, 0, :, t].reshape(4 * win, ch).astype(jnp.float32)
            vp = vp_ref[0, t].astype(jnp.float32)
            vt = jnp.concatenate([vc, vr, vp], axis=0)

            logits = jax.lax.dot_general(
                qf, kt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)            # (T*win, ktok)
            # static rolled-band validity (center & pooled always valid)
            valid = rmask_ref[0] > 0                           # (ktok,)
            sel = fsel_ref[b, t] > 0                           # temporal dilation
            logits = jnp.where(valid[None, :] & sel, logits, NEG_INF)

            m_t = jnp.max(logits, axis=1, keepdims=True)
            m_new = jnp.maximum(m, m_t)
            p = jnp.exp(logits - m_new)
            corr = jnp.exp(m - m_new)
            s_new = s * corr + jnp.sum(p, axis=1, keepdims=True)
            acc_new = acc * corr + jax.lax.dot_general(
                p, vt, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return m_new, s_new, acc_new

        m0 = jnp.full((T * win, 1), NEG_INF, jnp.float32)
        s0 = jnp.zeros((T * win, 1), jnp.float32)
        a0 = jnp.zeros((T * win, ch), jnp.float32)
        m, s, acc = jax.lax.fori_loop(0, T, frame_step, (m0, s0, a0))
        out = (acc / jnp.maximum(s, 1e-30)).reshape(T, win, ch)
        out_ref[0, 0] = out.astype(out_ref.dtype)

    @pl.when(occ <= 0)
    def clean():
        # within-window, same-frame attention (T small (win, win) matmuls)
        k = k_ref[0, 0].astype(jnp.float32)   # (T, win, ch)
        v = v_ref[0, 0].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (T, win, win)
        m = jnp.max(logits, axis=2, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=2, keepdims=True)
        out = jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (T, win, ch)
        out_ref[0, 0] = out.astype(out_ref.dtype)


def sparse_window_attention_pallas(
    win_q, win_k, win_v, roll_k, roll_v, pool_k, pool_v,
    roll_valid, occupancy, frame_select, n_head, interpret=None):
    """Run the fused kernel.

    Args:
      win_q/k/v: (BH, nW, T, win, ch) — BH = B * n_head.
      roll_k/v: (BH, nW, 4, T, win, ch).
      pool_k/v: (BH, T, P, ch).
      roll_valid: (4*win,) bool — static mask of rolled-band tokens.
      occupancy: (B, nW) float/int — >0 means dirty window.
      frame_select: (B, T) bool — frames visible to dirty-window attention.
    Returns:
      (BH, nW, T, win, ch) attention output (dtype of win_q).
    """
    if interpret is None:
        # CPU (tests) runs the kernel in interpreter mode automatically
        interpret = jax.default_backend() == "cpu"
    BH, nW, T, win, ch = win_q.shape
    P = pool_k.shape[2]
    B = BH // n_head
    ktok = win + 4 * win + P

    occ = occupancy.reshape(B * nW).astype(jnp.int32)
    fsel = frame_select.astype(jnp.int32).reshape(B, T)
    # pack the static rolled mask into the per-frame key layout
    rmask = np.zeros((1, ktok), np.int32)
    rmask[0, :win] = 1
    rmask[0, win : 5 * win] = np.asarray(roll_valid, np.int32)
    rmask[0, 5 * win :] = 1
    rmask = jnp.asarray(rmask)

    grid = (BH, nW)
    kernel = functools.partial(
        _kernel, T=T, win=win, P=P, ch=ch, n_head=n_head, nW=nW,
        scale=1.0 / math.sqrt(ch))

    # index maps receive (grid indices..., *scalar_prefetch_refs)
    def win_spec(extra=()):
        ndim_extra = len(extra)
        block = (1, 1) + extra + (T, win, ch)
        return pl.BlockSpec(
            block, lambda i, w, *_: (i, w) + (0,) * (3 + ndim_extra),
            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            win_spec(), win_spec(), win_spec(),        # q, k, v
            win_spec((4,)), win_spec((4,)),            # rolled k, v
            pl.BlockSpec((1, T, P, ch), lambda i, w, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),     # pooled k
            pl.BlockSpec((1, T, P, ch), lambda i, w, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),     # pooled v
            pl.BlockSpec((1, ktok), lambda i, w, *_: (0, 0),
                         memory_space=pltpu.VMEM),     # rolled mask
        ],
        out_specs=pl.BlockSpec(
            (1, 1, T, win, ch), lambda i, w, *_: (i, w, 0, 0, 0),
            memory_space=pltpu.VMEM),
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((BH, nW, T, win, ch), win_q.dtype),
        interpret=interpret,
    )(occ, fsel, win_q, win_k, win_v, roll_k, roll_v, pool_k, pool_v, rmask)
