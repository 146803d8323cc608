"""Pallas TPU kernel: fused separable-interpolation sampling for
modulated deformable convolution.

The XLA formulation (ops/deform.py modulated_deform_conv2d_mxu) computes the
bilinear sampling as two chained interpolation contractions; the
intermediate "column-interpolated" buffer (B*dg, K, Ho*Wo, H, Cg) is ~900 MB
at generator shapes and must round-trip HBM — the op is bandwidth-bound at
~23% MXU utilization (PERF.md).

This kernel fuses the chain: each grid program (one deform group x one block
of output positions) builds the W-interpolation one-hot matrix in VMEM from
the flattened sample x-coordinates, contracts it with the group's feature
slab on the MXU, applies the H-interpolation as a VPU broadcast-reduce, and
multiplies the modulation mask — the intermediate never exists in HBM.

Position coordinates arrive pre-flattened to the LANE dimension
((BG, K, P) with P = Ho*Wo) so the kernel needs no lane-merging relayouts;
the tap loop is a static Python range.

Sampling semantics are identical to modulated_deform_conv2d_mxu (zeros-
padded bilinear, torchvision deform_conv2d): out-of-range coordinates get
zero interpolation weight, so padding positions use coordinate -2.

Inference-only (no VJP); training uses the XLA formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, sy_ref, sx_ref, m_ref, out_ref, *, H, W, Cg, K):
    """x_ref: (1, H*Cg, W) group feature slab, row index = h*Cg + c.
    sy/sx/m_ref: (1, K, PB) sample coords / modulation for this block.
    out_ref: (1, K, Cg, PB)."""
    PB = sx_ref.shape[-1]
    xT = x_ref[0]  # (H*Cg, W)
    iw = jax.lax.broadcasted_iota(jnp.int32, (W, PB), 0).astype(jnp.float32)
    ih = jax.lax.broadcasted_iota(jnp.int32, (H, PB), 0).astype(jnp.float32)
    for k in range(K):
        sx = sx_ref[0, k][None, :].astype(jnp.float32)   # (1, PB)
        sy = sy_ref[0, k][None, :].astype(jnp.float32)
        # W-interp one-hot (2 nonzeros/column), contracted on the MXU
        Sx = jnp.maximum(1.0 - jnp.abs(sx - iw), 0.0).astype(xT.dtype)
        tmp = jax.lax.dot_general(
            xT, Sx, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # (H*Cg, PB)
        # H-interp: broadcast-multiply + sublane reduce (VPU)
        Sy = jnp.maximum(1.0 - jnp.abs(sy - ih), 0.0)     # (H, PB)
        val = jnp.sum(tmp.reshape(H, Cg, PB) * Sy[:, None, :], axis=0)
        val = val * m_ref[0, k][None, :].astype(jnp.float32)
        out_ref[0, k] = val.astype(out_ref.dtype)


def _pick_pos_block(P: int, elt_bytes: int = 2) -> int:
    """Position-block size for the deform kernels' grid.

    Bigger blocks = fewer grid programs (per-program overhead dominates at
    the small flowcomp/featprop shapes — PERF.md r5 sweep): for bf16
    inputs take the whole position axis as ONE block when it fits
    (flowcomp deform 2.37 -> 1.88 ms/call, featprop 2.42 -> 2.21 —
    tools/deform_pb_sweep.py, verified up to PB=6528). fp32 inputs keep
    the original least-waste ladder: the fp32 kernel's scoped-VMEM live
    set blows the 16 MB limit at big blocks (Mosaic stack OOM at PB=6528
    f32, 41.8 MB — hit by the TRAINING path, which runs fp32)."""
    import os
    env = os.environ.get("DEFORM_PB")
    if env:
        return int(env)
    if elt_bytes <= 2 and P <= 8192:
        return -(-P // 128) * 128
    best = None
    for pb in (256, 384, 512, 640, 768):
        waste = -(-P // pb) * pb - P
        if best is None or waste <= best[0]:
            best = (waste, pb)
    return best[1]


def deform_sample_pallas(x, sy, sx, mask, dg: int, interpret=None):
    """Bilinear-sample x at (sy, sx) per (group, tap), times mask.

    Args:
      x: (B, H, W, C) features.
      sy, sx: (B, Ho, Wo, dg, K) absolute sample coordinates.
      mask: (B, Ho, Wo, dg, K) modulation.
    Returns:
      (B, Ho, Wo, dg, K, Cg) sampled*mask values, x.dtype.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, H, W, C = x.shape
    _, Ho, Wo, _, K = sy.shape
    Cg = C // dg
    BG = B * dg
    P = Ho * Wo
    PB = _pick_pos_block(P, jnp.dtype(x.dtype).itemsize)
    n_pb = -(-P // PB)
    Pp = n_pb * PB

    # (BG, H*Cg, W) group slabs, W minor for the lane-dim contraction
    x_prep = x.reshape(B, H, W, dg, Cg).transpose(0, 3, 1, 4, 2)
    x_prep = x_prep.reshape(BG, H * Cg, W)

    def flat(a, pad_val):
        a = a.transpose(0, 3, 4, 1, 2).reshape(BG, K, P)
        if Pp != P:
            a = jnp.pad(a, ((0, 0), (0, 0), (0, Pp - P)),
                        constant_values=pad_val)
        return a

    syf = flat(sy, -2.0)   # -2 -> zero interpolation weight
    sxf = flat(sx, -2.0)
    mf = flat(mask, 0.0)

    out = pl.pallas_call(
        functools.partial(_kernel, H=H, W=W, Cg=Cg, K=K),
        out_shape=jax.ShapeDtypeStruct((BG, K, Cg, Pp), x.dtype),
        grid=(BG, n_pb),
        in_specs=[
            pl.BlockSpec((1, H * Cg, W), lambda g, p: (g, 0, 0)),
            pl.BlockSpec((1, K, PB), lambda g, p: (g, 0, p)),
            pl.BlockSpec((1, K, PB), lambda g, p: (g, 0, p)),
            pl.BlockSpec((1, K, PB), lambda g, p: (g, 0, p)),
        ],
        out_specs=pl.BlockSpec((1, K, Cg, PB), lambda g, p: (g, 0, 0, p)),
        interpret=interpret,
    )(x_prep, syf, sxf, mf)

    out = out[..., :P].reshape(B, dg, K, Cg, Ho, Wo)
    return out.transpose(0, 4, 5, 1, 2, 3)  # (B, Ho, Wo, dg, K, Cg)


def modulated_deform_conv2d_fused(x, offset, mask, weight, bias=None,
                                  interpret=None):
    """modulated_deform_conv2d with pallas-fused sampling (stride 1, pad 1,
    dil 1 — all the reference's deform convs). Output-identical to
    ops/deform.modulated_deform_conv2d_mxu up to fp reassociation."""
    B, H, W, C = x.shape
    kh, kw, Cw, O = weight.shape
    assert Cw == C
    K = kh * kw
    _, Ho, Wo, dg, Koff, _ = offset.shape
    assert Koff == K and Ho == H and Wo == W

    ky = jnp.arange(kh, dtype=jnp.float32) - 1.0
    kx = jnp.arange(kw, dtype=jnp.float32) - 1.0
    py = (jnp.arange(Ho, dtype=jnp.float32)[:, None, None]
          + jnp.broadcast_to(ky[:, None], (kh, kw)).reshape(-1))
    px = (jnp.arange(Wo, dtype=jnp.float32)[None, :, None]
          + jnp.broadcast_to(kx[None, :], (kh, kw)).reshape(-1))
    sy = (py[None, :, :, None, :] + offset[..., 0].astype(jnp.float32))
    sx = (px[None, :, :, None, :] + offset[..., 1].astype(jnp.float32))

    sampled = deform_sample_pallas(x, sy.astype(x.dtype), sx.astype(x.dtype),
                                   mask, dg, interpret=interpret)
    # (B, Ho, Wo, K, dg, Cg) -> (B, Ho, Wo, K*C); channel = g*Cg + cg
    sampled = sampled.transpose(0, 1, 2, 4, 3, 5).reshape(B, Ho, Wo, K * C)
    w = weight.reshape(K, C, O).reshape(K * C, O)
    out = jnp.einsum("bhwk,ko->bhwo", sampled, w.astype(x.dtype),
                     preferred_element_type=jnp.float32).astype(x.dtype)
    if bias is not None:
        out = out + bias
    return out


def _kernel_out(x_ref, sy_ref, sx_ref, m_ref, w_ref, out_ref, *,
                H, W, Cg, K, dg):
    """Deform conv with the OUTPUT contraction fused in-kernel.

    x_ref:  (1, 1, H*Cg, W) group feature slab, row index = h*Cg + c.
    sy/sx/m_ref: (1, 1, K, PB) sample coords / modulation for this block.
    w_ref:  (1, K*Cg, O) this group's weight slice, row index = k*Cg + c.
    out_ref: (1, PB, O) fp32, accumulated across the g grid dim (innermost,
    so the block stays VMEM-resident across its dg revisits)."""
    g = pl.program_id(2)
    PB = sx_ref.shape[-1]
    xT = x_ref[0, 0]  # (H*Cg, W)
    iw = jax.lax.broadcasted_iota(jnp.int32, (W, PB), 0).astype(jnp.float32)
    ih = jax.lax.broadcasted_iota(jnp.int32, (H, PB), 0).astype(jnp.float32)
    vals = []
    for k in range(K):
        sx = sx_ref[0, 0, k][None, :].astype(jnp.float32)   # (1, PB)
        sy = sy_ref[0, 0, k][None, :].astype(jnp.float32)
        # W-interp one-hot (2 nonzeros/column), contracted on the MXU
        Sx = jnp.maximum(1.0 - jnp.abs(sx - iw), 0.0).astype(xT.dtype)
        tmp = jax.lax.dot_general(
            xT, Sx, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # (H*Cg, PB)
        # H-interp: broadcast-multiply + sublane reduce (VPU)
        Sy = jnp.maximum(1.0 - jnp.abs(sy - ih), 0.0)       # (H, PB)
        val = jnp.sum(tmp.reshape(H, Cg, PB) * Sy[:, None, :], axis=0)
        vals.append(val * m_ref[0, 0, k][None, :].astype(jnp.float32))
    # ONE (PB, K*Cg) x (K*Cg, O) MXU contraction for all taps
    v = jnp.concatenate(vals, axis=0).astype(x_ref.dtype)   # (K*Cg, PB)
    acc = jax.lax.dot_general(
        v, w_ref[0].astype(x_ref.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                 # (PB, O)
    @pl.when(g == 0)
    def _init():
        out_ref[0] = acc

    @pl.when(g != 0)
    def _acc():
        out_ref[0] = out_ref[0] + acc


def modulated_deform_conv2d_fused_out(x, offset, mask, weight, bias=None,
                                      interpret=None):
    """modulated_deform_conv2d with BOTH the bilinear sampling and the
    (K*C, O) output contraction fused in one pallas kernel: the sampled
    (B, Ho, Wo, K*C) tensor, its layout transposes, AND the separable-interp
    intermediate never exist in HBM — only the (B, P, O) output leaves.
    Output-identical to ops/deform.modulated_deform_conv2d_mxu up to fp
    reassociation. stride 1, pad 1, dil 1; inference-only (no VJP)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, H, W, C = x.shape
    kh, kw, Cw, O = weight.shape
    assert Cw == C
    K = kh * kw
    _, Ho, Wo, dg, Koff, _ = offset.shape
    assert Koff == K and Ho == H and Wo == W
    Cg = C // dg
    P = Ho * Wo
    PB = _pick_pos_block(P, jnp.dtype(x.dtype).itemsize)
    n_pb = -(-P // PB)
    Pp = n_pb * PB

    ky = jnp.arange(kh, dtype=jnp.float32) - 1.0
    kx = jnp.arange(kw, dtype=jnp.float32) - 1.0
    py = (jnp.arange(Ho, dtype=jnp.float32)[:, None, None]
          + jnp.broadcast_to(ky[:, None], (kh, kw)).reshape(-1))
    px = (jnp.arange(Wo, dtype=jnp.float32)[None, :, None]
          + jnp.broadcast_to(kx[None, :], (kh, kw)).reshape(-1))
    sy = (py[None, :, :, None, :] + offset[..., 0].astype(jnp.float32))
    sx = (px[None, :, :, None, :] + offset[..., 1].astype(jnp.float32))

    # (B, dg, H*Cg, W) group slabs, W minor for the lane-dim contraction
    x_prep = x.reshape(B, H, W, dg, Cg).transpose(0, 3, 1, 4, 2)
    x_prep = x_prep.reshape(B, dg, H * Cg, W)

    def flat(a, pad_val):
        a = a.transpose(0, 3, 4, 1, 2).reshape(B, dg, K, P)
        if Pp != P:
            a = jnp.pad(a, ((0, 0), (0, 0), (0, 0), (0, Pp - P)),
                        constant_values=pad_val)
        return a

    syf = flat(sy.astype(x.dtype), -2.0)   # -2 -> zero interpolation weight
    sxf = flat(sx.astype(x.dtype), -2.0)
    mf = flat(mask.astype(x.dtype), 0.0)
    # weight rows in the kernel's (k, cg) value order, per group
    w_gkc = weight.reshape(K, dg, Cg, O).transpose(1, 0, 2, 3)
    w_gkc = w_gkc.reshape(dg, K * Cg, O)

    out = pl.pallas_call(
        functools.partial(_kernel_out, H=H, W=W, Cg=Cg, K=K, dg=dg),
        out_shape=jax.ShapeDtypeStruct((B, Pp, O), jnp.float32),
        grid=(B, n_pb, dg),
        in_specs=[
            pl.BlockSpec((1, 1, H * Cg, W), lambda b, p, g: (b, g, 0, 0)),
            pl.BlockSpec((1, 1, K, PB), lambda b, p, g: (b, g, 0, p)),
            pl.BlockSpec((1, 1, K, PB), lambda b, p, g: (b, g, 0, p)),
            pl.BlockSpec((1, 1, K, PB), lambda b, p, g: (b, g, 0, p)),
            pl.BlockSpec((1, K * Cg, O), lambda b, p, g: (g, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, PB, O), lambda b, p, g: (b, p, 0)),
        interpret=interpret,
    )(x_prep, syf, sxf, mf, w_gkc.astype(x.dtype))

    out = out[:, :P].reshape(B, Ho, Wo, O).astype(x.dtype)
    if bias is not None:
        out = out + bias
    return out


@jax.custom_vjp
def modulated_deform_conv2d_opt(x, offset, mask, weight, bias):
    """Dispatching modulated deform conv: pallas-fused sampling on TPU,
    the XLA separable-matmul formulation on CPU (tests) — identical values.
    Differentiable: the VJP linearizes the XLA formulation (the fused
    kernel has no VJP), so training works through it unchanged."""
    if jax.default_backend() == "cpu":
        from propainter_tpu.ops.deform import modulated_deform_conv2d_mxu
        return modulated_deform_conv2d_mxu(x, offset, mask, weight, bias)
    return modulated_deform_conv2d_fused(x, offset, mask, weight, bias)


def _opt_fwd(x, offset, mask, weight, bias):
    return (modulated_deform_conv2d_opt(x, offset, mask, weight, bias),
            (x, offset, mask, weight, bias))


def _opt_bwd(res, g):
    from propainter_tpu.ops.deform import modulated_deform_conv2d_mxu
    _, vjp = jax.vjp(modulated_deform_conv2d_mxu, *res)
    return vjp(g)


modulated_deform_conv2d_opt.defvjp(_opt_fwd, _opt_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def modulated_deform_conv2d_opt2(x, offset, mask, weight, bias,
                                 row_chunk=None):
    """Dispatching modulated deform conv, v2: the fully-fused pallas kernel
    (sampling + output contraction in VMEM, modulated_deform_conv2d_fused_out)
    on TPU — 2.21 vs 2.34 ms/call at the generator featprop shape, 1.88 vs
    2.06 at the flowcomp prop shape (tools/deform_fused_ab.py) — and the XLA
    separable-matmul formulation on CPU (tests/training dryruns).
    Differentiable: the VJP linearizes the XLA formulation (the kernel has
    no VJP), so training works through it unchanged; values are identical
    up to fp reassociation (<= 3e-6 abs on unit-scale inputs)."""
    if jax.default_backend() == "cpu":
        from propainter_tpu.ops.deform import modulated_deform_conv2d_mxu
        return modulated_deform_conv2d_mxu(x, offset, mask, weight, bias,
                                           row_chunk=row_chunk)
    return modulated_deform_conv2d_fused_out(x, offset, mask, weight, bias)


def _opt2_fwd(x, offset, mask, weight, bias, row_chunk):
    return (modulated_deform_conv2d_opt2(x, offset, mask, weight, bias,
                                         row_chunk),
            (x, offset, mask, weight, bias))


def _opt2_bwd(row_chunk, res, g):
    from propainter_tpu.ops.deform import modulated_deform_conv2d_mxu
    _, vjp = jax.vjp(
        lambda *a: modulated_deform_conv2d_mxu(*a, row_chunk=row_chunk),
        *res)
    return vjp(g)


modulated_deform_conv2d_opt2.defvjp(_opt2_fwd, _opt2_bwd)
