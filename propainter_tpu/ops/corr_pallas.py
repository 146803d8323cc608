"""Pallas TPU kernel: RAFT windowed correlation lookup, pixel-laned layout.

The XLA formulation (ops/corr.py) stores the all-pairs volume as
(B*H*W, Hc, Wc, 1) and looks windows up via per-pixel interpolation
matmuls. Two structural problems on TPU:
  * the trailing dim of 1 (and Wc=54) pads to 128 lanes — most of every
    vector register/tile is padding;
  * the lookup is 256k independent (9,30)x(30,54) matmuls — far below MXU
    tile size.
Measured: pyramid build 80 ms, lookup 67 ms per call at inference shapes
(~30 GB/s effective) — the refinement scan is 90% of RAFT's 1.0 s.

TPU-native layout: the volume lives TRANSPOSED, (B, Hc, Wc, P) with the
QUERY pixel p on the lane dimension — every element-wise op then runs at
full lane width, and pooling is a plain spatial avg-pool over a 1620-lane
tensor.

The lookup exploits that the (2r+1)^2 window offsets are integer-spaced, so
all 81 samples of a level share ONE bilinear fraction: each grid program
loads its lane-block of the volume, selects the 2r+2 integer rows/columns
around each lane's centroid with iota-compare masks (VPU, no gather), and
lerps. Each volume element is read from HBM exactly once per iteration —
the bandwidth floor for a dense formulation.

Matches ops/corr.corr_lookup_mxu output exactly (same x-major window
channel order, zeros outside the volume). Inference path; RAFT is frozen
in this framework's training (flow targets come from a frozen RAFT), so no
VJP is needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from propainter_tpu.ops.interp import avg_pool2d


def corr_pyramid_t(fmap1, fmap2, num_levels: int = 4):
    """Transposed correlation pyramid: levels of (B, Hc, Wc, P) fp32,
    P = H*W query pixels on the lane dim. Values identical to
    ops/corr.corr_pyramid (reference RAFT/corr.py:12-27)."""
    B, H, W, D = fmap1.shape
    f1 = fmap1.reshape(B, H * W, D).astype(jnp.float32)
    f2 = fmap2.reshape(B, H * W, D).astype(jnp.float32)
    # (B, M, P): keys m on sublanes, queries p on lanes
    corr = jnp.einsum("bmd,bpd->bmp", f2, f1,
                      preferred_element_type=jnp.float32)
    corr = corr / jnp.sqrt(jnp.float32(D))
    corr = corr.reshape(B, H, W, H * W)
    pyramid = [corr]
    for _ in range(num_levels - 1):
        corr = avg_pool2d(corr, 2, 2)
        pyramid.append(corr)
    return pyramid


def _flatten_copy_kernel(in_ref, out_ref, *, lane_pad):
    v = in_ref[...].astype(out_ref.dtype)
    if lane_pad:
        v = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, lane_pad)))
    out_ref[...] = v


def _flatten_pairs(c, out_dtype, Pq: int, interpret: bool):
    """(B, Hc, Wc, P) -> (1, Hc, Wc, B*Pq) out_dtype, lane = b*Pq + p,
    each pair's lanes zero-padded P -> Pq in-kernel.

    Logically cast+pad+transpose (B out of the leading dim), but XLA's
    transpose of this pattern measured 41 GB/s effective in bf16 (~40 ms
    for the L0 volume at inference shapes) and its cast+pad pass another
    ~100 GB/s; as a pallas grid-over-(pair, row) aligned block copy the
    whole thing is one read of the fp32 volume and one write of the
    out_dtype flat volume at memory speed. Pq must be a multiple of 128 so
    every out-block lane offset is aligned.
    """
    B, Hc, Wc, P = c.shape
    assert Pq % 128 == 0 and Pq >= P, (Pq, P)
    return pl.pallas_call(
        functools.partial(_flatten_copy_kernel, lane_pad=Pq - P),
        out_shape=jax.ShapeDtypeStruct((1, Hc, Wc, B * Pq), out_dtype),
        grid=(B, Hc),
        in_specs=[pl.BlockSpec((1, 1, Wc, P), lambda b, h: (b, h, 0, 0))],
        out_specs=pl.BlockSpec((1, 1, Wc, Pq), lambda b, h: (0, h, 0, b)),
        interpret=interpret,
    )(c)


def corr_pyramid_flat(fmap1, fmap2, num_levels: int = 4,
                      out_dtype=jnp.float32, interpret=None):
    """Transposed pyramid with the PAIR BATCH flattened into the lane dim:
    levels of (1, Hc, Wc, B*Pq) out_dtype, where Pq = H*W rounded up to a
    multiple of 128 and lane index = b*Pq + p (b-major, per-pair padded).

    Values identical to corr_pyramid_t (+ the out_dtype cast). Why flatten:
    with per-pair lanes (P=1620 at inference shapes) the lookup kernel pads
    every pair to a multiple of its lane block (NL=512 -> 2048 lanes, 21%
    dead lanes that still pay full VPU select-chain and HBM cost every
    iteration, plus a whole-pyramid jnp.pad copy). The fused lane axis pads
    each pair to the next 128 multiple (1664, 2.7%) — at build time, once,
    so the lookup never copies the volume.

    Build order matters: einsum and the 4 pools run in the BATCHED layout
    (fp32, bit-identical to corr_pyramid_t); each level is then cast to
    out_dtype, per-pair lane-padded, and flattened by an aligned pallas
    block copy (XLA's own transpose measured 41 GB/s here).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, H, W, D = fmap1.shape
    batched = corr_pyramid_t(fmap1, fmap2, num_levels)
    P = H * W
    Pq = -(-P // 128) * 128
    return [_flatten_pairs(c, out_dtype, Pq, interpret) for c in batched]


def corr_lookup_flat(pyramid_flat, coords, radius: int = 4,
                     block: int = 512, interpret=None, col_impl="rotate"):
    """corr_lookup_fused over a corr_pyramid_flat pyramid.

    coords: (B, H, W, 2) per-pair pixel coords; returns (B, H, W, C) fp32,
    identical to corr_lookup_mxu / corr_lookup_fused.
    """
    B, H, W, _ = coords.shape
    P = H * W
    BPq = pyramid_flat[0].shape[-1]
    Pq = BPq // B
    flat = coords.reshape(B, P, 2)
    if Pq != P:
        # pad each pair's query lanes (tiny) to match the pyramid's
        # per-pair padded lane count; the kernel then sees P == Pp and
        # never touches the volume
        flat = jnp.pad(flat, ((0, 0), (0, Pq - P), (0, 0)))
    out = corr_lookup_fused(pyramid_flat, flat.reshape(1, 1, B * Pq, 2),
                            radius=radius, block=block, interpret=interpret,
                            col_impl=col_impl)
    out = out[0, 0].reshape(B, Pq, -1)
    return out[:, :P].reshape(B, H, W, -1)


def corr_lookup_flat_moenc(pyramid_flat, coords, w, bias, radius: int = 4,
                           block: int = 512, interpret=None,
                           col_impl="rotate"):
    """Flat-layout lookup with the convc1 epilogue fused (see
    corr_lookup_fused's `moenc`): returns relu(corr @ w + b), (B, H, W, F).
    """
    B, H, W, _ = coords.shape
    P = H * W
    BPq = pyramid_flat[0].shape[-1]
    Pq = BPq // B
    flat = coords.reshape(B, P, 2)
    if Pq != P:
        flat = jnp.pad(flat, ((0, 0), (0, Pq - P), (0, 0)))
    out = corr_lookup_fused(pyramid_flat, flat.reshape(1, 1, B * Pq, 2),
                            radius=radius, block=block, interpret=interpret,
                            moenc=(w, bias), col_impl=col_impl)
    out = out[0].reshape(B, Pq, -1)
    return out[:, :P].reshape(B, H, W, -1)


def _lookup_kernel(cy_ref, cx_ref, *refs, level_hw, radius, moenc=False,
                   col_impl="rotate"):
    n_levels = len(level_hw)
    c_refs = refs[:n_levels]
    if moenc:
        # fused BasicMotionEncoder convc1: inputs (..., W, b), one output
        w_ref, b_ref, out_ref = refs[n_levels:]
    else:
        out_ref = refs[n_levels]
    r = radius
    n = 2 * r + 1
    NL = cy_ref.shape[-1]
    cy = cy_ref[0]   # (1, NL)
    cx = cx_ref[0]
    all_vals = []
    for l, (Hc, Wc) in enumerate(level_hw):
        scale = jnp.float32(2.0 ** -l)
        cyl = cy * scale
        cxl = cx * scale
        y0 = jnp.floor(cyl)
        x0 = jnp.floor(cxl)
        fy = cyl - y0                     # (1, NL), shared by all taps
        fx = cxl - x0
        # compute the shift/select stages in the volume's NATIVE dtype:
        # bf16 slabs pack 2 values per lane slot, halving the VPU
        # instruction count of the (Hc+pad)-slab where-chains. The col
        # "reduce" is a one-hot SELECT (exactly one nonzero term per lane),
        # so a bf16 reduce is exact given bf16 inputs; only the row lerp
        # gains one bf16 rounding (the volume is already bf16-quantized in
        # that mode — final-flow drift measured < 0.015 px over 20 iters).
        cdt = c_refs[l].dtype
        c = c_refs[l][0]                             # (Hc, Wc, NL)

        # ---- integer row window c[y0-r .. y0+r+1] via a per-lane variable
        # rotate: O(log Hc) conditional shifts along the (3-D, padded) row
        # dim instead of (n+1) masked reductions over all Hc rows — each
        # round is ONE whole-array select rather than per-slab selects.
        # Fully out-of-range centroids clamp into the zero padding.
        pad = n + 1 + r
        ext = jnp.pad(c, ((pad, n + 2), (0, 0), (0, 0)))
        y0c = jnp.clip(y0, -(n + 1.0), Hc + r + 1.0)
        a = y0c + jnp.float32(pad - r)              # in [0, amax]
        rem = Hc + pad + 1
        while rem > 0:
            b = 1
            while b * 2 <= rem:
                b *= 2
            cond = a >= b                            # (1, NL)
            a = jnp.where(cond, a - b, a)
            rem = b - 1                              # max(b-1, rem-b) = b-1
            outlen = min(ext.shape[0], rem + n + 2)
            sh = ext[b : b + outlen]
            if b + outlen > ext.shape[0]:
                sh = jnp.pad(
                    sh, ((0, b + outlen - ext.shape[0]), (0, 0), (0, 0)))
            ext = jnp.where(cond, sh, ext[:outlen])
        rows = [ext[j] for j in range(n + 1)]        # rows y0-r .. y0+r+1
        # lerp rows -> n row-samples (native dtype; fy cast once)
        fy_c = fy.astype(cdt)
        one = jnp.ones((), cdt)
        row_s = [(rows[j] * (one - fy_c) + rows[j + 1] * fy_c)
                 for j in range(n)]
        if col_impl == "rotate":
            # ---- integer column window via a per-lane SUBLANE log-shift
            # rotate of each row-sample slab: zero-pad to
            # (Wc + 2(n+1), NL), shift each lane's x0-r column to sublane 0
            # with O(log Wc) conditional static-slice shifts, then slice the
            # first n+1 sublanes. Replaces the masked one-hot reduce (n+1
            # full-width multiply-reduces per row sample = ~(n+1)*n*Wc
            # VPU rows/level) with ~2*Wc rows of selects per slab — the
            # reduce was the kernel's dominant VPU term. Pure selection:
            # bitwise-identical values feed the same fp32 column lerp.
            nw = n + 1
            # fully out-of-range windows clamp into the zero padding
            x0c = jnp.clip(x0, -(r + 2.0), Wc + r + 0.0)
            a = x0c + jnp.float32(nw - r)            # in [0, Wc + nw]
            exts = [jnp.pad(s, ((nw, nw), (0, 0))) for s in row_s]
            rem = Wc + nw
            while rem > 0:
                b = 1
                while b * 2 <= rem:
                    b *= 2
                cond = a >= b                        # (1, NL)
                a = jnp.where(cond, a - b, a)
                rem = b - 1                          # max(b-1, rem-b)
                outlen = min(exts[0].shape[0], rem + nw)
                new_exts = []
                for e in exts:
                    L = e.shape[0]
                    if b >= L:
                        sh = jnp.zeros((outlen, NL), cdt)
                    else:
                        sh = e[b : b + outlen]
                        if b + outlen > L:
                            sh = jnp.pad(sh, ((0, b + outlen - L), (0, 0)))
                    new_exts.append(jnp.where(cond, sh, e[:outlen]))
                exts = new_exts
            # exts[j][s] = row-sample j at column x0 - r + s (zero outside)
            lerped = [exts[j][:n].astype(jnp.float32) * (1.0 - fx)
                      + exts[j][1 : n + 1].astype(jnp.float32) * fx
                      for j in range(n)]             # each (n, NL) f32
            # channel order: i*n + j (x-major, as corr_lookup_mxu)
            vals = [lerped[j][i : i + 1] for i in range(n)
                    for j in range(n)]
        else:
            # ---- integer column window: masked sublane reduce, then lerp.
            # wsel is ONE-HOT, so the "sum" selects a single element per
            # lane — exact in any dtype.
            iwf = jax.lax.broadcasted_iota(jnp.int32, (Wc, NL),
                                           0).astype(jnp.float32)
            prev = None
            vals = []   # channel order: i*n + j (x-major)
            for ii in range(n + 1):
                wsel = (iwf == (x0 + (ii - r))).astype(cdt)
                cols = [jnp.sum(row_s[j] * wsel, axis=0,
                                keepdims=True).astype(jnp.float32)
                        for j in range(n)]              # each (1, NL) f32
                if prev is not None:
                    for j in range(n):
                        vals.append(prev[j] * (1.0 - fx) + cols[j] * fx)
                prev = cols
        if moenc:
            all_vals.extend(vals)
        else:
            out_ref[0, l * n * n : (l + 1) * n * n] = jnp.concatenate(
                vals, axis=0).astype(out_ref.dtype)
    if moenc:
        # cor = relu(corr @ W + b) on the MXU, written QUERY-MAJOR (NL, 256)
        # so the downstream 3x3 convs read (B, H, W, 256) with NO relayout.
        # The (C, NL) window tensor never leaves VMEM: per iteration this
        # removes the corr HBM write, the (B, C, P)->(B, P, C) relayout, and
        # convc1's read (~1 GB at inference shapes). bf16 operands + fp32
        # accumulation match XLA's default TPU precision for this conv.
        allv = jnp.concatenate(all_vals, axis=0)          # (C, NL) f32
        acc = jax.lax.dot_general(
            allv.astype(jnp.bfloat16), w_ref[...].astype(jnp.bfloat16),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # (NL, 256)
        out_ref[0] = jax.nn.relu(acc + b_ref[...]).astype(out_ref.dtype)


def corr_lookup_fused(pyramid_t, coords, radius: int = 4, block: int = 512,
                      interpret=None, moenc=None, col_impl="rotate"):
    """Windowed correlation lookup from a TRANSPOSED pyramid.

    Args:
      pyramid_t: list of (B, Hc, Wc, P) volumes (corr_pyramid_t).
      coords: (B, H, W, 2) pixel coords, last dim (x, y).
      moenc: optional (W (C, F), b (F,)) — fuse `relu(corr @ W + b)`
        (BasicMotionEncoder.convc1, reference RAFT/update.py:82,92) into the
        kernel epilogue and return (B, H, W, F) query-major, so the window
        tensor never reaches HBM.
      col_impl: 'rotate' (per-lane sublane log-shift window select — the
        faster default) or 'reduce' (masked one-hot sublane reduce);
        bitwise-identical outputs.
    Returns:
      (B, H, W, num_levels*(2r+1)^2) fp32 — identical to corr_lookup_mxu —
      or (B, H, W, F) with moenc.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, H, W, _ = coords.shape
    P = H * W
    n = 2 * radius + 1
    n_levels = len(pyramid_t)
    C = n_levels * n * n
    NL = min(block, -(-P // 128) * 128)
    if P % NL and P % 128 == 0:
        # prefer a lane block that divides P exactly: the pad branch below
        # copies the WHOLE pyramid (the flat layout arranges P % 128 == 0
        # precisely so this never triggers)
        for cand in range(NL, 0, -128):
            if P % cand == 0:
                NL = cand
                break
    nb = -(-P // NL)
    Pp = nb * NL

    cx = coords[..., 0].reshape(B, P)
    cy = coords[..., 1].reshape(B, P)
    if Pp != P:
        # pad with in-range coords; padded lanes are dropped on reshape
        cx = jnp.pad(cx, ((0, 0), (0, Pp - P)))
        cy = jnp.pad(cy, ((0, 0), (0, Pp - P)))
        pyramid_t = [jnp.pad(c, ((0, 0), (0, 0), (0, 0), (0, Pp - P)))
                     for c in pyramid_t]
    cx = cx[:, None, :]   # (B, 1, Pp)
    cy = cy[:, None, :]
    level_hw = tuple(c.shape[1:3] for c in pyramid_t)

    in_specs = (
        [pl.BlockSpec((1, 1, NL), lambda b, i: (b, 0, i)),
         pl.BlockSpec((1, 1, NL), lambda b, i: (b, 0, i))]
        + [pl.BlockSpec((1, hc, wc, NL), lambda b, i: (b, 0, 0, i))
           for (hc, wc) in level_hw]
    )
    if moenc is None:
        out = pl.pallas_call(
            functools.partial(_lookup_kernel, level_hw=level_hw,
                              radius=radius, col_impl=col_impl),
            out_shape=jax.ShapeDtypeStruct((B, C, Pp), jnp.float32),
            grid=(B, nb),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, C, NL), lambda b, i: (b, 0, i)),
            interpret=interpret,
        )(cy, cx, *pyramid_t)

        out = out[..., :P]                      # (B, C, P)
        out = jnp.moveaxis(out, 1, 2)           # (B, P, C)
        return out.reshape(B, H, W, C)

    w, bias = moenc
    F = w.shape[-1]
    assert w.shape == (C, F) and bias.shape == (F,), (w.shape, bias.shape)
    out = pl.pallas_call(
        functools.partial(_lookup_kernel, level_hw=level_hw, radius=radius,
                          moenc=True, col_impl=col_impl),
        out_shape=jax.ShapeDtypeStruct((B, Pp, F), jnp.float32),
        grid=(B, nb),
        in_specs=in_specs + [
            pl.BlockSpec((C, F), lambda b, i: (0, 0)),
            pl.BlockSpec((1, F), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, NL, F), lambda b, i: (b, i, 0)),
        interpret=interpret,
    )(cy, cx, *pyramid_t, w.astype(jnp.float32),
      bias.astype(jnp.float32).reshape(1, F))
    return out[:, :P].reshape(B, H, W, F)
