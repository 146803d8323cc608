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


def _lookup_kernel(cy_ref, cx_ref, *refs, level_hw, radius):
    n_levels = len(level_hw)
    c_refs = refs[:n_levels]
    out_ref = refs[n_levels]
    r = radius
    n = 2 * r + 1
    NL = cy_ref.shape[-1]
    cy = cy_ref[0]   # (1, NL)
    cx = cx_ref[0]
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
        # rotate: O(log Hc) conditional shifts along the (unrolled) row dim
        # instead of (n+1) masked reductions over all Hc rows. Fully
        # out-of-range centroids are clamped to a window of zero padding.
        pad = n + 1 + r
        zero = jnp.zeros((Wc, NL), cdt)
        ext = [zero] * pad + [c[h] for h in range(Hc)] + [zero] * (n + 2)
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
            outlen = min(len(ext), rem + n + 2)
            ext = [jnp.where(cond,
                             ext[h + b] if h + b < len(ext) else zero,
                             ext[h])
                   for h in range(outlen)]
        rows = ext[: n + 1]                          # rows y0-r .. y0+r+1
        # lerp rows -> n row-samples (native dtype; fy cast once)
        fy_c = fy.astype(cdt)
        one = jnp.ones((), cdt)
        row_s = [(rows[j] * (one - fy_c) + rows[j + 1] * fy_c)
                 for j in range(n)]
        # ---- integer column window: masked sublane reduce (the w dim lives
        # on sublanes — no cheap per-lane sublane rotate), then lerp.
        # wsel is ONE-HOT, so the "sum" selects a single element per lane —
        # exact in any dtype.
        iwf = jax.lax.broadcasted_iota(jnp.int32, (Wc, NL),
                                       0).astype(jnp.float32)
        prev = None
        vals = []   # channel order: i*n + j (x-major, as corr_lookup_mxu)
        for ii in range(n + 1):
            wsel = (iwf == (x0 + (ii - r))).astype(cdt)
            cols = [jnp.sum(row_s[j] * wsel, axis=0,
                            keepdims=True).astype(jnp.float32)
                    for j in range(n)]              # each (1, NL) f32
            if prev is not None:
                for j in range(n):
                    vals.append(prev[j] * (1.0 - fx) + cols[j] * fx)
            prev = cols
        out_ref[0, l * n * n : (l + 1) * n * n] = jnp.concatenate(
            vals, axis=0).astype(out_ref.dtype)


def corr_lookup_fused(pyramid_t, coords, radius: int = 4, block: int = 512,
                      interpret=None):
    """Windowed correlation lookup from a TRANSPOSED pyramid.

    Args:
      pyramid_t: list of (B, Hc, Wc, P) volumes (corr_pyramid_t).
      coords: (B, H, W, 2) pixel coords, last dim (x, y).
    Returns:
      (B, H, W, num_levels*(2r+1)^2) fp32 — identical to corr_lookup_mxu.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, H, W, _ = coords.shape
    P = H * W
    n = 2 * radius + 1
    n_levels = len(pyramid_t)
    C = n_levels * n * n
    NL = min(block, -(-P // 128) * 128)
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

    out = pl.pallas_call(
        functools.partial(_lookup_kernel, level_hw=level_hw, radius=radius),
        out_shape=jax.ShapeDtypeStruct((B, C, Pp), jnp.float32),
        grid=(B, nb),
        in_specs=(
            [pl.BlockSpec((1, 1, NL), lambda b, i: (b, 0, i)),
             pl.BlockSpec((1, 1, NL), lambda b, i: (b, 0, i))]
            + [pl.BlockSpec((1, hc, wc, NL), lambda b, i: (b, 0, 0, i))
               for (hc, wc) in level_hw]
        ),
        out_specs=pl.BlockSpec((1, C, NL), lambda b, i: (b, 0, i)),
        interpret=interpret,
    )(cy, cx, *pyramid_t)

    out = out[..., :P]                      # (B, C, P)
    out = jnp.moveaxis(out, 1, 2)           # (B, P, C)
    return out.reshape(B, H, W, C)
