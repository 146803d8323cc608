"""Modulated deformable convolution (DCNv2) for TPU.

Reimplements the semantics of `torchvision.ops.deform_conv2d` as used by the
reference (model/modules/deformconv.py:7-53, model/propainter.py:34-69,
model/recurrent_flow_completion.py:9-44): kernel 3x3, stride 1, pad 1,
dilation 1, groups 1, `deform_groups` offset groups, sigmoid modulation mask,
bilinear sampling with zeros outside the input.

TPU-native formulation: one batched bilinear gather producing
(B, Ho, Wo, K*C) sampled+modulated taps, then a single (K*C, O) matmul that
runs on the MXU. No data-dependent shapes.

Layouts (NHWC throughout):
  offset: (B, Ho, Wo, dg, K, 2) with last dim (dy, dx) — matching
          torchvision's channel layout offset[:, g*2K + 2k + {0=dy,1=dx}].
  mask:   (B, Ho, Wo, dg, K) — torchvision layout mask[:, g*K + k].
  weight: (kh, kw, C, O) (HWIO, as converted from torch OIHW).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from propainter_tpu.ops.warp import _gather2d


def modulated_deform_conv2d(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    mask: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
) -> jnp.ndarray:
    """Apply modulated deformable conv.

    Args:
      x:      (B, H, W, C).
      offset: (B, Ho, Wo, dg, K, 2), (dy, dx) per deform group / kernel tap.
      mask:   (B, Ho, Wo, dg, K) modulation scalars (already sigmoided).
      weight: (kh, kw, C, O).
      bias:   (O,) or None.

    Returns:
      (B, Ho, Wo, O).
    """
    B, H, W, C = x.shape
    kh, kw, Cw, O = weight.shape
    assert Cw == C, f"weight in-channels {Cw} != input channels {C}"
    K = kh * kw
    _, Ho, Wo, dg, Koff, _ = offset.shape
    assert Koff == K
    Cg = C // dg

    # sampling positions: p = (out_pos * stride - padding + tap * dilation) + offset
    ky = jnp.arange(kh, dtype=x.dtype) * dilation
    kx = jnp.arange(kw, dtype=x.dtype) * dilation
    base_y = (jnp.arange(Ho, dtype=x.dtype) * stride - padding)[:, None] + ky[None, :]
    base_x = (jnp.arange(Wo, dtype=x.dtype) * stride - padding)[:, None] + kx[None, :]
    # (Ho, Wo, K): tap k = (i, j) row-major
    py = jnp.broadcast_to(base_y[:, None, :, None], (Ho, Wo, kh, kw)).reshape(Ho, Wo, K)
    px = jnp.broadcast_to(base_x[None, :, None, :], (Ho, Wo, kh, kw)).reshape(Ho, Wo, K)

    sy = py[None, :, :, None, :] + offset[..., 0]  # (B, Ho, Wo, dg, K)
    sx = px[None, :, :, None, :] + offset[..., 1]

    # group the input channels by deform group and gather per group
    x_g = x.reshape(B, H, W, dg, Cg).transpose(0, 3, 1, 2, 4).reshape(B * dg, H, W, Cg)
    sy_g = sy.transpose(0, 3, 1, 2, 4).reshape(B * dg, Ho, Wo * K)
    sx_g = sx.transpose(0, 3, 1, 2, 4).reshape(B * dg, Ho, Wo * K)

    sampled = _bilinear_gather_zeros(x_g, sy_g, sx_g)  # (B*dg, Ho, Wo*K, Cg)
    sampled = sampled.reshape(B, dg, Ho, Wo, K, Cg)
    m = mask.transpose(0, 3, 1, 2, 4)  # (B, dg, Ho, Wo, K)
    sampled = sampled * m[..., None]
    # -> (B, Ho, Wo, K, dg, Cg) -> (B, Ho, Wo, K*C); channel index = g*Cg + cg
    sampled = sampled.transpose(0, 2, 3, 4, 1, 5).reshape(B, Ho, Wo, K * C)

    # weight (kh, kw, C, O) -> (K*C, O), K-major to match sampled layout
    w = weight.reshape(K, C, O).reshape(K * C, O)
    out = jnp.einsum(
        "bhwk,ko->bhwo", sampled, w,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if bias is not None:
        out = out + bias
    return out


def modulated_deform_conv2d_mxu(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    mask: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    row_chunk: int | None = None,
    out_fused: bool = True,
) -> jnp.ndarray:
    """`modulated_deform_conv2d` with the bilinear gather expressed as
    separable interpolation matmuls (MXU) instead of gathers (slow on TPU).

    For each (deform group g, tap k), sampling x_g at positions (sy, sx) is
      val[j] = Sy[j, :] @ x_g @ Sx[j, :]^T,
    with Sy/Sx per-position bilinear one-hot rows built from iota compares —
    exactly zeros-padded bilinear (same semantics as the gather version,
    torchvision deform_conv2d). The **W (column) interpolation runs first**
    as the MXU matmul: W > H at every call site (54x30, 108x60), and the
    contraction dim sets MXU lane utilization — col-first measured 3.8x
    faster at the flow-completion shape, 1.3x at the generator shape
    (PERF.md). The H interpolation is then an elementwise reduce. Output
    rows are processed in chunks to bound the tmp buffer. stride=1,
    padding=1, dilation=1 (all the reference's deform convs —
    model/propainter.py:34-69, model/recurrent_flow_completion.py:9-44).

    out_fused=True moves the modulation multiply and the (K*C, O)
    output contraction INSIDE the per-chunk body, with the weight
    pre-permuted to the interpolation output's natural (dg, K, Cg) channel
    order: the (B, Ho, Wo, K*C) sampled tensor (~15 MB per featprop step)
    and its two big layout transposes never exist — only the (B, P, O)
    chunk outputs leave the loop. Identical math (same contractions,
    fp reassociation only).
    """
    B, H, W, C = x.shape
    kh, kw, Cw, O = weight.shape
    assert Cw == C
    K = kh * kw
    _, Ho, Wo, dg, Koff, _ = offset.shape
    assert Koff == K and Ho == H and Wo == W
    Cg = C // dg

    if row_chunk is None:
        # fewer, larger chunks = fewer sequential sub-steps inside scans
        # (measured 2x on the flow-completion net); bound the tmp
        # interpolation buffer (BG, K, rc*Wo, H, Cg) to ~1 GB
        per_row = B * dg * K * Wo * H * Cg * x.dtype.itemsize
        row_chunk = int(min(Ho, max(8, (1 << 30) // max(per_row, 1))))

    # base tap positions (stride 1, pad 1, dil 1)
    ky = jnp.arange(kh, dtype=x.dtype) - 1.0
    kx = jnp.arange(kw, dtype=x.dtype) - 1.0
    py = (jnp.arange(Ho, dtype=x.dtype)[:, None, None]
          + jnp.broadcast_to(ky[:, None], (kh, kw)).reshape(-1))  # (Ho,1,K)
    px = (jnp.arange(Wo, dtype=x.dtype)[None, :, None]
          + jnp.broadcast_to(kx[None, :], (kh, kw)).reshape(-1))  # (1,Wo,K)

    sy = py[None, :, :, None, :] + offset[..., 0]  # (B, Ho, Wo, dg, K)
    sx = px[None, :, :, None, :] + offset[..., 1]

    x_g = (x.reshape(B, H, W, dg, Cg).transpose(0, 3, 1, 2, 4)
           .reshape(B * dg, H, W, Cg))

    iot_h = jax.lax.broadcasted_iota(x.dtype, (H,), 0)
    iot_w = jax.lax.broadcasted_iota(x.dtype, (W,), 0)

    n_chunks = -(-Ho // row_chunk)
    pad_rows = n_chunks * row_chunk - Ho
    if pad_rows:
        sy = jnp.pad(sy, ((0, 0), (0, pad_rows), (0, 0), (0, 0), (0, 0)),
                     constant_values=-2.0)  # out of range -> zero weights
        sx = jnp.pad(sx, ((0, 0), (0, pad_rows), (0, 0), (0, 0), (0, 0)),
                     constant_values=-2.0)
    # (n_chunks, B*dg, K, rc*Wo) position layout
    def to_chunks(s):
        s = s.transpose(1, 0, 3, 4, 2)  # (Ho', B, dg, K, Wo)
        s = s.reshape(n_chunks, row_chunk, B, dg, K, Wo)
        s = s.transpose(0, 2, 3, 4, 1, 5)  # (n, B, dg, K, rc, Wo)
        return s.reshape(n_chunks, B * dg, K, row_chunk * Wo)

    sy_c = to_chunks(sy)
    sx_c = to_chunks(sx)

    x_hw = x_g  # (B*dg, H, W, Cg)

    if out_fused:
        # mask in chunk layout (n, B, dg, K, P); pad rows like sy/sx
        # (pad-row outputs are cropped below, value irrelevant)
        m = mask
        if pad_rows:
            m = jnp.pad(m, ((0, 0), (0, pad_rows), (0, 0), (0, 0), (0, 0)))
        m = m.transpose(1, 0, 3, 4, 2)  # (Ho', B, dg, K, Wo)
        m = m.reshape(n_chunks, row_chunk, B, dg, K, Wo)
        m_c = m.transpose(0, 2, 3, 4, 1, 5).reshape(
            n_chunks, B, dg, K, row_chunk * Wo)
        # weight in the interpolation output's (g, k, cg) channel order
        w_gkc = weight.reshape(K, dg, Cg, O).transpose(1, 0, 2, 3)

        def chunk_fused(args):
            syk, sxk, mk = args  # (BG, K, P), (B, dg, K, P)
            Sy = jax.nn.relu(1.0 - jnp.abs(syk[..., None] - iot_h))
            Sx = jax.nn.relu(1.0 - jnp.abs(sxk[..., None] - iot_w))
            tmp = jnp.einsum(
                "gkpw,ghwc->gkphc", Sx, x_hw,
                preferred_element_type=jnp.float32).astype(x.dtype)
            val = jnp.einsum(
                "gkph,gkphc->gkpc", Sy, tmp,
                preferred_element_type=jnp.float32).astype(x.dtype)
            val = val.reshape(B, dg, K, -1, Cg) * mk[..., None]
            # (g k c) contraction straight off the chunk: (B, P, O)
            return jnp.einsum(
                "bgkpc,gkco->bpo", val, w_gkc,
                preferred_element_type=jnp.float32).astype(x.dtype)

        outs = jax.lax.map(chunk_fused, (sy_c, sx_c, m_c))  # (n, B, P, O)
        outs = outs.reshape(n_chunks, B, row_chunk, Wo, O)
        out = outs.transpose(1, 0, 2, 3, 4).reshape(B, -1, Wo, O)
        if pad_rows:
            out = out[:, :Ho]
        if bias is not None:
            out = out + bias
        return out

    def chunk_fn(args):
        syk, sxk = args  # (B*dg, K, P) with P = rc*Wo
        Sy = jax.nn.relu(1.0 - jnp.abs(syk[..., None] - iot_h))  # (BG,K,P,H)
        Sx = jax.nn.relu(1.0 - jnp.abs(sxk[..., None] - iot_w))  # (BG,K,P,W)
        # col interp on the MXU: contraction over W (the wider dim)
        tmp = jnp.einsum("gkpw,ghwc->gkphc", Sx, x_hw,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        # row interp: elementwise reduce over H
        val = jnp.einsum("gkph,gkphc->gkpc", Sy, tmp,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        return val  # (BG, K, P, Cg)

    vals = jax.lax.map(chunk_fn, (sy_c, sx_c))  # (n, BG, K, P, Cg)
    vals = vals.reshape(n_chunks, B, dg, K, row_chunk, Wo, Cg)
    vals = vals.transpose(1, 0, 4, 5, 2, 3, 6)  # (B, n, rc, Wo, dg, K, Cg)
    vals = vals.reshape(B, n_chunks * row_chunk, Wo, dg, K, Cg)
    if pad_rows:
        vals = vals[:, :Ho]

    sampled = vals * mask[..., None]  # mask (B, Ho, Wo, dg, K)
    # -> (B, Ho, Wo, K, dg, Cg) -> (B, Ho, Wo, K*C); channel = g*Cg + cg
    sampled = sampled.transpose(0, 1, 2, 4, 3, 5).reshape(B, Ho, Wo, K * C)
    w = weight.reshape(K, C, O).reshape(K * C, O)
    out = jnp.einsum("bhwk,ko->bhwo", sampled, w,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    if bias is not None:
        out = out + bias
    return out


def modulated_deform_conv2d_banded(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    mask: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    band: int = 8,
) -> jnp.ndarray:
    """`modulated_deform_conv2d` for BOUNDED offsets: bilinear sampling as a
    static (2*band)-wide shift-and-accumulate instead of dense H/W
    interpolation matmuls.

    Every sample position is (y + ky + dy, x + kx + dx) with tap offsets
    ky/kx in {-1,0,1}; when |offset| <= band - 2 the displacement from the
    output position lies in [-(band-1), band-1], so the bilinear weights are
    nonzero only on a static window of 2*band shifted copies of the input —
    ~70x fewer FLOPs than the dense H/W one-hot contraction for the
    flow-completion net (offsets are 5*tanh, model/recurrent_flow_completion
    .py:30-38; its deform conv has NO flow term, unlike the generator's).

    stride=1, padding=1, dilation=1; layouts as modulated_deform_conv2d.
    Zeros-outside-image semantics preserved (zero padding).
    """
    B, H, W, C = x.shape
    kh, kw, Cw, O = weight.shape
    assert Cw == C
    K = kh * kw
    _, Ho, Wo, dg, Koff, _ = offset.shape
    assert Koff == K and Ho == H and Wo == W
    Cg = C // dg
    D = 2 * band  # displacements d - (band - 1) for d in [0, D)

    # displacement of each sample from its output position. Offsets beyond
    # the static band would silently sample zero weight everywhere; clamp to
    # the contract (|offset| <= band - 2) so an out-of-contract caller gets
    # saturated sampling instead of corrupt (all-zero) output.
    offset = jnp.clip(offset, -(band - 2.0), band - 2.0)
    ky = jnp.asarray(np.repeat(np.arange(kh) - 1, kw), x.dtype)  # (K,)
    kx = jnp.asarray(np.tile(np.arange(kw) - 1, kh), x.dtype)
    rel_y = offset[..., 0] + ky  # (B, H, W, dg, K)
    rel_x = offset[..., 1] + kx

    def g_major(a):  # (B, H, W, dg, K) -> (B*dg, H, W, K)
        return a.transpose(0, 3, 1, 2, 4).reshape(B * dg, H, W, K)

    rel_y = g_major(rel_y)
    rel_x = g_major(rel_x)
    d_vals = jnp.asarray(np.arange(D) - (band - 1), x.dtype)

    x_g = (x.reshape(B, H, W, dg, Cg).transpose(0, 3, 1, 2, 4)
           .reshape(B * dg, H, W, Cg))

    # Both interpolation weights belong to the OUTPUT position (y, x), so
    # the value read for (dy, dx) is x[y+dy, x+dx]: build all D*D shifted
    # views (static slices of one padded buffer), then contract dy and dx in
    # two stages (the dx-shift index rides through the first contraction).
    wy = jax.nn.relu(1.0 - jnp.abs(rel_y[..., None] - d_vals))  # (BG,H,W,K,D)
    wx = jax.nn.relu(1.0 - jnp.abs(rel_x[..., None] - d_vals))
    xpad = jnp.pad(
        x_g, ((0, 0), (band - 1, band), (band - 1, band), (0, 0)))
    xe = jnp.stack([xpad[:, :, e : e + W] for e in range(D)], axis=0)
    xde = jnp.stack([xe[:, :, d : d + H] for d in range(D)], axis=0)
    # (D_dy, D_dx, BG, H, W, Cg)
    tmp = jnp.einsum("ghwkd,deghwc->eghwkc", wy, xde,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    val = jnp.einsum("ghwke,eghwkc->ghwkc", wx, tmp,
                     preferred_element_type=jnp.float32).astype(x.dtype)

    vals = val.reshape(B, dg, H, W, K, Cg)
    m = mask.transpose(0, 3, 1, 2, 4)  # (B, dg, Ho, Wo, K)
    sampled = vals * m[..., None]
    # -> (B, Ho, Wo, K, dg, Cg) -> (B, Ho, Wo, K*C); channel = g*Cg + cg
    sampled = sampled.transpose(0, 2, 3, 4, 1, 5).reshape(B, Ho, Wo, K * C)
    w = weight.reshape(K, C, O).reshape(K * C, O)
    out = jnp.einsum("bhwk,ko->bhwo", sampled, w,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    if bias is not None:
        out = out + bias
    return out


def _bilinear_gather_zeros(img: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample img (B,H,W,C) at pixel coords y/x (B,...), zeros outside."""
    B, H, W, C = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = (x - x0).astype(img.dtype)
    wy1 = (y - y0).astype(img.dtype)

    def corner(yc, xc, wy, wx):
        valid = ((xc >= 0) & (xc <= W - 1) & (yc >= 0) & (yc <= H - 1)).astype(img.dtype)
        yi = jnp.clip(yc.astype(jnp.int32), 0, H - 1)
        xi = jnp.clip(xc.astype(jnp.int32), 0, W - 1)
        return _gather2d(img, yi, xi) * (wy * wx * valid)[..., None]

    return (
        corner(y0, x0, 1 - wy1, 1 - wx1)
        + corner(y0, x0 + 1, 1 - wy1, wx1)
        + corner(y0 + 1, x0, wy1, 1 - wx1)
        + corner(y0 + 1, x0 + 1, wy1, wx1)
    )


def split_offset_mask_channels(
    raw: jnp.ndarray, deform_groups: int, max_residue_magnitude: float,
    flow: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Convert a conv_offset output into (offset, mask) for deform conv.

    The reference's conv_offset emits 27*dg channels; the first 18*dg are the
    offsets (after `max_residue * tanh`), the last 9*dg the modulation mask
    (after sigmoid). Channel layout follows torchvision: offsets interleave
    (dy, dx) per tap per group; masks are [g][k].
    (model/recurrent_flow_completion.py:30-44, model/propainter.py:56-69.
    Note: the reference's chunk-3/re-cat dance is an identity on the channel
    order, so a straight split reproduces it.)

    Args:
      raw:  (B, H, W, 27*dg) conv output.
      flow: optional (B, H, W, 2) (dx, dy) flow added to every tap's offset
            (the reference adds flow.flip(1) = (dy, dx) to the interleaved
            channels — model/propainter.py:62).

    Returns:
      offset (B, H, W, dg, K, 2) with (dy, dx); mask (B, H, W, dg, K).
    """
    dg = deform_groups
    B, H, W, _ = raw.shape
    off = max_residue_magnitude * jnp.tanh(raw[..., : 18 * dg])
    offset = off.reshape(B, H, W, dg, 9, 2)
    if flow is not None:
        flow_yx = flow[..., ::-1]  # (dy, dx)
        offset = offset + flow_yx[:, :, :, None, None, :]
    mask = jax.nn.sigmoid(raw[..., 18 * dg :]).reshape(B, H, W, dg, 9)
    return offset, mask
