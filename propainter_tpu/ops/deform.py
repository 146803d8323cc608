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
