"""Bilinear/nearest sampling and flow warping.

Reimplements (TPU-native, NHWC, gather-based) the sampling semantics the
reference gets from `torch.nn.functional.grid_sample`:
  * `flow_warp`      — reference model/modules/flow_loss_utils.py:6-45
  * `bilinear_sampler` (pixel-coordinate wrapper) — reference RAFT/utils/utils.py:57-71
  * `coords_grid`    — reference RAFT/utils/utils.py:74-77
  * `upflow8`        — reference RAFT/utils/utils.py:80-82
  * `fb_consistency_check` — reference model/propainter.py:22-31

Everything here lowers to XLA gathers + elementwise math, which fuse well on
TPU; there is no data-dependent control flow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _unnormalize(coord: jnp.ndarray, size: int, align_corners: bool) -> jnp.ndarray:
    """Map normalized [-1, 1] coords to pixel coords, matching grid_sample."""
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def grid_sample(
    img: jnp.ndarray,
    grid: jnp.ndarray,
    mode: str = "bilinear",
    padding_mode: str = "zeros",
    align_corners: bool = True,
) -> jnp.ndarray:
    """Sample `img` at normalized grid locations.

    Args:
      img:  (B, H, W, C) source.
      grid: (B, Ho, Wo, 2) normalized coords in [-1, 1], last dim = (x, y).
      mode: 'bilinear' or 'nearest'.
      padding_mode: 'zeros' or 'border'.
      align_corners: matches torch semantics.

    Returns:
      (B, Ho, Wo, C) sampled output.
    """
    B, H, W, C = img.shape
    x = _unnormalize(grid[..., 0], W, align_corners)
    y = _unnormalize(grid[..., 1], H, align_corners)

    if mode == "nearest":
        # torch rounds half away from... uses round-to-nearest (floor(x+0.5)).
        xi = jnp.floor(x + 0.5).astype(jnp.int32)
        yi = jnp.floor(y + 0.5).astype(jnp.int32)
        if padding_mode == "border":
            xi = jnp.clip(xi, 0, W - 1)
            yi = jnp.clip(yi, 0, H - 1)
            valid = None
        else:
            valid = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
            xi = jnp.clip(xi, 0, W - 1)
            yi = jnp.clip(yi, 0, H - 1)
        out = _gather2d(img, yi, xi)
        if valid is not None:
            out = out * valid[..., None].astype(img.dtype)
        return out

    if mode != "bilinear":
        raise ValueError(f"unsupported mode: {mode}")

    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1)
        y = jnp.clip(y, 0.0, H - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0
    wx1 = (x - x0).astype(img.dtype)
    wy1 = (y - y0).astype(img.dtype)
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def corner(yc, xc, wy, wx):
        yi = yc.astype(jnp.int32)
        xi = xc.astype(jnp.int32)
        if padding_mode == "zeros":
            valid = ((xc >= 0) & (xc <= W - 1) & (yc >= 0) & (yc <= H - 1)).astype(
                img.dtype
            )
            w = wy * wx * valid
        else:
            w = wy * wx
        yi = jnp.clip(yi, 0, H - 1)
        xi = jnp.clip(xi, 0, W - 1)
        return _gather2d(img, yi, xi) * w[..., None]

    out = (
        corner(y0, x0, wy0, wx0)
        + corner(y0, x1, wy0, wx1)
        + corner(y1, x0, wy1, wx0)
        + corner(y1, x1, wy1, wx1)
    )
    return out


def _gather2d(img: jnp.ndarray, yi: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    """Gather img[b, yi[b, ...], xi[b, ...], :] -> (B, *idx_shape, C)."""
    B, H, W, C = img.shape
    flat = img.reshape(B, H * W, C)
    idx = yi * W + xi  # (B, ...)
    idx_flat = idx.reshape(B, -1)
    out = jnp.take_along_axis(flat, idx_flat[..., None], axis=1)
    return out.reshape(*idx.shape, C)


def flow_warp(
    x: jnp.ndarray,
    flow: jnp.ndarray,
    interpolation: str = "bilinear",
    padding_mode: str = "zeros",
    align_corners: bool = True,
) -> jnp.ndarray:
    """Backward-warp `x` by `flow` (pixel offsets).

    Args:
      x:    (B, H, W, C).
      flow: (B, H, W, 2), last dim = (dx, dy) in pixels (un-normalized).

    Matches reference model/modules/flow_loss_utils.py:6-45 (which normalizes
    grid+flow into [-1,1] and calls grid_sample align_corners=True, zeros).
    """
    B, H, W, _ = x.shape
    gx = jnp.arange(W, dtype=flow.dtype)
    gy = jnp.arange(H, dtype=flow.dtype)
    grid_x = jnp.broadcast_to(gx[None, None, :], (B, H, W)) + flow[..., 0]
    grid_y = jnp.broadcast_to(gy[None, :, None], (B, H, W)) + flow[..., 1]
    # normalize to [-1, 1] (max(size-1, 1) guard as in the reference)
    nx = 2.0 * grid_x / max(W - 1, 1) - 1.0
    ny = 2.0 * grid_y / max(H - 1, 1) - 1.0
    grid = jnp.stack([nx, ny], axis=-1)
    return grid_sample(
        x, grid, mode=interpolation, padding_mode=padding_mode,
        align_corners=align_corners,
    )


def flow_warp_bilinear_nearest(
    xb: jnp.ndarray,
    xn: jnp.ndarray,
    flow: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Warp `xb` bilinearly and `xn` nearest by the SAME flow with ONE
    4-corner gather (zeros padding, align_corners=True — the
    `flow_warp` semantics both warps use in image propagation).

    The nearest sample floor(x+0.5) is always one of the two bilinear
    x-corners (x0 if frac < 0.5 else x0+1, and identically for y), so the
    nearest result is a per-pixel SELECT over the corners already gathered
    for the bilinear result — bit-identical to
    `flow_warp(xn, flow, "nearest")`, including the out-of-bounds zeroing
    (the selected corner's validity is exactly the rounded index's
    validity). Saves one full gather per propagation step (gathers dominate
    warp cost on TPU; reference semantics
    model/modules/flow_loss_utils.py:6-45 + grid_sample mode='nearest').

    Args:
      xb: (B, H, W, Cb) bilinear-warped channels.
      xn: (B, H, W, Cn) nearest-warped channels.
      flow: (B, H, W, 2) pixel offsets (dx, dy).
    Returns:
      (warped_xb (B, H, W, Cb), warped_xn (B, H, W, Cn)).
    """
    B, H, W, Cb = xb.shape
    img = jnp.concatenate([xb, xn], axis=-1)
    gx = jnp.arange(W, dtype=flow.dtype)
    gy = jnp.arange(H, dtype=flow.dtype)
    # identical coordinate math to flow_warp -> grid_sample (normalize to
    # [-1, 1], then unnormalize) so results are bit-identical
    grid_x = jnp.broadcast_to(gx[None, None, :], (B, H, W)) + flow[..., 0]
    grid_y = jnp.broadcast_to(gy[None, :, None], (B, H, W)) + flow[..., 1]
    nx = 2.0 * grid_x / max(W - 1, 1) - 1.0
    ny = 2.0 * grid_y / max(H - 1, 1) - 1.0
    x = _unnormalize(nx, W, True)
    y = _unnormalize(ny, H, True)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0).astype(img.dtype)
    fy = (y - y0).astype(img.dtype)
    # the exact nearest-mode rounding (floor(x+0.5) in fp, which lands on x0
    # or x0+1 — see grid_sample) so the select is bit-identical even when
    # x+0.5 rounds across the integer boundary (fx>=0.5 alone is not)
    sel_x = jnp.floor(x + 0.5) > x0
    sel_y = jnp.floor(y + 0.5) > y0

    def corner(yc, xc):
        valid = ((xc >= 0) & (xc <= W - 1) & (yc >= 0)
                 & (yc <= H - 1)).astype(img.dtype)
        yi = jnp.clip(yc.astype(jnp.int32), 0, H - 1)
        xi = jnp.clip(xc.astype(jnp.int32), 0, W - 1)
        return _gather2d(img, yi, xi), valid[..., None]

    g00, v00 = corner(y0, x0)
    g01, v01 = corner(y0, x0 + 1.0)
    g10, v10 = corner(y0 + 1.0, x0)
    g11, v11 = corner(y0 + 1.0, x0 + 1.0)

    wx1 = fx[..., None]
    wy1 = fy[..., None]
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1
    out_b = (g00[..., :Cb] * (wy0 * wx0 * v00)
             + g01[..., :Cb] * (wy0 * wx1 * v01)
             + g10[..., :Cb] * (wy1 * wx0 * v10)
             + g11[..., :Cb] * (wy1 * wx1 * v11))

    sx = sel_x[..., None]
    sy = sel_y[..., None]
    n0 = jnp.where(sx, g01[..., Cb:] * v01, g00[..., Cb:] * v00)
    n1 = jnp.where(sx, g11[..., Cb:] * v11, g10[..., Cb:] * v10)
    out_n = jnp.where(sy, n1, n0)
    return out_b, out_n


def flow_warp_packed(
    xb: jnp.ndarray,
    xn: jnp.ndarray | None,
    flow: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray | None]:
    """`flow_warp_bilinear_nearest` with the four corner fetches packed into
    ONE gather.

    The 2x2 neighborhood of every top-left corner is pre-packed into the
    channel axis of a (H+1, W+1) extended image (row/col i holds corner
    y0/x0 = i-1, zeros outside the source), so the per-pixel fetch is one
    row of 4C channels instead of four rows of C — gather cost on TPU is
    per-row dominated, so this quarters the dominant term of a dense warp.
    Packing itself is four static pad+shift copies (VPU, fusable).

    Semantics are identical to `flow_warp(xb, flow)` /
    `flow_warp(xn, flow, "nearest")` (zeros padding, align_corners=True):
    out-of-range corners are zeroed by the per-corner validity factors
    computed from the true (unclipped) coordinates, and the nearest select
    uses the exact fp rounding floor(x+0.5).

    Args:
      xb: (B, H, W, Cb) bilinear-warped channels.
      xn: (B, H, W, Cn) nearest-warped channels, or None.
      flow: (B, H, W, 2) pixel offsets (dx, dy).
    Returns:
      (warped_xb, warped_xn or None).
    """
    B, H, W, Cb = xb.shape
    img = xb if xn is None else jnp.concatenate([xb, xn], axis=-1)
    C = img.shape[-1]
    # packed extended image: packed[i, j] holds the 2x2 block at
    # (y0, x0) = (i-1, j-1); zeros where the block leaves the source
    ext = jnp.pad(img, ((0, 0), (1, 1), (1, 1), (0, 0)))
    packed = jnp.concatenate([
        ext[:, :-1, :-1], ext[:, :-1, 1:],
        ext[:, 1:, :-1], ext[:, 1:, 1:],
    ], axis=-1)  # (B, H+1, W+1, 4C): [g00, g01, g10, g11]

    # identical coordinate math to flow_warp -> grid_sample (normalize to
    # [-1, 1], then unnormalize) so results are bit-identical
    gx = jnp.arange(W, dtype=flow.dtype)
    gy = jnp.arange(H, dtype=flow.dtype)
    grid_x = jnp.broadcast_to(gx[None, None, :], (B, H, W)) + flow[..., 0]
    grid_y = jnp.broadcast_to(gy[None, :, None], (B, H, W)) + flow[..., 1]
    nx = 2.0 * grid_x / max(W - 1, 1) - 1.0
    ny = 2.0 * grid_y / max(H - 1, 1) - 1.0
    x = _unnormalize(nx, W, True)
    y = _unnormalize(ny, H, True)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    xi = jnp.clip(x0.astype(jnp.int32) + 1, 0, W)
    yi = jnp.clip(y0.astype(jnp.int32) + 1, 0, H)
    g = _gather2d(packed, yi, xi)  # (B, H, W, 4C)

    def valid(yc, xc):
        return ((xc >= 0) & (xc <= W - 1) & (yc >= 0)
                & (yc <= H - 1)).astype(img.dtype)[..., None]

    v00 = valid(y0, x0)
    v01 = valid(y0, x0 + 1.0)
    v10 = valid(y0 + 1.0, x0)
    v11 = valid(y0 + 1.0, x0 + 1.0)
    g00, g01, g10, g11 = (g[..., :C], g[..., C:2 * C],
                          g[..., 2 * C:3 * C], g[..., 3 * C:])

    wx1 = (x - x0).astype(img.dtype)[..., None]
    wy1 = (y - y0).astype(img.dtype)[..., None]
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1
    out_b = (g00[..., :Cb] * (wy0 * wx0 * v00)
             + g01[..., :Cb] * (wy0 * wx1 * v01)
             + g10[..., :Cb] * (wy1 * wx0 * v10)
             + g11[..., :Cb] * (wy1 * wx1 * v11))
    if xn is None:
        return out_b, None

    # exact nearest-mode rounding (see flow_warp_bilinear_nearest)
    sx = (jnp.floor(x + 0.5) > x0)[..., None]
    sy = (jnp.floor(y + 0.5) > y0)[..., None]
    n0 = jnp.where(sx, g01[..., Cb:] * v01, g00[..., Cb:] * v00)
    n1 = jnp.where(sx, g11[..., Cb:] * v11, g10[..., Cb:] * v10)
    out_n = jnp.where(sy, n1, n0)
    return out_b, out_n


def bilinear_sampler(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Sample with *pixel* coordinates (RAFT convention).

    Args:
      img:    (B, H, W, C).
      coords: (B, Ho, Wo, 2) pixel coords, last dim = (x, y).

    Matches reference RAFT/utils/utils.py:57-71 (normalizes by (size-1) and
    grid_samples with align_corners=True, zeros padding).
    """
    B, H, W, _ = img.shape
    nx = 2.0 * coords[..., 0] / (W - 1) - 1.0
    ny = 2.0 * coords[..., 1] / (H - 1) - 1.0
    grid = jnp.stack([nx, ny], axis=-1)
    return grid_sample(img, grid, mode="bilinear", padding_mode="zeros",
                       align_corners=True)


def coords_grid(batch: int, ht: int, wd: int, dtype=jnp.float32) -> jnp.ndarray:
    """(B, H, W, 2) pixel-coordinate grid, last dim = (x, y).

    NHWC analogue of reference RAFT/utils/utils.py:74-77 (which is (B,2,H,W)).
    """
    gx = jnp.broadcast_to(jnp.arange(wd, dtype=dtype)[None, :], (ht, wd))
    gy = jnp.broadcast_to(jnp.arange(ht, dtype=dtype)[:, None], (ht, wd))
    g = jnp.stack([gx, gy], axis=-1)
    return jnp.broadcast_to(g[None], (batch, ht, wd, 2))


def upflow8(flow: jnp.ndarray) -> jnp.ndarray:
    """Upsample (B, H, W, 2) flow 8x bilinearly (align_corners=True), scale by 8.

    Matches reference RAFT/utils/utils.py:80-82.
    """
    from propainter_tpu.ops.interp import resize

    B, H, W, _ = flow.shape
    return 8.0 * resize(flow, (8 * H, 8 * W), method="bilinear",
                        align_corners=True)


def length_sq(x: jnp.ndarray) -> jnp.ndarray:
    """Sum of squares over channel dim, keepdims. x: (B, H, W, C)."""
    return jnp.sum(jnp.square(x), axis=-1, keepdims=True)


def fb_consistency_check(
    flow_fw: jnp.ndarray,
    flow_bw: jnp.ndarray,
    alpha1: float = 0.01,
    alpha2: float = 0.5,
) -> jnp.ndarray:
    """Forward-backward flow consistency gate.

    Args:
      flow_fw, flow_bw: (B, H, W, 2).
    Returns:
      (B, H, W, 1) float mask, 1 where flows are consistent.

    Matches reference model/propainter.py:22-31.
    """
    flow_bw_warped = flow_warp(flow_bw, flow_fw)
    return fb_consistency_from_warped(flow_fw, flow_bw_warped, alpha1, alpha2)


def fb_consistency_from_warped(
    flow_fw: jnp.ndarray,
    flow_bw_warped: jnp.ndarray,
    alpha1: float = 0.01,
    alpha2: float = 0.5,
) -> jnp.ndarray:
    """`fb_consistency_check` when `flow_warp(flow_bw, flow_fw)` was already
    computed — propagation steps batch that warp with others sharing the
    same grid (one gather instead of three; gathers dominate warp cost on
    TPU)."""
    flow_diff_fw = flow_fw + flow_bw_warped
    mag_sq_fw = length_sq(flow_fw) + length_sq(flow_bw_warped)
    occ_thresh_fw = alpha1 * mag_sq_fw + alpha2
    return (length_sq(flow_diff_fw) < occ_thresh_fw).astype(flow_fw.dtype)
