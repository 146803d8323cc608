"""RAFT all-pairs correlation volume: build + windowed lookup.

Reimplements reference RAFT/corr.py:12-60 TPU-natively:
  * `corr_pyramid`  — one big (B*H*W, dim) x (dim, H*W) matmul on the MXU,
    then 4 levels of 2x average pooling.
  * `corr_lookup`   — radius-r bilinear window gather around per-pixel
    centroids at each level; static (2r+1)^2 window, no dynamic shapes.

Output channel ordering quirk (kept for weight parity): the reference adds a
(dy, dx)-ordered delta to (x, y)-ordered coords (RAFT/corr.py:37-43), so the
flattened window index is i*(2r+1)+j sampling at (x + i - r, y + j - r) — the
*x offset is the major index*. We replicate that exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from propainter_tpu.ops.interp import avg_pool2d
from propainter_tpu.ops.warp import bilinear_sampler


def corr_pyramid(
    fmap1: jnp.ndarray, fmap2: jnp.ndarray, num_levels: int = 4
) -> list[jnp.ndarray]:
    """Build the correlation pyramid.

    Args:
      fmap1, fmap2: (B, H, W, D) feature maps.
    Returns:
      list of (B*H*W, H/2^i, W/2^i, 1) correlation volumes (fp32).
    """
    B, H, W, D = fmap1.shape
    f1 = fmap1.reshape(B, H * W, D).astype(jnp.float32)
    f2 = fmap2.reshape(B, H * W, D).astype(jnp.float32)
    corr = jnp.einsum("bnd,bmd->bnm", f1, f2, preferred_element_type=jnp.float32)
    corr = corr / jnp.sqrt(jnp.float32(D))
    corr = corr.reshape(B * H * W, H, W, 1)
    pyramid = [corr]
    for _ in range(num_levels - 1):
        corr = avg_pool2d(corr, 2, 2)
        pyramid.append(corr)
    return pyramid


def corr_lookup(
    pyramid: list[jnp.ndarray], coords: jnp.ndarray, radius: int = 4
) -> jnp.ndarray:
    """Look up correlation features in a (2r+1)^2 window at each level.

    Args:
      pyramid: output of `corr_pyramid`.
      coords:  (B, H, W, 2) pixel coords, last dim (x, y).
    Returns:
      (B, H, W, num_levels*(2r+1)^2) correlation features (fp32).
    """
    B, H, W, _ = coords.shape
    r = radius
    n = 2 * r + 1
    d = jnp.linspace(-r, r, n, dtype=jnp.float32)
    # reference quirk: delta[i, j] = (d[i], d[j]) added to (x, y) -> x gets
    # the major index i.
    dx = jnp.broadcast_to(d[:, None], (n, n))
    dy = jnp.broadcast_to(d[None, :], (n, n))
    delta = jnp.stack([dx, dy], axis=-1)  # (n, n, 2), (x_off, y_off)

    centroid = coords.reshape(B * H * W, 1, 1, 2).astype(jnp.float32)
    outs = []
    for i, corr in enumerate(pyramid):
        coords_lvl = centroid / (2.0 ** i) + delta[None]
        sampled = bilinear_sampler(corr, coords_lvl)  # (BHW, n, n, 1)
        outs.append(sampled.reshape(B, H, W, n * n))
    return jnp.concatenate(outs, axis=-1)


def _interp_matrix(t: jnp.ndarray, size: int) -> jnp.ndarray:
    """Rows of bilinear interpolation weights: M[..., k, s] = max(0, 1-|t_k - s|).

    Sampling `v[s] @ M[k]` equals zeros-padded bilinear interpolation of v at
    position t_k (out-of-range positions get partial/zero weight — identical
    to grid_sample's zeros padding in pixel space).
    """
    s = jax.lax.broadcasted_iota(jnp.float32, (size,), 0)
    return jax.nn.relu(1.0 - jnp.abs(t[..., None] - s))


def corr_lookup_mxu(
    pyramid: list[jnp.ndarray], coords: jnp.ndarray, radius: int = 4
) -> jnp.ndarray:
    """`corr_lookup` as matmuls instead of gathers (TPU-native formulation).

    Bilinear window sampling is separable: out[n, i, j] =
    sum_{h,w} Sy[n,j,h] * corr[n,h,w] * Sx[n,i,w], where Sy/Sx are per-row
    interpolation matrices built from iota comparisons. Everything runs on
    the MXU/VPU — no gather, no dynamic shapes. Numerically identical to
    `corr_lookup` (reference RAFT/corr.py:29-49 semantics, including the
    x-major window ordering).
    """
    B, H, W, _ = coords.shape
    r = radius
    n = 2 * r + 1
    N = B * H * W
    cx = coords[..., 0].reshape(N).astype(jnp.float32)
    cy = coords[..., 1].reshape(N).astype(jnp.float32)
    d = jnp.linspace(-r, r, n, dtype=jnp.float32)

    outs = []
    for lvl, corr in enumerate(pyramid):
        Hc, Wc = corr.shape[1:3]
        ty = cy[:, None] / (2.0 ** lvl) + d[None, :]  # (N, n)
        tx = cx[:, None] / (2.0 ** lvl) + d[None, :]
        Sy = _interp_matrix(ty, Hc)  # (N, n, Hc)
        Sx = _interp_matrix(tx, Wc)  # (N, n, Wc)
        c = corr.reshape(N, Hc, Wc)
        tmp = jnp.einsum("njh,nhw->njw", Sy, c,
                         preferred_element_type=jnp.float32)
        out = jnp.einsum("niw,njw->nij", Sx, tmp,
                         preferred_element_type=jnp.float32)
        outs.append(out.reshape(B, H, W, n * n))
    return jnp.concatenate(outs, axis=-1)
