"""Differentiable(-ish) Canny edge detector (NHWC, jax).

Reimplements the reference's vendored Kornia pipeline
(model/canny/canny_filter.py:38-175):
  separable 5x5 gaussian blur (sigma 1, reflect pad) -> un-normalized sobel
  gradients (replicate pad) -> directional NMS (8 kernels, zero pad) ->
  double threshold (0.1/0.2) -> conv-based hysteresis propagation.

The reference runs hysteresis as a Python `while` until convergence; here it
is a `lax.while_loop`, which XLA compiles to a bounded on-device loop. The
edges are only used as stop-gradient training targets
(core/trainer_flow_w_edge.py:261-273), so the loop's non-differentiability
is irrelevant.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def _gaussian_kernel1d(ksize: int, sigma: float) -> np.ndarray:
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _conv_same(x: jnp.ndarray, kernel: np.ndarray, pad_mode: str) -> jnp.ndarray:
    """Correlate (B,H,W,1) with a (kh,kw) or (K,kh,kw) kernel stack."""
    k = np.asarray(kernel, np.float32)
    if k.ndim == 2:
        k = k[None]
    K, kh, kw = k.shape
    ph, pw = kh // 2, kw // 2
    if pad_mode == "zeros":
        xp = x
        pad = [(ph, ph), (pw, pw)]
    else:
        mode = {"reflect": "reflect", "replicate": "edge"}[pad_mode]
        xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)), mode=mode)
        pad = [(0, 0), (0, 0)]
    w = jnp.asarray(k.transpose(1, 2, 0)[:, :, None, :])  # (kh,kw,1,K)
    return lax.conv_general_dilated(
        xp, w, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"))


_SOBEL_X = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32)
_SOBEL_Y = _SOBEL_X.T

# 8 directional NMS kernels, index d compares centre against direction d*45deg
# (reference model/canny/kernels.py:604-620)
_NMS = np.zeros((8, 3, 3), np.float32)
_NMS[:, 1, 1] = 1.0
_dirs = [(1, 2), (2, 2), (2, 1), (2, 0), (1, 0), (0, 0), (0, 1), (0, 2)]
for _d, (_r, _c) in enumerate(_dirs):
    _NMS[_d, _r, _c] = -1.0

# hysteresis kernels: neighbour at direction d (reference :623-639)
_HYST = np.zeros((8, 3, 3), np.float32)
for _d, (_r, _c) in enumerate(_dirs):
    _HYST[_d, _r, _c] = 1.0


def canny_edges(
    x: jnp.ndarray,
    low_threshold: float = 0.1,
    high_threshold: float = 0.2,
    hysteresis: bool = True,
    eps: float = 1e-6,
    sigma: float = 1.0,
) -> jnp.ndarray:
    """Canny edges of a single-channel image.

    Args:
      x: (B, H, W, 1) grayscale in [0, 1].
      sigma: gaussian blur std (reference canny() default 1; the flow
        trainer constructs Canny(sigma=(2, 2)), trainer_flow_w_edge.py:60).
    Returns:
      (B, H, W, 1) edge map in {0, (0.5 if not hysteresis), 1}.
    """
    gk = _gaussian_kernel1d(5, sigma)
    blurred = _conv_same(x, gk[None, :], "reflect")       # horizontal
    blurred = _conv_same(blurred, gk[:, None], "reflect")  # vertical

    gx = _conv_same(blurred, _SOBEL_X, "replicate")[..., 0]
    gy = _conv_same(blurred, _SOBEL_Y, "replicate")[..., 0]

    magnitude = jnp.sqrt(gx * gx + gy * gy + eps)
    angle = jnp.arctan2(gy, gx) * (180.0 / math.pi)
    angle = jnp.round(angle / 45.0) * 45.0

    nms = _conv_same(magnitude[..., None], _NMS, "zeros")  # (B,H,W,8)
    pos_idx = jnp.mod(angle / 45.0, 8).astype(jnp.int32)
    neg_idx = jnp.mod(angle / 45.0 + 4, 8).astype(jnp.int32)
    sel_pos = jnp.take_along_axis(nms, pos_idx[..., None], axis=-1)[..., 0]
    sel_neg = jnp.take_along_axis(nms, neg_idx[..., None], axis=-1)[..., 0]
    is_max = jnp.minimum(sel_pos, sel_neg) > 0.0
    magnitude = magnitude * is_max

    low = magnitude > low_threshold
    high = magnitude > high_threshold
    edges = low * 0.5 + high * 0.5

    if not hysteresis:
        return edges[..., None].astype(x.dtype)

    def body(carry):
        edges, _ = carry
        weak = (edges == 0.5).astype(x.dtype)
        strong = (edges == 1.0).astype(x.dtype)
        hyst = _conv_same(edges[..., None], _HYST, "zeros")
        connected = jnp.any(hyst == 1.0, axis=-1).astype(x.dtype)
        mag = connected * weak + strong
        new_edges = mag + (mag == 0) * weak * 0.5
        return new_edges, edges

    def cond(carry):
        edges, edges_old = carry
        return jnp.any(jnp.abs(edges - edges_old) != 0)

    edges, _ = lax.while_loop(
        cond, body, (edges.astype(x.dtype), -jnp.ones_like(edges, x.dtype)))
    # after convergence the reference returns hysteresis_magnitude, i.e. the
    # weak-only residue (0.5) is dropped
    final = jnp.where(edges == 0.5, 0.0, edges)
    return final[..., None].astype(x.dtype)
