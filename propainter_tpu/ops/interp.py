"""Resizing and pooling with exact torch `F.interpolate` / pooling semantics.

The reference relies on torch's resize conventions in several
numerics-sensitive places (decoder 2x upsampling with align_corners=True,
flow downsampling with align_corners=False, nearest mask downsampling,
avg-pooled correlation pyramids). jax.image.resize uses different sampling
conventions, so we implement the torch ones directly as separable gathers —
they compile to two small matmul/gather passes that XLA fuses.

Reference semantics reimplemented here:
  * bilinear align_corners=True/False — e.g. model/propainter.py:249-253,338
  * nearest (floor(dst * in/out))     — e.g. model/propainter.py:340-342
  * avg_pool2d k=2 s=2 (corr pyramid) — RAFT/corr.py:26
  * max_pool2d (window occupancy)     — model/modules/sparse_transformer.py:155,227
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def _linear_weights(in_size: int, out_size: int, align_corners: bool):
    """Per-output (idx0, idx1, w1) for 1-D linear resize, torch conventions."""
    out = np.arange(out_size, dtype=np.float64)
    if align_corners:
        if out_size == 1:
            src = np.zeros(1)
        else:
            src = out * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = (out + 0.5) * scale - 0.5
        src = np.maximum(src, 0.0)  # torch clamps negative source coords
    i0 = np.floor(src).astype(np.int64)
    i0 = np.minimum(i0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    w1 = src - np.floor(src)
    w1 = np.where(i0 == i1, 0.0, w1)
    return i0, i1, w1


def _nearest_index(in_size: int, out_size: int):
    """torch 'nearest': src = floor(dst * in/out)."""
    out = np.arange(out_size, dtype=np.float64)
    idx = np.floor(out * (in_size / out_size)).astype(np.int64)
    return np.minimum(idx, in_size - 1)


def _linear_matrix(in_size: int, out_size: int, align_corners: bool):
    """(out_size, in_size) interpolation matrix for 1-D linear resize:
    row o has (1-w) at i0[o] and w at i1[o] (summed when i0 == i1)."""
    i0, i1, w1 = _linear_weights(in_size, out_size, align_corners)
    m = np.zeros((out_size, in_size), np.float32)
    np.add.at(m, (np.arange(out_size), i0), 1.0 - w1)
    np.add.at(m, (np.arange(out_size), i1), w1)
    return m


def resize(
    x: jnp.ndarray,
    size: tuple[int, int],
    method: str = "bilinear",
    align_corners: bool = False,
    impl: str = "gather",
) -> jnp.ndarray:
    """Resize (..., H, W, C) to (..., size[0], size[1], C), torch semantics.

    impl='gather' (default): 4 row/col gathers + lerp.
    impl='mxu': the same separable interpolation expressed as two dense
    matmuls with 2-sparse interpolation matrices — redundant FLOPs, but
    on TPU a full-width MXU contraction beats per-row gathers (the same
    trade measured in ops/corr.corr_lookup_mxu / ops/deform).
    """
    *lead, H, W, C = x.shape
    Ho, Wo = size
    if (Ho, Wo) == (H, W):
        return x
    xb = x.reshape((-1, H, W, C))

    if method == "nearest":
        iy = jnp.asarray(_nearest_index(H, Ho))
        ix = jnp.asarray(_nearest_index(W, Wo))
        out = xb[:, iy][:, :, ix]
    elif method == "bilinear" and impl == "mxu":
        my = jnp.asarray(_linear_matrix(H, Ho, align_corners), x.dtype)
        mx = jnp.asarray(_linear_matrix(W, Wo, align_corners), x.dtype)
        # contract the axis that leaves the smaller intermediate first;
        # on ties prefer the W-first order — contracting the second-minor
        # w dim lowers better than the major h dim (2x-upsample shapes:
        # 14.0 -> 11.1 ms at the flowcomp ups2 stage, tools/resize_form_ab)
        if Ho * W < H * Wo:
            rows = jnp.einsum("oh,bhwc->bowc", my, xb)
            out = jnp.einsum("pw,bowc->bopc", mx, rows)
        else:
            cols = jnp.einsum("pw,bhwc->bhpc", mx, xb)
            out = jnp.einsum("oh,bhpc->bopc", my, cols)
    elif method == "bilinear":
        y0, y1, wy = _linear_weights(H, Ho, align_corners)
        x0, x1, wx = _linear_weights(W, Wo, align_corners)
        y0, y1 = jnp.asarray(y0), jnp.asarray(y1)
        x0, x1 = jnp.asarray(x0), jnp.asarray(x1)
        wy = jnp.asarray(wy, dtype=x.dtype)[None, :, None, None]
        wx = jnp.asarray(wx, dtype=x.dtype)[None, None, :, None]
        rows = xb[:, y0] * (1 - wy) + xb[:, y1] * wy  # (B, Ho, W, C)
        out = rows[:, :, x0] * (1 - wx) + rows[:, :, x1] * wx
    else:
        raise ValueError(f"unsupported method: {method}")

    return out.reshape((*lead, Ho, Wo, C))


def avg_pool2d(x: jnp.ndarray, window: int = 2, stride: int | None = None) -> jnp.ndarray:
    """Average pool over (H, W) of an NHWC tensor (count_include_pad=True,
    no padding) — matches torch F.avg_pool2d(x, window, stride)."""
    stride = stride or window
    summed = lax.reduce_window(
        x, 0.0, lax.add,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )
    return summed / float(window * window)


def max_pool2d(
    x: jnp.ndarray,
    window: tuple[int, int],
    stride: tuple[int, int] | None = None,
    padding: tuple[int, int] = (0, 0),
) -> jnp.ndarray:
    """Max pool over (H, W) of an NHWC tensor — matches torch F.max_pool2d
    (floor mode, -inf padding)."""
    stride = stride or window
    neg_inf = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return lax.reduce_window(
        x, neg_inf, lax.max,
        window_dimensions=(1, window[0], window[1], 1),
        window_strides=(1, stride[0], stride[1], 1),
        padding=((0, 0), (padding[0], padding[0]), (padding[1], padding[1]), (0, 0)),
    )
