"""Overlapping patch extraction/combination (torch unfold/fold semantics).

The reference uses `nn.Unfold`/`F.fold` for its soft-split / soft-comp
tokenizer (model/modules/sparse_transformer.py:7-61), for the
overlap-renormalized FusionFeedForward (same file :64-101), and for RAFT's
convex flow upsampling (RAFT/raft.py:73-84).

We implement unfold as two static gathers (rows then cols) and fold as the
exact linear adjoint of unfold via `jax.linear_transpose` — torch's fold *is*
the adjoint of unfold, so this matches bit-for-bit (up to fp addition order)
and lowers to XLA scatter-adds that fuse with neighbours.

Channel ordering matches torch: the unfolded feature dim is
C-major, kernel-minor, i.e. index = c*(kh*kw) + i*kw + j.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def unfold_output_size(size: int, kernel: int, stride: int, padding: int) -> int:
    """Number of patch positions along one dim (torch formula)."""
    return (size + 2 * padding - (kernel - 1) - 1) // stride + 1


def unfold(
    x: jnp.ndarray,
    kernel_size: tuple[int, int],
    stride: tuple[int, int],
    padding: tuple[int, int],
) -> jnp.ndarray:
    """Extract sliding local patches.

    Args:
      x: (B, H, W, C).
    Returns:
      (B, L, C*kh*kw) with torch channel ordering (c*kh*kw + i*kw + j),
      L = Ho*Wo patch positions in row-major order.
    """
    B, H, W, C = x.shape
    kh, kw = kernel_size
    sh, sw = stride
    ph, pw = padding
    Ho = unfold_output_size(H, kh, sh, ph)
    Wo = unfold_output_size(W, kw, sw, pw)

    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    # gather rows: for each (patch row, kernel row) -> source row
    row_idx = (jnp.arange(Ho)[:, None] * sh + jnp.arange(kh)[None, :]).reshape(-1)
    col_idx = (jnp.arange(Wo)[:, None] * sw + jnp.arange(kw)[None, :]).reshape(-1)
    g = xp[:, row_idx][:, :, col_idx]  # (B, Ho*kh, Wo*kw, C)
    g = g.reshape(B, Ho, kh, Wo, kw, C)
    g = g.transpose(0, 1, 3, 5, 2, 4)  # (B, Ho, Wo, C, kh, kw)
    return g.reshape(B, Ho * Wo, C * kh * kw)


@functools.lru_cache(maxsize=None)
def _fold_fn(output_size, kernel_size, stride, padding, C, B, dtype_name):
    """Cached transpose-of-unfold closure for a given static config."""
    H, W = output_size
    kh, kw = kernel_size
    Ho = unfold_output_size(H, kh, stride[0], padding[0])
    Wo = unfold_output_size(W, kw, stride[1], padding[1])
    dtype = jnp.dtype(dtype_name)

    def _unfold(x):
        return unfold(x, kernel_size, stride, padding)

    x_spec = jax.ShapeDtypeStruct((B, H, W, C), dtype)
    transpose = jax.linear_transpose(_unfold, x_spec)

    def _fold(y):
        (out,) = transpose(y)
        return out

    return _fold, (Ho, Wo)


def fold(
    y: jnp.ndarray,
    output_size: tuple[int, int],
    kernel_size: tuple[int, int],
    stride: tuple[int, int],
    padding: tuple[int, int],
) -> jnp.ndarray:
    """Combine sliding local patches by summation (torch F.fold semantics).

    Args:
      y: (B, L, C*kh*kw) in torch channel ordering.
    Returns:
      (B, H, W, C) with overlapping patch contributions summed.
    """
    B, L, CK = y.shape
    kh, kw = kernel_size
    C = CK // (kh * kw)
    fold_impl, _ = _fold_fn(
        tuple(output_size), tuple(kernel_size), tuple(stride), tuple(padding),
        C, B, jnp.result_type(y).name,
    )
    return fold_impl(y)
