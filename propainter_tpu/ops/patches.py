"""Overlapping patch extraction/combination (torch unfold/fold semantics).

The reference uses `nn.Unfold`/`F.fold` for its soft-split / soft-comp
tokenizer (model/modules/sparse_transformer.py:7-61), for the
overlap-renormalized FusionFeedForward (same file :64-101), and for RAFT's
convex flow upsampling (RAFT/raft.py:73-84).

We implement unfold as two static gathers (rows then cols) and fold as its
explicit adjoint (two static scatter-adds) — torch's fold *is* the adjoint of
unfold, so this matches bit-for-bit (up to fp addition order). Measured
fastest on TPU among the alternatives tried (strided slice-adds regress 2x:
49 sequential full-buffer read-modify-writes defeat XLA fusion).

Channel ordering matches torch: the unfolded feature dim is
C-major, kernel-minor, i.e. index = c*(kh*kw) + i*kw + j.
"""

from __future__ import annotations

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


def fold(
    y: jnp.ndarray,
    output_size: tuple[int, int],
    kernel_size: tuple[int, int],
    stride: tuple[int, int],
    padding: tuple[int, int],
) -> jnp.ndarray:
    """Combine sliding local patches by summation (torch F.fold semantics).

    Implemented as the explicit adjoint of `unfold` (two static scatter-adds,
    the transpose of its two static gathers) — torch's fold *is* the adjoint
    of unfold, so this matches bit-for-bit up to fp addition order.

    Args:
      y: (B, L, C*kh*kw) in torch channel ordering.
    Returns:
      (B, H, W, C) with overlapping patch contributions summed.
    """
    B, L, CK = y.shape
    H, W = output_size
    kh, kw = kernel_size
    sh, sw = stride
    ph, pw = padding
    C = CK // (kh * kw)
    Ho = unfold_output_size(H, kh, sh, ph)
    Wo = unfold_output_size(W, kw, sw, pw)
    assert L == Ho * Wo, (L, Ho, Wo)

    g = y.reshape(B, Ho, Wo, C, kh, kw)
    g = g.transpose(0, 1, 4, 2, 5, 3)  # (B, Ho, kh, Wo, kw, C)
    g = g.reshape(B, Ho * kh, Wo * kw, C)

    row_idx = (jnp.arange(Ho)[:, None] * sh + jnp.arange(kh)[None, :]).reshape(-1)
    col_idx = (jnp.arange(Wo)[:, None] * sw + jnp.arange(kw)[None, :]).reshape(-1)
    tmp = jnp.zeros((B, Ho * kh, W + 2 * pw, C), y.dtype)
    tmp = tmp.at[:, :, col_idx].add(g)
    out = jnp.zeros((B, H + 2 * ph, W + 2 * pw, C), y.dtype)
    out = out.at[:, row_idx].add(tmp)
    return out[:, ph : ph + H, pw : pw + W]
