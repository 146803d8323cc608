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
import numpy as np


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


def _renorm_matrix_1d(out_len: int, n_patches: int, kernel: int,
                      stride: int, padding: int) -> np.ndarray:
    """1-D operator M[(H,i),(P,p)] for `unfold(fold(x)/fold(ones))` along one
    spatial dim: input tap (patch H, tap i) contributes to output tap
    (patch P, tap p) iff both land on the same real (non-padding) pixel,
    scaled by 1/(#taps covering that pixel)."""
    pix = (np.arange(n_patches)[:, None] * stride
           + np.arange(kernel)[None, :]).reshape(-1)  # padded coords
    real = (pix >= padding) & (pix < padding + out_len)
    cnt = np.bincount(pix[real], minlength=pix.max() + 1)
    M = (pix[:, None] == pix[None, :]).astype(np.float32)
    M *= (real[:, None] & real[None, :])
    M /= np.maximum(cnt[pix], 1)[None, :]
    return M.reshape(n_patches, kernel, n_patches, kernel)


def _fold_matrix_1d(out_len: int, n_patches: int, kernel: int, stride: int,
                    padding: int) -> np.ndarray:
    """1-D fold operator F[(P,p), r]: tap (patch P, tap p) sums into real
    pixel r (padding taps dropped)."""
    pix = (np.arange(n_patches)[:, None] * stride
           + np.arange(kernel)[None, :]) - padding  # real coords
    F = np.zeros((n_patches, kernel, out_len), np.float32)
    P, p = np.nonzero((pix >= 0) & (pix < out_len))
    F[P, p, pix[P, p]] = 1.0
    return F


def overlap_renorm(
    y: jnp.ndarray,
    output_size: tuple[int, int],
    kernel_size: tuple[int, int],
    stride: tuple[int, int],
    padding: tuple[int, int],
) -> jnp.ndarray:
    """`unfold(fold(y) / fold(ones))` as two small dense matmuls.

    The fold -> divide-by-coverage -> unfold chain (the reference's
    FusionFeedForward renormalization, sparse_transformer.py:85-95) is a
    LINEAR operator, separable per spatial dim because the coverage count
    factorizes: cnt2d(y, x) = cnt_rows(y) * cnt_cols(x). Two (n_patches*k)^2
    matmuls replace the scatter-add + gather round-trip (measured ~5x faster
    on v5e — fold/unfold at 1960 channels is HBM-bound).

    Args:
      y: (B, L, C*kh*kw), torch unfold channel ordering.
    Returns:
      same shape/ordering, bit-equal to unfold(fold(y)/fold(ones)) up to fp
      reassociation.
    """
    B, L, CK = y.shape
    kh, kw = kernel_size
    C = CK // (kh * kw)
    Ho = unfold_output_size(output_size[0], kh, stride[0], padding[0])
    Wo = unfold_output_size(output_size[1], kw, stride[1], padding[1])
    assert L == Ho * Wo
    Mr = jnp.asarray(_renorm_matrix_1d(
        output_size[0], Ho, kh, stride[0], padding[0]), y.dtype)
    Mc = jnp.asarray(_renorm_matrix_1d(
        output_size[1], Wo, kw, stride[1], padding[1]), y.dtype)
    x6 = y.reshape(B, Ho, Wo, C, kh, kw)
    x6 = jnp.einsum("bHWcij,HiPp->bPWcpj", x6, Mr,
                    preferred_element_type=jnp.float32).astype(y.dtype)
    x6 = jnp.einsum("bPWcpj,WjQq->bPQcpq", x6, Mc,
                    preferred_element_type=jnp.float32).astype(y.dtype)
    return x6.reshape(B, L, CK)


def fold_matmul(
    y: jnp.ndarray,
    output_size: tuple[int, int],
    kernel_size: tuple[int, int],
    stride: tuple[int, int],
    padding: tuple[int, int],
) -> jnp.ndarray:
    """`fold` as two small dense matmuls (row-combine then col-combine) —
    replaces the scatter-add adjoint on the MXU. Identical output."""
    B, L, CK = y.shape
    H, W = output_size
    kh, kw = kernel_size
    C = CK // (kh * kw)
    Ho = unfold_output_size(H, kh, stride[0], padding[0])
    Wo = unfold_output_size(W, kw, stride[1], padding[1])
    assert L == Ho * Wo
    Fr = jnp.asarray(_fold_matrix_1d(H, Ho, kh, stride[0], padding[0]),
                     y.dtype)
    Fc = jnp.asarray(_fold_matrix_1d(W, Wo, kw, stride[1], padding[1]),
                     y.dtype)
    x6 = y.reshape(B, Ho, Wo, C, kh, kw)
    t = jnp.einsum("bHWcij,HiR->bRWcj", x6, Fr,
                   preferred_element_type=jnp.float32).astype(y.dtype)
    return jnp.einsum("bRWcj,WjS->bRSc", t, Fc,
                      preferred_element_type=jnp.float32).astype(y.dtype)


def _unfold_conv_kernel(kernel_size, C, dtype):
    """Depthwise one-hot kernel: conv(x, K, groups=C) == unfold(x)."""
    kh, kw = kernel_size
    block = np.zeros((kh, kw, 1, kh * kw), np.float32)
    for i in range(kh):
        for j in range(kw):
            block[i, j, 0, i * kw + j] = 1.0
    return jnp.asarray(np.tile(block, (1, 1, 1, C)), dtype)


def _fold_conv_kernel(kernel_size, C, dtype):
    """Spatially-flipped depthwise one-hot kernel for the fold adjoint."""
    kh, kw = kernel_size
    k = np.zeros((kh, kw, kh * kw, 1), np.float32)
    for i in range(kh):
        for j in range(kw):
            k[i, j, (kh - 1 - i) * kw + (kw - 1 - j), 0] = 1.0
    return jnp.asarray(np.tile(k, (1, 1, 1, C)), dtype)


def unfold_conv(x, kernel_size, stride, padding):
    """`unfold` as a depthwise one-hot convolution (MXU path — avoids the
    strided gather, which is slow on TPU). Identical output/order."""
    B, H, W, C = x.shape
    kh, kw = kernel_size
    Ho = unfold_output_size(H, kh, stride[0], padding[0])
    Wo = unfold_output_size(W, kw, stride[1], padding[1])
    rhs = _unfold_conv_kernel(kernel_size, C, x.dtype)
    out = jax.lax.conv_general_dilated(
        x, rhs, stride, [(padding[0], padding[0]), (padding[1], padding[1])],
        feature_group_count=C,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out.reshape(B, Ho * Wo, C * kh * kw)


def fold_conv(y, output_size, kernel_size, stride, padding):
    """`fold` as a depthwise transposed convolution (lhs-dilated one-hot
    conv — replaces the scatter-add adjoint with an MXU op). Identical
    output."""
    B, L, CK = y.shape
    H, W = output_size
    kh, kw = kernel_size
    sh, sw = stride
    ph, pw = padding
    C = CK // (kh * kw)
    Ho = unfold_output_size(H, kh, sh, ph)
    Wo = unfold_output_size(W, kw, sw, pw)
    assert L == Ho * Wo

    img = y.reshape(B, Ho, Wo, CK)
    rhs = _fold_conv_kernel(kernel_size, C, y.dtype)
    t = jax.lax.conv_general_dilated(
        img, rhs, (1, 1), [(kh - 1, kh - 1), (kw - 1, kw - 1)],
        lhs_dilation=(sh, sw), feature_group_count=C,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # t covers the span (Ho-1)*s + k of the padded output; the padded output
    # is H + 2p rows — zero-extend the uncovered tail, then crop the padding
    Hp, Wp = H + 2 * ph, W + 2 * pw
    t = jnp.pad(t, ((0, 0), (0, Hp - t.shape[1]), (0, Wp - t.shape[2]),
                    (0, 0)))
    return t[:, ph : ph + H, pw : pw + W]


def coverage_count(output_size, kernel_size, stride, padding) -> np.ndarray:
    """`fold(unfold(ones))` per-pixel tap coverage counts, shape (H, W, 1).

    Separable: cnt2d(y, x) = cnt_rows(y) * cnt_cols(x). Padding taps are
    excluded (fold drops them), matching torch fold's divisor tensor."""

    def cnt1d(length, k, s, p):
        n = unfold_output_size(length, k, s, p)
        pix = (np.arange(n)[:, None] * s
               + np.arange(k)[None, :]).reshape(-1) - p
        ok = (pix >= 0) & (pix < length)
        return np.bincount(pix[ok], minlength=length).astype(np.float32)

    ch = cnt1d(output_size[0], kernel_size[0], stride[0], padding[0])
    cw = cnt1d(output_size[1], kernel_size[1], stride[1], padding[1])
    return (ch[:, None] * cw[None, :])[..., None]


def fold_dense_conv(x, kernel, bias, output_size, kernel_size, stride,
                    padding, accum_dtype=jnp.float32, impl="dilated"):
    """`fold(x @ kernel + bias)` — a Dense producing C*kh*kw tap channels
    followed by fold — as ONE lhs-dilated (transposed) convolution.

    Never materializes the (B, L, C*kh*kw) tap tensor (168 MB for SoftComp at
    inference shapes); the MXU contracts straight from token features to
    pixels. This is the transpose of the im2col identity used by _PatchEmbed.

    impl:
      'dilated' — one lhs-dilated conv (the default; fastest measured).
      'phase'   — explicit phase decomposition as ONE stride-1 conv with
        s*s*C output channels + a depth-to-space. Does (s*ceil(k/s)/k)^2
        the im2col FLOPs (1.65x at k=7, s=3) at full lane width — but
        measured SLOWER than 'dilated' on v5e at both hot shapes
        (2.34 vs 2.26 ms at FusionFFN fc1, 3.25 vs 2.28 at SoftComp;
        tools/ffn_fold_ab.py, PERF.md). Kept as a documented negative
        result / CPU-parity-covered alternative lowering.

    Args:
      x: (B, Ho, Wo, Cin) token grid.
      kernel: (Cin, C*kh*kw), Dense layout; column order is torch unfold's
        c*(kh*kw) + i*kw + j (reference modules/sparse_transformer.py fold).
      bias: (C*kh*kw,) per-tap bias folded into the output, or None.
    Returns:
      (B, H, W, C) in accum_dtype.
    """
    if impl == "phase":
        return _fold_dense_conv_phase(x, kernel, bias, output_size,
                                      kernel_size, stride, padding,
                                      accum_dtype)
    B, Ho, Wo, Cin = x.shape
    H, W = output_size
    kh, kw = kernel_size
    sh, sw = stride
    ph, pw = padding
    C = kernel.shape[1] // (kh * kw)
    # correlation kernel: K[i', j', cin, c] = kernel[cin, c, kh-1-i', kw-1-j']
    k4 = kernel.reshape(Cin, C, kh, kw)[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)
    t = jax.lax.conv_general_dilated(
        x, k4.astype(x.dtype), (1, 1), [(kh - 1, kh - 1), (kw - 1, kw - 1)],
        lhs_dilation=(sh, sw),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=accum_dtype)
    Hp, Wp = H + 2 * ph, W + 2 * pw
    t = jnp.pad(t, ((0, 0), (0, Hp - t.shape[1]), (0, Wp - t.shape[2]),
                    (0, 0)))
    t = t[:, ph : ph + H, pw : pw + W]
    if bias is not None:
        ones = jnp.ones((1, Ho, Wo, 1), x.dtype)
        t = t + fold_dense_conv(ones, bias[None, :], None, output_size,
                                kernel_size, stride, padding, accum_dtype)
    return t


def _fold_dense_conv_phase(x, kernel, bias, output_size, kernel_size,
                           stride, padding, accum_dtype=jnp.float32):
    """Phase-decomposed `fold_dense_conv` (see its docstring).

    The transposed conv's output pixel p = s*U + a (phase a in [0, s))
    reads token U - d at tap i = s*d + a, d in [0, ceil(k/s)) — so ALL
    phases together are ONE stride-1 (D, D) conv over the token grid with
    s*s*C output channels (taps with s*d + a >= k are zero), followed by a
    depth-to-space interleave. Output matches the dilated path bit-for-bit
    up to fp tap-summation order.
    """
    B, Ho, Wo, Cin = x.shape
    H, W = output_size
    kh, kw = kernel_size
    sh, sw = stride
    ph, pw = padding
    C = kernel.shape[1] // (kh * kw)
    Dh = -(-kh // sh)
    Dw = -(-kw // sw)

    # phase kernel: Kp[d', e', cin, ((a*sw + b)*C + c)]
    #   = kernel[cin, c*kh*kw + i*kw + j] at i = sh*(Dh-1-d') + a,
    #     j = sw*(Dw-1-e') + b (zero where i >= kh or j >= kw).
    k4 = kernel.reshape(Cin, C, kh, kw)
    k4 = jnp.pad(k4, ((0, 0), (0, 0), (0, sh * Dh - kh), (0, sw * Dw - kw)))
    # (Cin, C, Dh, sh, Dw, sw): tap (d, a, e, b)
    k6 = k4.reshape(Cin, C, Dh, sh, Dw, sw)
    # -> (d', e', cin, a, b, c) with d' = Dh-1-d (conv correlation order)
    k6 = k6[:, :, ::-1, :, ::-1, :].transpose(2, 4, 0, 3, 5, 1)
    kp = k6.reshape(Dh, Dw, Cin, sh * sw * C)

    xp = jnp.pad(x, ((0, 0), (Dh - 1, Dh - 1), (Dw - 1, Dw - 1), (0, 0)))
    t = jax.lax.conv_general_dilated(
        xp, kp.astype(x.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=accum_dtype)
    U, V = t.shape[1], t.shape[2]  # Ho + Dh - 1, Wo + Dw - 1
    # depth-to-space: t[B, U, V, (a, b, c)] -> rows s*U + a
    t = t.reshape(B, U, V, sh, sw, C).transpose(0, 1, 3, 2, 4, 5)
    t = t.reshape(B, U * sh, V * sw, C)
    # the dilated path's uncropped extent is (Ho-1)*s + k rows; ours is
    # s*(Ho + D - 1) >= that, extra rows are zero — crop the same window
    Hp, Wp = H + 2 * ph, W + 2 * pw
    t = jnp.pad(t, ((0, 0), (0, max(0, Hp - t.shape[1])),
                    (0, max(0, Wp - t.shape[2])), (0, 0)))
    t = t[:, ph: ph + H, pw: pw + W]
    if bias is not None:
        ones = jnp.ones((1, Ho, Wo, 1), x.dtype)
        t = t + fold_dense_conv(ones, bias[None, :], None, output_size,
                                kernel_size, stride, padding, accum_dtype)
    return t
