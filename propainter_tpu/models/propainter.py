"""ProPainter inpainting generator in JAX/flax (NHWC).

TPU-native re-design of reference model/propainter.py and
model/modules/sparse_transformer.py:

  * Encoder with group-conv fusion stages (reference :193-232);
  * non-learnable image propagation and learnable (deformable) feature
    propagation — Python frame loops in the reference (:104-190) — run as
    `lax.scan`s with (feat_prop, mask_prop) carries;
  * SoftSplit/SoftComp tokenizers via static unfold/fold (ops/patches.py);
  * SparseWindowAttention: the reference's data-dependent `nonzero`
    gather/scatter over occupied windows (sparse_transformer.py:230-269) is
    replaced by a static dual-branch computation — full spatio-temporal
    attention and window-local attention computed for *all* windows, selected
    per window by the (static-shape) occupancy mask. Identical numerics,
    MXU-friendly, jit-able; a Pallas kernel can later skip the dead branch.
  * temporal-stride selection (t_dilation) is an additive key mask, which is
    numerically identical to gathering the selected frames before softmax.

Module names mirror the torch tree for mechanical conversion of
ProPainter.pth (convert_inpaint_state_dict).
"""

from __future__ import annotations

import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from propainter_tpu.models.layers import (
    conv2d, leaky_relu, SplitGroupConv2d)
from propainter_tpu.ops.deform import (
    modulated_deform_conv2d_mxu,
    split_offset_mask_channels,
)
from propainter_tpu.ops.deform_pallas import modulated_deform_conv2d_opt2
from propainter_tpu.ops.interp import resize, max_pool2d
from propainter_tpu.ops.patches import (
    unfold_output_size, fold_dense_conv, coverage_count)
from propainter_tpu.ops.warp import (
    flow_warp, flow_warp_bilinear_nearest, flow_warp_packed,
    fb_consistency_check, fb_consistency_from_warped)


# ---------------------------------------------------------------------------
# Encoder / decoder
# ---------------------------------------------------------------------------


class Encoder(nn.Module):
    """Stride-4 encoder with group-conv fusion stages re-concatenating the
    stage-8 features group-wise. Reference model/propainter.py:193-232."""

    # group-conv lowering for the fusion stages (see SplitGroupConv2d.impl)
    group_conv_impl: str = "split"

    @nn.compact
    def __call__(self, x):
        specs = [
            (64, 2, 1),    # layers_0
            (64, 1, 1),    # layers_2
            (128, 2, 1),   # layers_4
            (256, 1, 1),   # layers_6
            (384, 1, 1),   # layers_8
            (512, 1, 2),   # layers_10
            (384, 1, 4),   # layers_12
            (256, 1, 8),   # layers_14
            (128, 1, 1),   # layers_16
        ]
        out = x
        x0 = None
        for n, (feat, stride, groups) in enumerate(specs):
            i = 2 * n  # torch Sequential index (conv at even slots)
            if i == 8:
                x0 = out
            if i > 8:
                cx = x0.shape[-1]
                co = out.shape[-1]
                g = groups
                # group i input = (x0 group slice | out group slice); the
                # grouped conv runs as per-group dense convs on these slices
                # (SplitGroupConv2d) so the reference's interleaved concat
                # tensor (model/propainter.py:341-349) is never materialized
                parts = [
                    jnp.concatenate(
                        [x0[..., j * (cx // g):(j + 1) * (cx // g)],
                         out[..., j * (co // g):(j + 1) * (co // g)]],
                        axis=-1)
                    for j in range(g)
                ]
                out = SplitGroupConv2d(
                    feat, impl=self.group_conv_impl,
                    name=f"layers_{i}")(parts)
            else:
                out = conv2d(feat, 3, stride, 1, name=f"layers_{i}")(out)
            out = leaky_relu(out, 0.2)
        return out


class _Deconv(nn.Module):
    """2x bilinear (align_corners=True) upsample + 3x3 conv.
    Reference model/propainter.py:235-253."""

    features: int

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        # matmul-form upsample: 0.6-0.7x the gather form at decoder shapes
        # (tools/resize_ab.py)
        x = resize(x, (2 * H, 2 * W), "bilinear", align_corners=True,
                   impl="mxu")
        return conv2d(self.features, 3, 1, 1, name="conv")(x)


# ---------------------------------------------------------------------------
# Soft split / soft comp tokenizers
# ---------------------------------------------------------------------------

KERNEL = (7, 7)
STRIDE = (3, 3)
PADDING = (3, 3)


class _PatchEmbed(nn.Module):
    """Dense over unfolded patches, computed as ONE strided conv (the im2col
    identity) — skips materializing the (B*T, L, C*49) unfold buffer.
    Params keep the Dense layout ((C*kh*kw, hidden), (hidden,)) so converted
    checkpoints and existing param trees are unchanged."""

    hidden: int

    @nn.compact
    def __call__(self, x):
        BT, H, W, C = x.shape
        kh, kw = KERNEL
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (C * kh * kw, self.hidden))
        bias = self.param("bias", nn.initializers.zeros, (self.hidden,))
        # unfold channel order is c-major tap-minor: row index = c*49+i*7+j
        w = kernel.reshape(C, kh, kw, self.hidden).transpose(1, 2, 0, 3)
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), STRIDE,
            [(PADDING[0], PADDING[0]), (PADDING[1], PADDING[1])],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias.astype(x.dtype)


class SoftSplit(nn.Module):
    """Overlapping-patch tokenizer. Reference sparse_transformer.py:7-31."""

    hidden: int = 512

    @nn.compact
    def __call__(self, x, b, output_size):
        f_h = unfold_output_size(output_size[0], KERNEL[0], STRIDE[0], PADDING[0])
        f_w = unfold_output_size(output_size[1], KERNEL[1], STRIDE[1], PADDING[1])
        feat = _PatchEmbed(self.hidden, name="embedding")(x)
        return feat.reshape(b, -1, f_h, f_w, self.hidden)


class _DenseParams(nn.Module):
    """Declares nn.Dense-layout params (kernel (in, out), bias (out,))
    without applying them — for layers whose Dense is algebraically fused
    into a convolution while the param tree stays checkpoint-compatible."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class SoftComp(nn.Module):
    """Inverse tokenizer: linear -> fold -> 3x3 bias conv.
    Reference sparse_transformer.py:34-61.

    The linear + fold pair is ONE lhs-dilated (transposed) convolution
    (adjoint of the im2col identity) — the (B, L, C*49) tap tensor (168 MB
    at inference shapes) is never materialized."""

    channel: int = 128

    @nn.compact
    def __call__(self, x, t, output_size):
        b = x.shape[0]
        c_in = x.shape[-1]
        fh = unfold_output_size(output_size[0], KERNEL[0], STRIDE[0],
                                PADDING[0])
        fw = unfold_output_size(output_size[1], KERNEL[1], STRIDE[1],
                                PADDING[1])
        c_out = KERNEL[0] * KERNEL[1] * self.channel
        w, bias = _DenseParams(c_in, c_out, name="embedding")()
        # accum_dtype=x.dtype: the MXU still accumulates fp32 internally;
        # this only stores the conv output in the pipeline dtype (the fp32
        # intermediate was 63 MB/window of pure HBM traffic in bf16 runs).
        feat = fold_dense_conv(
            x.reshape(b * t, fh, fw, c_in), w.astype(x.dtype),
            bias.astype(x.dtype), output_size, KERNEL, STRIDE,
            PADDING, accum_dtype=x.dtype)
        return conv2d(self.channel, 3, 1, 1, name="bias_conv")(feat)


# ---------------------------------------------------------------------------
# Transformer
# ---------------------------------------------------------------------------


class FusionFeedForward(nn.Module):
    """MLP with fold/unfold overlap renormalization between fc1 and fc2.
    Reference sparse_transformer.py:64-101."""

    dim: int = 512
    hidden_dim: int = 1960

    @nn.compact
    def __call__(self, x, output_size):
        # The whole fc1 -> fold -> /coverage -> unfold -> gelu -> fc2 chain
        # runs in PIXEL space: fold(fc1(x)) is ONE transposed conv, and since
        # unfold is a pure gather, gelu∘unfold == unfold∘gelu, so
        # fc2(unfold(z)) is ONE strided conv (the im2col identity). The
        # (n, hidden) tap tensor (54 MB at inference shapes) is never
        # materialized; the nonlinearity runs on the 8x smaller pixel tensor.
        H, W = output_size
        fh = unfold_output_size(H, KERNEL[0], STRIDE[0], PADDING[0])
        fw = unfold_output_size(W, KERNEL[1], STRIDE[1], PADDING[1])
        b, n, c = x.shape
        w1, b1 = _DenseParams(c, self.hidden_dim, name="fc1_0")()
        # accum_dtype=x.dtype stores fc1's folded output in the pipeline
        # dtype (MXU accumulation stays fp32 internally); the coverage
        # division + gelu then run at half the HBM traffic in bf16 runs.
        z = fold_dense_conv(
            x.reshape(-1, fh, fw, c), w1.astype(x.dtype), b1.astype(x.dtype),
            (H, W), KERNEL, STRIDE, PADDING, accum_dtype=x.dtype)
        cov = jnp.asarray(
            coverage_count((H, W), KERNEL, STRIDE, PADDING), z.dtype)
        z = jax.nn.gelu(z / cov, approximate=False).astype(x.dtype)
        y = _PatchEmbed(self.dim, name="fc2_1")(z)
        return y.reshape(b, n, self.dim)


def _valid_rolled_indices(window: tuple[int, int], expand: tuple[int, int]):
    """Static indices of rolled-window tokens outside the centre window.
    Reference sparse_transformer.py:142-153."""
    wh, ww = window
    eh, ew = expand
    ms = []
    for rows, cols in (
        (slice(None, -eh), slice(None, -ew)),  # tl
        (slice(None, -eh), slice(ew, None)),   # tr
        (slice(eh, None), slice(None, -ew)),   # bl
        (slice(eh, None), slice(ew, None)),    # br
    ):
        m = np.ones(window, np.bool_)
        m[rows, cols] = False
        ms.append(m)
    flat = np.stack(ms, 0).reshape(-1)
    return np.nonzero(flat)[0]


def _window_gather_indices(nwh, nww, window, expand, valid_idx):
    """Static flat-grid indices (nW, win + n_valid_rolled): each window's
    center tokens followed by its 4 rolled (wrap, like jnp.roll) copies'
    valid-band tokens. One gather with these indices replaces 5 window
    partitions + concat + band select (tiny-extent strided transposes are
    slow on TPU; one big-row gather is not)."""
    wh, ww = window
    H, W = nwh * wh, nww * ww
    eh, ew = expand
    shifts = [(-eh, -ew), (-eh, ew), (eh, -ew), (eh, ew)]
    a = np.arange(wh)[:, None]
    b = np.arange(ww)[None, :]
    idx = []
    for wi in range(nwh):
        for wj in range(nww):
            center = ((wi * wh + a) * W + (wj * ww + b)).reshape(-1)
            rolled = []
            for sy, sx in shifts:
                ry = (wi * wh + a - sy) % H
                rx = (wj * ww + b - sx) % W
                rolled.append((ry * W + rx).reshape(-1))
            rolled = np.concatenate(rolled)[valid_idx]
            idx.append(np.concatenate([center, rolled]))
    return np.asarray(idx, np.int32)


def _window_partition(x, window, n_head):
    """(B, T, H, W, C) -> (B, nW, n_head, T, wh*ww, C/n_head).
    Reference sparse_transformer.py:104-115 (head-major channel split)."""
    B, T, H, W, C = x.shape
    wh, ww = window
    nh, nw = H // wh, W // ww
    ch = C // n_head
    x = x.reshape(B, T, nh, wh, nw, ww, n_head, ch)
    x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)  # (B, nh, nw, head, T, wh, ww, ch)
    return x.reshape(B, nh * nw, n_head, T, wh * ww, ch)


def masked_window_bitmap(masks_in_local, window_size=(5, 9)):
    """Which attention windows contain any hole token: (B, nW) bool.

    EXACTLY the occupancy SparseWindowAttention derives internally — the
    same nearest-resize to the encoder grid (two stride-2 convs: ceil/2
    twice), the same soft-split max-pool (KERNEL/STRIDE/PADDING), the same
    window partition — so `bitmap[b, w] == (occ[b, w] > 0)` bit-for-bit.
    The pipeline runs this once per window group and feeds the resulting
    index buckets back as `masked_windows`, shrinking branch-A attention to
    the windows that actually need it (reference sparse_transformer.py's
    data-dependent mask_tokens gather, :229-266, in static-shape form).

    masks_in_local: (B, l_t, H, W, 1) 0/1 dilated masks at image resolution.
    """
    B, l_t, H, W, _ = masks_in_local.shape
    # encoder grid: two stride-2 k3 p1 convs, each out = ceil(in/2)
    ceil2 = lambda n: -(-n // 2)
    h, w = ceil2(ceil2(H)), ceil2(ceil2(W))
    ds = resize(masks_in_local.reshape(-1, H, W, 1), (h, w), "nearest")
    mp = max_pool2d(ds, KERNEL, STRIDE, PADDING)   # (B*l_t, ht, wt, 1)
    ht, wt = mp.shape[1:3]
    wh, ww = window_size
    nwh, nww = -(-ht // wh), -(-wt // ww)
    pad_b, pad_r = nwh * wh - ht, nww * ww - wt
    if pad_b or pad_r:
        mp = jnp.pad(mp, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    occ = max_pool2d(mp, window_size, window_size, (0, 0))
    occ = occ.reshape(B, l_t, nwh * nww)
    return jnp.max(occ, axis=1) > 0


class SparseWindowAttention(nn.Module):
    """Mask-guided sparse window attention, static-shape formulation.
    Reference sparse_transformer.py:117-281.

    attention_impl:
      'xla'    — dense dual-branch (both paths for all windows, select by
                 occupancy); differentiable, used in training.
      'pallas' — fused TPU kernel (ops/attention.py): one grid program per
                 (head, window), clean windows skip the full branch,
                 streaming softmax. Inference only (no custom VJP yet).
    """

    dim: int = 512
    n_head: int = 4
    window_size: tuple[int, int] = (5, 9)
    pool_size: tuple[int, int] = (4, 4)
    attention_impl: str = "xla"

    @nn.compact
    def __call__(self, x, mask, frame_select, masked_windows=None,
                 q_frames: int | None = None):
        """
        Args:
          x:    (B, T, H, W, C) tokens.
          mask: (B, l_t, H, W, 1) pooled local-frame masks (1 = hole).
          q_frames: compute attention for only the first q_frames frames'
            QUERIES (keys/values still come from all frames) — the output is
            (B, q_frames, H, W, C). Exact: each query row's softmax is
            independent, so dropping rows cannot change the kept ones. The
            generator uses this on the LAST block at inference, where the
            reference-frame token updates are discarded (eval decodes
            [:l_t] — reference model/propainter.py:365-369).
          frame_select: frames visible to masked-window attention — either a
            (T,) / (B, T) bool array, or a tuple
            (static_sel: np.ndarray (T,), dynamic_valid: array (B?,T) | None)
            where the static part (the reference's T_ind temporal dilation)
            is GATHERED (fewer keys, like sparse_transformer.py:241-248) and
            the dynamic part (padded refs) is masked.
          masked_windows: optional (idx (B, m_b) int32, valid (B, m_b) bool)
            — a host/device-precomputed superset bucket of the occ>0
            windows (masked_window_bitmap). Branch A (the expensive
            cross-frame attention, ~85% of block FLOPs dense) then runs on
            ONLY those m_b windows and is scattered over the branch-B
            output: FLOPs scale with the mask instead of the frame, and the
            result is bit-identical to the dense dual-branch (same math per
            window, clean windows take branch B either way). The reference
            gets the same effect with data-dependent shapes
            (sparse_transformer.py:229-266); bucketing keeps shapes static
            for XLA. None = dense dual-branch (training, full-frame masks).
        """
        B, T, H, W, C = x.shape
        if isinstance(frame_select, tuple):
            static_sel, dyn_valid = frame_select
            # a remat'd caller passes the selection as a hashable tuple
            static_sel = np.asarray(static_sel, np.bool_)
        else:
            static_sel = np.ones(T, np.bool_)
            dyn_valid = frame_select
        wh, ww = self.window_size
        n_head = self.n_head
        ch = C // n_head
        nwh = math.ceil(H / wh)
        nww = math.ceil(W / ww)
        new_h, new_w = nwh * wh, nww * ww
        pad_b, pad_r = new_h - H, new_w - W
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad_b), (0, pad_r), (0, 0)))
            mask = jnp.pad(
                mask, ((0, 0), (0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        nW = nwh * nww
        win_tokens = wh * ww
        Tq = T if q_frames is None else q_frames
        if q_frames is not None:
            assert self.attention_impl != "pallas", (
                "q_frames shrink not wired for the opt-in pallas kernel")

        # q/k/v projections with checkpoint-compatible params but applied as
        # ONE merged matmul where the inputs coincide: x is ~100 MB at
        # inference shapes and HBM reads dominate — merging reads it once
        # instead of three times. Bitwise-identical to separate Denses (each
        # output column's dot product is unchanged).
        qk_k, qk_b = _DenseParams(C, C, name="query")()
        kk_k, kk_b = _DenseParams(C, C, name="key")()
        vk_k, vk_b = _DenseParams(C, C, name="value")()
        xp, qk_k, kk_k, vk_k, qk_b, kk_b, vk_b = nn.dtypes.promote_dtype(
            x, qk_k, kk_k, vk_k, qk_b, kk_b, vk_b, dtype=None)
        kv_kernel = jnp.concatenate([kk_k, vk_k], axis=1)
        kv_bias = jnp.concatenate([kk_b, vk_b])
        if Tq == T:
            qkv = xp @ jnp.concatenate([qk_k, kv_kernel], axis=1) + (
                jnp.concatenate([qk_b, kv_bias]))
            q, k, v = qkv[..., :C], qkv[..., C:2 * C], qkv[..., 2 * C:]
        else:
            q = xp[:, :Tq] @ qk_k + qk_b
            kv = xp @ kv_kernel + kv_bias
            k, v = kv[..., :C], kv[..., C:]

        # expanded (rolled) keys/values, masked to the newly-exposed band
        expand = ((wh + 1) // 2, (ww + 1) // 2)
        valid_idx = _valid_rolled_indices(self.window_size, expand)
        shifts = [(-expand[0], -expand[1]), (-expand[0], expand[1]),
                  (expand[0], -expand[1]), (expand[0], expand[1])]

        if self.attention_impl == "pallas":
            win_q = _window_partition(q, self.window_size, n_head)
            win_k = _window_partition(k, self.window_size, n_head)
            win_v = _window_partition(v, self.window_size, n_head)
            rolled_k = [
                _window_partition(jnp.roll(k, s, axis=(2, 3)),
                                  self.window_size, n_head) for s in shifts
            ]
            rolled_v = [
                _window_partition(jnp.roll(v, s, axis=(2, 3)),
                                  self.window_size, n_head) for s in shifts
            ]
        else:
            # window partition + 4 rolled copies + band select as ONE static
            # gather from the flat token grid (wrap-aware indices baked at
            # trace time) — replaces 11 strided transposes over tiny 5x9
            # extents with one big-row gather + one layout transpose
            idx_all = _window_gather_indices(
                nwh, nww, self.window_size, expand, valid_idx)  # (nW, 193)
            idx_q = idx_all[:, :win_tokens]

            def gather_windows(t, idx):
                """(B, T', H, W, C) -> (B, nW, head, T', n_idx, ch)."""
                tf = t.reshape(B, -1, new_h * new_w, C)
                g = tf[:, :, idx.reshape(-1)]
                g = g.reshape(B, tf.shape[1], idx.shape[0], idx.shape[1],
                              n_head, ch)
                return g.transpose(0, 2, 4, 1, 3, 5)

            win_q = gather_windows(q, idx_q)
            # branch-B keys/values are same-frame: only query frames needed
            win_k = gather_windows(k[:, :Tq], idx_q)
            win_v = gather_windows(v[:, :Tq], idx_q)
        # pooled global tokens (depthwise avg-like conv, learnable)
        ph, pw = self.pool_size
        pool_x = nn.Conv(C, kernel_size=(ph, pw), strides=(ph, pw),
                         padding="VALID", feature_group_count=C,
                         name="pool_layer")(x.reshape(B * T, new_h, new_w, C))
        p_h, p_w = pool_x.shape[1:3]
        pool_x = pool_x.reshape(B, T, p_h, p_w, C)
        pool_kv = pool_x.astype(kv_kernel.dtype) @ kv_kernel + kv_bias
        pool_k, pool_v = pool_kv[..., :C], pool_kv[..., C:]

        # ---- per-window occupancy (summed over local frames)
        l_t = mask.shape[1]
        mp = max_pool2d(
            mask.reshape(B * l_t, new_h, new_w, 1),
            self.window_size, self.window_size, (0, 0))
        occ = jnp.sum(mp.reshape(B, l_t, nW), axis=1)  # (B, nW)

        scale = 1.0 / math.sqrt(ch)
        # merged (B, T) mask — used by the pallas kernel path
        fs2d = jnp.broadcast_to(jnp.asarray(static_sel)[None], (B, T))
        if dyn_valid is not None:
            dv = dyn_valid if dyn_valid.ndim == 2 else dyn_valid[None]
            fs2d = fs2d & jnp.broadcast_to(dv, (B, T))

        if self.attention_impl == "pallas":
            from propainter_tpu.ops.attention import (
                sparse_window_attention_pallas)

            def bh(a):  # (B, nW, head, ...) -> (B*head, nW, ...)
                a = jnp.moveaxis(a, 2, 1)
                return a.reshape((B * n_head,) + a.shape[2:])

            roll_k4 = bh(jnp.stack(rolled_k, axis=3))  # (BH,nW,4,T,win,ch)
            roll_v4 = bh(jnp.stack(rolled_v, axis=3))
            roll_valid = np.zeros(4 * win_tokens, np.bool_)
            roll_valid[valid_idx] = True

            def pool_bh(p):
                p = p.reshape(B, T, p_h * p_w, n_head, ch)
                p = p.transpose(0, 3, 1, 2, 4)  # (B, head, T, P, ch)
                return p.reshape(B * n_head, T, p_h * p_w, ch)

            out = sparse_window_attention_pallas(
                bh(win_q), bh(win_k), bh(win_v), roll_k4, roll_v4,
                pool_bh(pool_k), pool_bh(pool_v), roll_valid, occ, fs2d,
                n_head)
            out = out.reshape(B, n_head, nW, T, win_tokens, ch)
            out = jnp.moveaxis(out, 1, 2)  # (B, nW, head, T, win, ch)
        else:
            # gather the statically-selected frames FIRST (the reference's
            # T_ind gather, sparse_transformer.py:241-248 — halves branch-A
            # work when t_dilation=2), then window+rolled-band keys via the
            # single static gather
            sel_idx = np.nonzero(static_sel)[0]
            Ts = len(sel_idx)

            if masked_windows is not None:
                mw_idx, mw_valid = masked_windows
                nWa = mw_idx.shape[1]  # branch-A window count (bucket)
            else:
                mw_idx = None
                nWa = nW

            def pool_windows(p, t_sel):
                p = p.reshape(B, T, p_h * p_w, n_head, ch)[:, t_sel]
                p = p.transpose(0, 3, 1, 2, 4)  # (B, head, Ts, P, ch)
                return jnp.broadcast_to(
                    p[:, None], (B, nWa, n_head, len(t_sel), p_h * p_w, ch))

            if mw_idx is None:
                win_q_a = win_q
                gather_a = lambda t: gather_windows(t, idx_all)
            else:
                # branch-A inputs for ONLY the bucketed windows: dynamic
                # row gather from the flat token grid (a few k rows — cheap)
                rows = jnp.asarray(idx_all)[mw_idx]     # (B, nWa, n_idx)
                win_q_a = jax.vmap(lambda a, i: a[i])(win_q, mw_idx)

                def gather_a(t):
                    tf = t.reshape(B, -1, new_h * new_w, C)
                    g = jax.vmap(lambda tb, rb: tb[:, rb.reshape(-1)])(
                        tf, rows)
                    g = g.reshape(B, tf.shape[1], nWa, idx_all.shape[1],
                                  n_head, ch)
                    return g.transpose(0, 2, 4, 1, 3, 5)

            win_k_all = jnp.concatenate(
                [gather_a(k[:, sel_idx]),
                 pool_windows(pool_k, sel_idx)], axis=4)
            win_v_all = jnp.concatenate(
                [gather_a(v[:, sel_idx]),
                 pool_windows(pool_v, sel_idx)], axis=4)
            k_tok = win_k_all.shape[4]

            # branch A: masked windows attend across all (selected) frames
            qa = win_q_a.reshape(B, nWa, n_head, Tq * win_tokens, ch)
            ka = win_k_all.reshape(B, nWa, n_head, Ts * k_tok, ch)
            va = win_v_all.reshape(B, nWa, n_head, Ts * k_tok, ch)
            key_mask = None
            if dyn_valid is not None:
                dv = (dyn_valid if dyn_valid.ndim == 2
                      else dyn_valid[None])  # (B?, T)
                dv = jnp.broadcast_to(dv, (B, T))[:, sel_idx]
                key_mask = jnp.repeat(dv, k_tok, axis=-1)  # (B, Ts*Ktok)

            # logits dtype for the dense einsum paths: fp32 in the fp32
            # pipeline; in bf16 mode keep the (huge) logit tensors bf16 —
            # the reference's fp16 mode also runs attention in half
            # precision, and the MXU accumulates in fp32 either way.
            ldt = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32

            if self.attention_impl == "flash":
                # fused VMEM-resident softmax: the (Tq, Tk) logits tensor
                # (~260 MB/block at inference shapes) never hits HBM, and
                # the softmax runs in fp32. Inference-only (no VJP).
                from propainter_tpu.ops.flash_attention import (
                    flash_window_attention)

                bias = (None if key_mask is None else
                        jnp.where(key_mask, 0.0, -1e9).astype(jnp.float32))
                qg = qa.reshape(B, nWa * n_head, Tq * win_tokens, ch)
                kg = ka.reshape(B, nWa * n_head, Ts * k_tok, ch)
                vg = va.reshape(B, nWa * n_head, Ts * k_tok, ch)
                out_a = flash_window_attention(qg, kg, vg, bias, scale)
                out_a = out_a.reshape(B, nWa, n_head, Tq, win_tokens, ch)
            else:
                att_a = jnp.einsum(
                    "bwhqc,bwhkc->bwhqk", qa, ka,
                    preferred_element_type=ldt) * scale
                if key_mask is not None:
                    att_a = jnp.where(key_mask[:, None, None, None, :],
                                      att_a, jnp.asarray(-1e9, ldt))
                att_a = jax.nn.softmax(att_a, axis=-1).astype(x.dtype)
                out_a = jnp.einsum(
                    "bwhqk,bwhkc->bwhqc", att_a, va,
                    preferred_element_type=jnp.float32).astype(x.dtype)
                out_a = out_a.reshape(B, nWa, n_head, Tq, win_tokens, ch)

            # branch B: clean windows attend within-window, same-frame
            att_b = jnp.einsum(
                "bwhtqc,bwhtkc->bwhtqk", win_q, win_k,
                preferred_element_type=ldt) * scale
            att_b = jax.nn.softmax(att_b, axis=-1).astype(x.dtype)
            out_b = jnp.einsum(
                "bwhtqk,bwhtkc->bwhtqc", att_b, win_v,
                preferred_element_type=jnp.float32).astype(x.dtype)

            if mw_idx is None:
                use_full = (occ > 0)[:, :, None, None, None, None]
                out = jnp.where(use_full, out_a, out_b)
            else:
                # scatter the bucketed branch-A windows over the branch-B
                # grid; invalid (pad) slots re-write the current value, so
                # duplicates and empty buckets are harmless
                cur = jax.vmap(lambda a, i: a[i])(out_b, mw_idx)
                sel = mw_valid[:, :, None, None, None, None]
                newv = jnp.where(sel, out_a, cur)
                bidx = jnp.arange(B)[:, None]
                out = out_b.at[bidx, mw_idx].set(newv)

        # inverse window partition
        out = out.reshape(B, nwh, nww, n_head, Tq, wh, ww, ch)
        out = out.transpose(0, 4, 1, 5, 2, 6, 3, 7)
        out = out.reshape(B, Tq, new_h, new_w, C)
        if pad_b or pad_r:
            out = out[:, :, :H, :W]
        return nn.Dense(C, name="proj")(out)


class TemporalSparseTransformer(nn.Module):
    """Pre-LN attention + FusionFFN block. Reference :284-314."""

    dim: int = 512
    n_head: int = 4
    window_size: tuple[int, int] = (5, 9)
    pool_size: tuple[int, int] = (4, 4)
    attention_impl: str = "xla"

    @nn.compact
    def __call__(self, x, fold_x_size, mask, frame_select,
                 masked_windows=None, out_frames: int | None = None):
        """out_frames: emit only the first out_frames frames (queries, MLP
        and residuals shrink with it; keys still span all frames) — exact
        for the kept frames. Used on the last block at inference."""
        B, T, H, W, C = x.shape
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        att = SparseWindowAttention(
            self.dim, self.n_head, self.window_size, self.pool_size,
            self.attention_impl, name="attention")(x, mask, frame_select,
                                                   masked_windows,
                                                   q_frames=out_frames)
        if out_frames is not None:
            shortcut = shortcut[:, :out_frames]
            T = out_frames
        x = shortcut + att
        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        mlp = FusionFeedForward(self.dim, name="mlp")(
            y.reshape(B, T * H * W, C), fold_x_size)
        return x + mlp.reshape(B, T, H, W, C)


class TemporalSparseTransformerBlock(nn.Module):
    """Stack of 8 blocks with alternating temporal dilation patterns.
    Reference :317-344."""

    dim: int = 512
    n_head: int = 4
    window_size: tuple[int, int] = (5, 9)
    pool_size: tuple[int, int] = (4, 4)
    depths: int = 8
    attention_impl: str = "xla"
    # rematerialize each block under differentiation (training): only the
    # block inputs are saved for backward instead of every attention/FFN
    # intermediate. Identity for inference; param tree unchanged.
    remat: bool = False

    @nn.compact
    def __call__(self, x, fold_x_size, l_mask, t_dilation: int = 2,
                 frame_valid=None, masked_windows=None,
                 out_frames: int | None = None):
        """out_frames: the LAST block emits only the first out_frames
        frames (its other rows feed nothing downstream at inference —
        SoftComp folds [:l_t] only). Exact for the kept frames."""
        assert self.depths % t_dilation == 0
        T = x.shape[1]
        block_cls = TemporalSparseTransformer
        if self.remat:
            # the training path passes no per-window dynamics, so the
            # remaining non-array args can be jax.checkpoint statics
            # (static_argnums counts self at 0)
            assert frame_valid is None and masked_windows is None, (
                "remat supports the training call shape only")
            block_cls = nn.remat(
                TemporalSparseTransformer, prevent_cse=False,
                static_argnums=(2, 4, 5, 6))
        for i in range(self.depths):
            # static temporal dilation pattern (reference gathers T_ind
            # frames, sparse_transformer.py:241-248); the dynamic
            # frame_valid mask (padded refs) rides along separately
            static_sel = np.zeros(T, np.bool_)
            static_sel[i % t_dilation :: t_dilation] = True
            sel = (tuple(map(bool, static_sel)) if self.remat
                   else static_sel)  # statics must be hashable under remat
            x = block_cls(
                self.dim, self.n_head, self.window_size, self.pool_size,
                self.attention_impl, name=f"transformer_{i}")(
                    x, fold_x_size, l_mask, (sel, frame_valid),
                    masked_windows,
                    (out_frames if i == self.depths - 1 else None))
        return x


# ---------------------------------------------------------------------------
# Propagation (image-level, non-learnable & feature-level, deformable)
# ---------------------------------------------------------------------------


def binary_mask(mask, th: float = 0.1):
    """Reference model/propainter.py:98-102."""
    return (mask > th).astype(mask.dtype)


def _propagation_inputs(flows_for_prop, flows_for_check, reverse: bool):
    """Per-step (flow_prop, flow_check) sequences with a zero flow at step 0.

    Backward pass processes frames t-1..0 using flows_forward[t-1-i];
    forward pass processes 0..t-1 using flows_backward[i-1]
    (reference model/propainter.py:125-147).
    """
    if reverse:
        fp = flows_for_prop[:, ::-1]
        fc = flows_for_check[:, ::-1]
    else:
        fp, fc = flows_for_prop, flows_for_check
    zero = jnp.zeros_like(fp[:, :1])
    fp = jnp.concatenate([zero, fp], axis=1)
    fc = jnp.concatenate([zero, fc], axis=1)
    return fp, fc


def image_propagation(x, flows_forward, flows_backward, mask,
                      interpolation="nearest", unroll: int = 1,
                      warp_impl: str = "packed"):
    """Non-learnable pixel propagation with fb-consistency gating.
    Reference model/propainter.py:104-190 (learnable=False branch).

    Args:
      x:     (B, T, H, W, 3) masked frames.
      flows_forward/backward: (B, T-1, H, W, 2).
      mask:  (B, T, H, W, 1) dilated masks (1 = hole).
      warp_impl: 'packed' (default) = ONE gather per step over
        channel-packed 2x2 neighborhoods (ops/warp.flow_warp_packed, 2.4x
        the 4-gather form at the bench shape — tools/imgprop_ab.py);
        'fused' = one 4-corner gather. Bit-identical on CPU; on TPU the
        recompiled bf16 coordinate math may flip the nearest-corner select
        where a coordinate sits within 1 ulp of the .5 boundary (~0.1% of
        pixels at the bench shape) — both corners are equally valid there.
    Returns:
      (prop_frames (B, T, H, W, 3), updated_masks (B, T, H, W, 1)).
    """
    B, T, H, W, C = x.shape

    def make_step():
        def step(carry, xs):
            i, feat_prop, mask_prop = carry
            feat_current, mask_current, flow_prop, flow_check = xs
            # all three warps share the same grid (flow_prop): ONE gather
            # serves both the bilinear channels (flow_check, mask_prop) and
            # the nearest-mode feature warp (the rounded sample is always
            # one of the bilinear corners — ops/warp, bit-identical)
            bundle = jnp.concatenate([flow_check, mask_prop], axis=-1)
            if interpolation == "bilinear":
                if warp_impl == "packed":
                    warped, _ = flow_warp_packed(
                        jnp.concatenate([bundle, feat_prop], axis=-1), None,
                        flow_prop)
                else:
                    warped = flow_warp(
                        jnp.concatenate([bundle, feat_prop], axis=-1),
                        flow_prop)
                feat_warped = warped[..., 3:]
            elif warp_impl == "packed":
                warped, feat_warped = flow_warp_packed(
                    bundle, feat_prop, flow_prop)
            else:
                warped, feat_warped = flow_warp_bilinear_nearest(
                    bundle, feat_prop, flow_prop)
            flow_valid = fb_consistency_from_warped(flow_prop,
                                                    warped[..., :2])
            mask_prop_valid = binary_mask(warped[..., 2:3])

            union = binary_mask(
                mask_current * flow_valid * (1 - mask_prop_valid))
            feat_new = union * feat_warped + (1 - union) * feat_current
            mask_new = binary_mask(
                mask_current * (1 - (flow_valid * (1 - mask_prop_valid))))

            feat_prop = jnp.where(i > 0, feat_new, feat_current)
            mask_prop = jnp.where(i > 0, mask_new, mask_current)
            return (i + 1, feat_prop, mask_prop), (feat_prop, mask_prop)

        return step

    xs_t = jnp.moveaxis(x, 1, 0)
    ms_t = jnp.moveaxis(mask, 1, 0)

    # backward pass
    fp, fc = _propagation_inputs(flows_forward, flows_backward, reverse=True)
    fp_t, fc_t = jnp.moveaxis(fp, 1, 0), jnp.moveaxis(fc, 1, 0)
    init = (jnp.int32(0), jnp.zeros_like(x[:, 0]), jnp.zeros_like(mask[:, 0]))
    _, (back_feats, back_masks) = jax.lax.scan(
        make_step(), init, (xs_t[::-1], ms_t[::-1], fp_t, fc_t),
        unroll=unroll)
    back_feats = back_feats[::-1]
    back_masks = back_masks[::-1]

    # forward pass consumes the backward results
    fp, fc = _propagation_inputs(flows_backward, flows_forward, reverse=False)
    fp_t, fc_t = jnp.moveaxis(fp, 1, 0), jnp.moveaxis(fc, 1, 0)
    _, (fwd_feats, fwd_masks) = jax.lax.scan(
        make_step(), init, (back_feats, back_masks, fp_t, fc_t),
        unroll=unroll)

    prop = jnp.moveaxis(fwd_feats, 0, 1)
    updated = jnp.moveaxis(fwd_masks, 0, 1)
    return prop, updated


class DeformableAlignment(nn.Module):
    """Flow-guided deformable alignment. Reference model/propainter.py:34-69."""

    channel: int = 128
    deform_groups: int = 16
    max_residue_magnitude: float = 3.0

    @nn.compact
    def __call__(self, x, cond, flow):
        c = self.channel
        dg = self.deform_groups
        o = leaky_relu(conv2d(c, 3, 1, 1, name="conv_offset_0")(cond), 0.1)
        o = leaky_relu(conv2d(c, 3, 1, 1, name="conv_offset_2")(o), 0.1)
        o = leaky_relu(conv2d(c, 3, 1, 1, name="conv_offset_4")(o), 0.1)
        raw = conv2d(27 * dg, 3, 1, 1, name="conv_offset_6")(o)
        offset, mask = split_offset_mask_channels(
            raw, dg, self.max_residue_magnitude, flow=flow)
        kernel = self.param("kernel", nn.initializers.he_normal(), (3, 3, c, c))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        # TPU: fully-fused pallas kernel (sampling + output contraction in
        # VMEM); CPU/backward: separable-matmul (MXU) formulation with
        # row_chunk=8 (measured best at this 60x108 feature size; the
        # adaptive large-chunk default regresses the generator ~15%)
        return modulated_deform_conv2d_opt2(x, offset, mask, kernel, bias, 8)


class _FeatPropStep(nn.Module):
    """One scanned step of learnable feature propagation."""

    channel: int = 128
    # 'packed' = channel-packed single-gather warp (see image_propagation)
    warp_impl: str = "packed"

    @nn.compact
    def __call__(self, carry, xs):
        i, feat_prop = carry
        feat_current, mask_current, flow_prop, flow_check = xs
        c = self.channel

        # fb-check warp + feature warp share the same grid: one gather
        bundle = jnp.concatenate([flow_check, feat_prop], axis=-1)
        if self.warp_impl == "packed":
            warped, _ = flow_warp_packed(bundle, None, flow_prop)
        else:
            warped = flow_warp(bundle, flow_prop)
        flow_valid = fb_consistency_from_warped(flow_prop, warped[..., :2])
        feat_warped = warped[..., 2:]
        cond = jnp.concatenate(
            [feat_current, feat_warped, flow_prop, flow_valid, mask_current],
            axis=-1)
        aligned = DeformableAlignment(c, name="deform_align")(
            feat_prop, cond, flow_prop)
        feat_prop = jnp.where(i > 0, aligned, feat_current)

        feat = jnp.concatenate([feat_current, feat_prop, mask_current], axis=-1)
        y = leaky_relu(conv2d(c, 3, 1, 1, name="backbone_0")(feat), 0.2)
        y = conv2d(c, 3, 1, 1, name="backbone_2")(y)
        feat_prop = feat_prop + y
        return (i + 1, feat_prop), feat_prop


class FeaturePropagation(nn.Module):
    """Learnable bidirectional feature propagation (channel=128).
    Reference model/propainter.py:72-190 (learnable=True branch)."""

    channel: int = 128
    # scan unroll factor (latency-bound per-step bodies; see PERF.md)
    unroll: int = 1
    warp_impl: str = "packed"
    # rematerialize scan steps under differentiation (the deform interp
    # matmuls' per-step temporaries otherwise get saved for backward —
    # see BidirectionalPropagation3D.remat). Identity for inference.
    remat: bool = False

    @nn.compact
    def __call__(self, x, flows_forward, flows_backward, mask):
        """x: (B, T, H, W, C); mask: (B, T, H, W, 2) (mask_in, mask_updated)."""
        B, T, H, W, C = x.shape
        c = self.channel

        def run(name, inputs, masks, fp, fc):
            scan = nn.scan(
                nn.remat(_FeatPropStep, prevent_cse=False)
                if self.remat else _FeatPropStep,
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=0, out_axes=0,
                unroll=self.unroll,
            )(c, self.warp_impl, name=name)
            init = (jnp.int32(0), jnp.zeros((B, H, W, c), x.dtype))
            _, out = scan(init, (inputs, masks,
                                 jnp.moveaxis(fp, 1, 0), jnp.moveaxis(fc, 1, 0)))
            return out

        xs_t = jnp.moveaxis(x, 1, 0)
        ms_t = jnp.moveaxis(mask, 1, 0)

        fp, fc = _propagation_inputs(flows_forward, flows_backward, True)
        back = run("backward_1", xs_t[::-1], ms_t[::-1], fp, fc)[::-1]

        fp, fc = _propagation_inputs(flows_backward, flows_forward, False)
        fwd = run("forward_1", back, ms_t, fp, fc)

        outputs_b = jnp.moveaxis(back, 0, 1).reshape(B * T, H, W, c)
        outputs_f = jnp.moveaxis(fwd, 0, 1).reshape(B * T, H, W, c)
        mask_in = mask.reshape(B * T, H, W, 2)

        fused_in = jnp.concatenate([outputs_b, outputs_f, mask_in], axis=-1)
        y = leaky_relu(conv2d(c, 3, 1, 1, name="fuse_0")(fused_in), 0.2)
        y = conv2d(c, 3, 1, 1, name="fuse_2")(y)
        out = y + x.reshape(B * T, H, W, c)
        return out.reshape(B, T, H, W, c)


# ---------------------------------------------------------------------------
# Generator
# ---------------------------------------------------------------------------


class InpaintGenerator(nn.Module):
    """Encoder -> feature propagation -> 8x sparse transformer -> decoder.
    Reference model/propainter.py:256-372."""

    channel: int = 128
    hidden: int = 512
    depths: int = 8
    num_heads: int = 4
    window_size: tuple[int, int] = (5, 9)
    pool_size: tuple[int, int] = (4, 4)
    # 'pallas' = fused sparse window attention kernel (inference on TPU)
    attention_impl: str = "xla"
    # unroll factor for the feature-propagation scan (pure scheduling knob)
    prop_unroll: int = 1
    # rematerialize featprop scan steps + each transformer block under
    # differentiation (training memory; identity at inference). Without it
    # the reference train config does not fit the v5e's 15.75 GB HBM.
    remat: bool = False

    @nn.compact
    def __call__(self, masked_frames, completed_flows, masks_in,
                 masks_updated, num_local_frames: int, train: bool = False,
                 t_dilation: int = 2, frame_valid=None,
                 precomputed_enc_feat=None, precomputed_ref_feat=None,
                 precomputed_ref_tokens=None, masked_windows=None):
        """
        Args:
          masked_frames: (B, T, H, W, 3) in [-1, 1] (holes already updated by
            image propagation).
          completed_flows: (flows_f, flows_b), each (B, l_t-1, H, W, 2).
          masks_in:      (B, T, H, W, 1) original dilated masks.
          masks_updated: (B, T, H, W, 1) masks after image propagation.
          num_local_frames: l_t (static).
          frame_valid: optional (T,) bool — False marks padded reference
            frames (used by the pipeline to keep window shapes static);
            padded frames get no attention keys, so results for valid frames
            are identical to running without padding.
        Returns:
          (B, l_t, H, W, 3) in [-1, 1] (train: (B, T, H, W, 3)).
        """
        l_t = num_local_frames
        B = masked_frames.shape[0]
        ori_h, ori_w = masked_frames.shape[2:4]

        if precomputed_enc_feat is not None:
            # the encoder is strictly per-frame: a caller may encode every
            # video frame ONCE and gather per window (sliding windows
            # otherwise re-encode each frame up to 4x, like the reference)
            enc_feat = precomputed_enc_feat
            _, T, h, w, c = enc_feat.shape
            local_feat = enc_feat[:, :l_t]
            ref_feat = enc_feat[:, l_t:]
        elif precomputed_ref_feat is not None:
            # eval-only: the GLOBAL reference frames repeat across sliding
            # windows — the pipeline encodes them once and passes their
            # features; frame/mask inputs then cover LOCAL frames only.
            # Local encoding stays in-graph (fusion with downstream stages;
            # hoisting it measured slower, PERF.md).
            assert not train
            assert masked_frames.shape[1] == l_t
            ref_feat = precomputed_ref_feat.astype(masked_frames.dtype)
            T = l_t + ref_feat.shape[1]
            enc_in = jnp.concatenate(
                [masked_frames, masks_in, masks_updated], axis=-1)
            local_enc = Encoder(name="encoder")(
                enc_in.reshape(B * l_t, ori_h, ori_w, 5))
            _, h, w, c = local_enc.shape
            local_feat = local_enc.reshape(B, l_t, h, w, c)
            enc_feat = None
        else:
            T = masked_frames.shape[1]
            enc_in = jnp.concatenate(
                [masked_frames, masks_in, masks_updated], axis=-1)
            enc_feat = Encoder(name="encoder")(
                enc_in.reshape(B * T, ori_h, ori_w, 5))
            _, h, w, c = enc_feat.shape
            enc_feat = enc_feat.reshape(B, T, h, w, c)
            local_feat = enc_feat[:, :l_t]
            ref_feat = enc_feat[:, l_t:]
        fold_feat_size = (h, w)

        flows_f, flows_b = completed_flows
        ds_flows_f = resize(
            flows_f.reshape(-1, ori_h, ori_w, 2), (h, w), "bilinear",
            align_corners=False).reshape(B, l_t - 1, h, w, 2) / 4.0
        ds_flows_b = resize(
            flows_b.reshape(-1, ori_h, ori_w, 2), (h, w), "bilinear",
            align_corners=False).reshape(B, l_t - 1, h, w, 2) / 4.0
        ds_mask_in = resize(
            masks_in.reshape(-1, ori_h, ori_w, 1), (h, w),
            "nearest").reshape(B, masks_in.shape[1], h, w, 1)
        ds_mask_in_local = ds_mask_in[:, :l_t]
        ds_mask_updated_local = resize(
            masks_updated[:, :l_t].reshape(-1, ori_h, ori_w, 1), (h, w),
            "nearest").reshape(B, l_t, h, w, 1)

        if train:
            pool_src = ds_mask_in.reshape(-1, h, w, 1)
            t_pool = T
        else:
            pool_src = ds_mask_in_local.reshape(-1, h, w, 1)
            t_pool = l_t
        mask_pool_l = max_pool2d(pool_src, KERNEL, STRIDE, PADDING)
        mask_pool_l = mask_pool_l.reshape(
            B, t_pool, mask_pool_l.shape[1], mask_pool_l.shape[2], 1)

        prop_mask_in = jnp.concatenate(
            [ds_mask_in_local, ds_mask_updated_local], axis=-1)
        local_feat = FeaturePropagation(
            self.channel, unroll=self.prop_unroll, remat=self.remat,
            name="feat_prop_module")(
                local_feat, ds_flows_f, ds_flows_b, prop_mask_in)
        enc_feat = jnp.concatenate([local_feat, ref_feat], axis=1)

        if precomputed_ref_tokens is not None:
            # SoftSplit is per-frame: the pipeline tokenizes the encoded
            # reference-frame union ONCE per video and gathers per window
            # (the same ~8 ref frames repeat in every sliding window);
            # only the l_t local frames are tokenized here. Identical
            # numerics — the tokenizer is one strided conv per frame.
            assert not train
            local_tokens = SoftSplit(self.hidden, name="ss")(
                enc_feat[:, :l_t].reshape(-1, h, w, c), B, fold_feat_size)
            trans_feat = jnp.concatenate(
                [local_tokens,
                 precomputed_ref_tokens.astype(local_tokens.dtype)], axis=1)
        else:
            trans_feat = SoftSplit(self.hidden, name="ss")(
                enc_feat.reshape(-1, h, w, c), B, fold_feat_size)
        # the flash kernel is inference-only (no VJP); under train fall back
        # to the dense xla formulation instead of failing deep inside pallas
        attn_impl = ("xla" if train and self.attention_impl == "flash"
                     else self.attention_impl)
        trans_feat = TemporalSparseTransformerBlock(
            self.hidden, self.num_heads, self.window_size, self.pool_size,
            self.depths, attn_impl, remat=self.remat, name="transformers")(
                trans_feat, fold_feat_size, mask_pool_l, t_dilation,
                frame_valid, masked_windows,
                out_frames=(None if train or attn_impl == "pallas"
                            else l_t))
        # eval decodes only the l_t local frames — fold (SoftComp) and the
        # residual add for the T - l_t reference rows are dead work there
        # (reference model/propainter.py:365-369 also slices [:l_t], but
        # after folding everything)
        t_fold = T if train else l_t
        trans_feat = SoftComp(self.channel, name="sc")(
            trans_feat[:, :t_fold], t_fold, fold_feat_size)
        trans_feat = trans_feat.reshape(B, t_fold, h, w, c)

        enc_feat = enc_feat[:, :t_fold] + trans_feat

        if train:
            dec_in = enc_feat.reshape(B * T, h, w, c)
            t_out = T
        else:
            dec_in = enc_feat.reshape(B * l_t, h, w, c)
            t_out = l_t

        x = leaky_relu(_Deconv(128, name="decoder_0")(dec_in), 0.2)
        x = leaky_relu(conv2d(64, 3, 1, 1, name="decoder_2")(x), 0.2)
        x = leaky_relu(_Deconv(64, name="decoder_4")(x), 0.2)
        x = conv2d(3, 3, 1, 1, name="decoder_6")(x)
        output = jnp.tanh(x)
        return output.reshape(B, t_out, ori_h, ori_w, 3)


def convert_inpaint_state_dict(sd) -> dict:
    """Convert ProPainter.pth to flax params."""
    from propainter_tpu.convert.torch_to_jax import convert_state_dict

    return convert_state_dict(
        sd,
        rename=[
            # propagation ModuleDict: torch {deform_align|backbone}.{dir} ->
            # flax {dir}.{deform_align|backbone} (scan module per direction)
            (r"feat_prop_module\.(deform_align|backbone)\.(backward_1|forward_1)\.",
             r"feat_prop_module.\2.\1."),
        ],
        skip=[r"valid_ind_rolled"],
    )
