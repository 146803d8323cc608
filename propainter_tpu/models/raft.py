"""RAFT optical flow (big model) in JAX/flax, NHWC.

TPU-native re-design of reference RAFT/raft.py, RAFT/extractor.py,
RAFT/update.py, RAFT/corr.py:
  * the 20-iteration GRU refinement is a `lax.scan` (via nn.scan), not a
    Python loop — one compiled body regardless of iteration count;
  * the correlation volume is one large MXU matmul + pooled pyramid, and the
    radius-4 window lookup is a static gather (ops/corr.py);
  * flow is (B, H, W, 2) with channels (dx, dy).

Module/attribute names mirror the torch tree (fnet, cnet, update_block, ...)
so convert/torch_to_jax.py maps the released `raft-things.pth` mechanically.
RAFT is frozen in the whole ProPainter pipeline and always runs fp32
(reference inference_propainter.py:311).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from propainter_tpu.models.layers import conv2d, InstanceNorm, FrozenBatchNorm
from propainter_tpu.ops.corr import corr_pyramid, corr_lookup, corr_lookup_mxu
from propainter_tpu.ops.corr_pallas import (corr_pyramid_t, corr_lookup_fused,
                                            corr_pyramid_flat,
                                            corr_lookup_flat,
                                            corr_lookup_flat_moenc)
from propainter_tpu.ops.warp import coords_grid
from propainter_tpu.ops.patches import unfold


def _norm(norm_fn: str, features: int, name: str):
    if norm_fn == "instance":
        # one_pass: E[x^2]-mean^2 stats (fp32 accumulation) — one fewer
        # HBM traversal than the torch-faithful two-pass; fnet 40.8 ->
        # 32.0 ms at the 80-frame encode shape (tools/enc_opt_ab.py),
        # drift ~5e-7 in fp32 / bf16-noise-level in bf16 (EPE parity and
        # the on-chip golden gate both stay green)
        return InstanceNorm(impl="one_pass", name=name)
    if norm_fn == "batch":
        return FrozenBatchNorm(features, name=name)
    if norm_fn == "none":
        return lambda x: x
    raise ValueError(norm_fn)


class ResidualBlock(nn.Module):
    """Reference RAFT/extractor.py:6-56."""

    planes: int
    norm_fn: str = "instance"
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        y = conv2d(self.planes, 3, self.stride, 1, name="conv1")(x)
        y = jax.nn.relu(_norm(self.norm_fn, self.planes, "norm1")(y))
        y = conv2d(self.planes, 3, 1, 1, name="conv2")(y)
        y = jax.nn.relu(_norm(self.norm_fn, self.planes, "norm2")(y))
        if self.stride != 1:
            x = conv2d(self.planes, 1, self.stride, 0, name="downsample_0")(x)
            x = _norm(self.norm_fn, self.planes, "downsample_1")(x)
        return jax.nn.relu(x + y)


class BasicEncoder(nn.Module):
    """Stride-8 ResNet-style encoder. Reference RAFT/extractor.py:118-192."""

    output_dim: int = 256
    norm_fn: str = "instance"

    @nn.compact
    def __call__(self, x):
        x = conv2d(64, 7, 2, 3, name="conv1")(x)
        x = jax.nn.relu(_norm(self.norm_fn, 64, "norm1")(x))
        for li, (dim, stride) in enumerate([(64, 1), (96, 2), (128, 2)], start=1):
            x = ResidualBlock(dim, self.norm_fn, stride, name=f"layer{li}_0")(x)
            x = ResidualBlock(dim, self.norm_fn, 1, name=f"layer{li}_1")(x)
        return conv2d(self.output_dim, 1, 1, 0, name="conv2")(x)


class _ConvParams(nn.Module):
    """Declares nn.Conv-layout params (kernel HWIO, bias) without applying
    them — for convs algebraically fused into a pallas kernel while the
    param tree stays checkpoint-compatible (same trick as
    propainter._DenseParams)."""

    in_features: int
    features: int
    kernel_size: tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (*self.kernel_size, self.in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class BasicMotionEncoder(nn.Module):
    """Reference RAFT/update.py:79-97. corr has levels*(2r+1)^2 channels.

    Fused path (`pyramid`/`coords` given, flat layout): convc1 + relu run
    inside the correlation-lookup kernel epilogue (ops/corr_pallas.py
    moenc) — the (N, 324) window tensor never reaches HBM."""

    @nn.compact
    def __call__(self, flow, corr=None, *, pyramid=None, coords=None):
        if pyramid is not None:
            C = len(pyramid) * 81
            k, b = _ConvParams(C, 256, name="convc1")()
            # the kernel epilogue accumulates in fp32; cast back to the
            # network compute dtype (a no-op in the fp32 default)
            cor = corr_lookup_flat_moenc(
                list(pyramid), coords, k.reshape(C, 256), b,
                radius=4).astype(flow.dtype)
        else:
            cor = jax.nn.relu(conv2d(256, 1, 1, 0, name="convc1")(corr))
        cor = jax.nn.relu(conv2d(192, 3, 1, 1, name="convc2")(cor))
        flo = jax.nn.relu(conv2d(128, 7, 1, 3, name="convf1")(flow))
        flo = jax.nn.relu(conv2d(64, 3, 1, 1, name="convf2")(flo))
        out = jax.nn.relu(
            conv2d(126, 3, 1, 1, name="conv")(jnp.concatenate([cor, flo], -1))
        )
        return jnp.concatenate([out, flow], -1)


class SepConvGRU(nn.Module):
    """1x5 then 5x1 separable GRU. Reference RAFT/update.py:33-60."""

    hidden_dim: int = 128

    @nn.compact
    def __call__(self, h, x):
        hd = self.hidden_dim
        for suffix, k, p in (("1", (1, 5), (0, 2)), ("2", (5, 1), (2, 0))):
            hx = jnp.concatenate([h, x], -1)
            # z and r read the same hx: apply both as ONE conv (half the HBM
            # traffic over hx inside the 20-iter scan body; per-channel dot
            # products — and therefore numerics — are unchanged). Param tree
            # stays checkpoint-identical via _ConvParams.
            kz, bz = _ConvParams(hx.shape[-1], hd, k, name=f"convz{suffix}")()
            kr, br = _ConvParams(hx.shape[-1], hd, k, name=f"convr{suffix}")()
            hxp, kz, kr, bz, br = nn.dtypes.promote_dtype(
                hx, kz, kr, bz, br, dtype=None)
            zr = jax.lax.conv_general_dilated(
                hxp, jnp.concatenate([kz, kr], axis=-1), (1, 1),
                [(p[0], p[0]), (p[1], p[1])],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + jnp.concatenate([bz, br])
            z = jax.nn.sigmoid(zr[..., :hd])
            r = jax.nn.sigmoid(zr[..., hd:])
            q = jnp.tanh(
                conv2d(hd, k, 1, p, name=f"convq{suffix}")(
                    jnp.concatenate([r * h, x], -1)))
            h = (1 - z) * h + z * q
        return h


class FlowHead(nn.Module):
    """Reference RAFT/update.py:6-14."""

    hidden_dim: int = 256

    @nn.compact
    def __call__(self, x):
        x = jax.nn.relu(conv2d(self.hidden_dim, 3, 1, 1, name="conv1")(x))
        return conv2d(2, 3, 1, 1, name="conv2")(x)


class BasicUpdateBlock(nn.Module):
    """Reference RAFT/update.py:114-136.

    with_mask=False skips the convex-upsample mask head (mask_0/mask_2 —
    ~25% of the update block's conv FLOPs): the reference computes it every
    iteration, but only the FINAL iteration's mask is ever used at inference
    (RAFT/raft.py:134-143 test_mode), and it depends only on the final
    `net` — RAFT.refine applies the same head once after the scan, which is
    numerically identical."""

    with_mask: bool = True

    @nn.compact
    def __call__(self, net, inp, corr, flow, *, pyramid=None, coords=None):
        motion = BasicMotionEncoder(name="encoder")(
            flow, corr, pyramid=pyramid, coords=coords)
        gru_in = jnp.concatenate([inp, motion], -1)
        net = SepConvGRU(name="gru")(net, gru_in)
        delta_flow = FlowHead(name="flow_head")(net)
        if not self.with_mask:
            return net, None, delta_flow
        m = jax.nn.relu(conv2d(256, 3, 1, 1, name="mask_0")(net))
        up_mask = 0.25 * conv2d(64 * 9, 1, 1, 0, name="mask_2")(m)
        return net, up_mask, delta_flow


class _UpdateStep(nn.Module):
    """One scan step of the iterative refinement (carry-through params)."""

    corr_layout: str = "flat"

    @nn.compact
    def __call__(self, carry, _):
        net, coords1, inp, coords0, pyramid = carry
        # Windowed radius-4 lookup, gather-free (reference RAFT/corr.py:29-49
        # semantics). On TPU: pallas kernel over the pixel-laned (transposed)
        # pyramid — 2.5x the MXU-matmul form, which pays for its (N, n, Hc)
        # interpolation matrices every iteration. CPU keeps the matmul form.
        # The upsample-mask head runs ONCE after the scan (see
        # BasicUpdateBlock.with_mask), not in every step.
        # flow features in the network compute dtype (= the carry dtype:
        # bf16 when the caller casts params+carries, fp32 otherwise); the
        # coords carry itself stays fp32 so update accumulation is exact
        flow = (coords1 - coords0).astype(net.dtype)
        if jax.default_backend() != "cpu" and self.corr_layout == "flat":
            # flat layout: the lookup runs inside the motion encoder with
            # convc1+relu fused into the kernel epilogue
            net, _, delta_flow = BasicUpdateBlock(
                with_mask=False, name="update_block")(
                    net, inp, None, flow, pyramid=pyramid, coords=coords1)
        else:
            if jax.default_backend() == "cpu":
                corr = corr_lookup_mxu(list(pyramid), coords1, radius=4)
            else:
                corr = corr_lookup_fused(list(pyramid), coords1, radius=4)
            net, _, delta_flow = BasicUpdateBlock(
                with_mask=False, name="update_block")(net, inp, corr, flow)
        coords1 = coords1 + delta_flow
        return (net, coords1, inp, coords0, pyramid), None


def upsample_flow_convex(flow: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Convex-combination 8x flow upsampling. Reference RAFT/raft.py:73-84.

    flow: (B, H, W, 2); mask: (B, H, W, 64*9) laid out (k, i, j) c-major as the
    torch conv produces (view(N,1,9,8,8,H,W)).
    """
    B, H, W, _ = flow.shape
    m = mask.reshape(B, H, W, 9, 8 * 8)
    m = jax.nn.softmax(m, axis=3)
    up = unfold(8.0 * flow, (3, 3), (1, 1), (1, 1))  # (B, H*W, 2*9)
    up = up.reshape(B, H, W, 2, 9)
    # k=9 contraction as a broadcast-reduce: 255k independent (2,9)x(9,64)
    # matmuls under-fill the MXU; the fused elementwise-sum runs on the VPU
    # at full lane width (measured 24 -> ~4 ms at inference shapes)
    out = jnp.sum(up[..., None] * m[:, :, :, None, :, :], axis=4)
    out = out.reshape(B, H, W, 2, 8, 8)
    out = out.transpose(0, 1, 4, 2, 5, 3)  # (B, H, 8, W, 8, 2)
    return out.reshape(B, 8 * H, 8 * W, 2)


class RAFT(nn.Module):
    """RAFT-big: hdim=cdim=128, corr_levels=4, corr_radius=4.

    __call__(image1, image2, iters) -> (flow_low, flow_up), both (B, h, w, 2):
    flow_low at 1/8 resolution, flow_up at input resolution — matching
    reference RAFT/raft.py:87-146 test_mode=True.
    """

    hidden_dim: int = 128
    context_dim: int = 128
    corr_levels: int = 4
    corr_radius: int = 4
    # storage dtype of the all-pairs correlation pyramid. 'bfloat16' halves
    # the lookup's HBM reads (26 -> 19 ms/iter; final-flow drift < 0.01 px
    # on ~8 px flows over 20 iterations); the bf16 inference pipeline uses
    # it. Pooling and the GRU stay fp32.
    corr_volume_dtype: str = "float32"
    # 'flat' packs the pair batch into the lookup kernel's lane axis
    # (corr_pyramid_flat): no per-pair lane padding (21% dead VPU/HBM work
    # at inference shapes) and no per-call volume pad copies. 'batched'
    # keeps per-pair lanes — the layout to use if the refinement is ever
    # GSPMD-sharded over the pair axis on a real multi-chip mesh.
    corr_layout: str = "flat"

    def setup(self):
        self.fnet = BasicEncoder(256, "instance")
        self.cnet = BasicEncoder(self.hidden_dim + self.context_dim, "batch")
        self.scanned = nn.scan(
            _UpdateStep,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0, out_axes=0,
        )(corr_layout=self.corr_layout)
        # convex-upsample mask head, applied once to the FINAL net (the
        # in-scan per-iteration computation is dead work at inference);
        # param paths stay update_block-relative via the converter rename
        self.mask_0 = conv2d(256, 3, 1, 1, name="mask_0")
        self.mask_2 = conv2d(64 * 9, 1, 1, 0, name="mask_2")

    def encode(self, images, compute_dtype: Any = None):
        """Per-frame features: (N, H, W, 3) -> (fmap, net, inp).

        Lets callers encode each unique frame ONCE and index frame pairs —
        the reference (and plain __call__) re-encodes every frame up to 4x
        across the fwd/bwd pair batches (model/modules/flow_comp_raft.py:39-55).

        compute_dtype: conv compute dtype for the encoders. The bf16
        pipeline passes bfloat16 (with bf16-cast params) so the encoder
        convs run at MXU bf16 rate; InstanceNorm stats stay fp32 inside.
        Default fp32 — the reference keeps RAFT fp32 in fp16 mode
        (inference_propainter.py:311) because CUDA fp16's 5-bit exponent
        overflows; bf16 keeps fp32's exponent (drift measured in
        tools/raft_bf16_ab.py).
        """
        images = images.astype(compute_dtype or jnp.float32)
        fmap = self.fnet(images)
        c = self.cnet(images)
        net = jnp.tanh(c[..., : self.hidden_dim])
        inp = jax.nn.relu(c[..., self.hidden_dim :])
        return fmap, net, inp

    def refine(self, fmap1, fmap2, net, inp, iters: int = 20):
        """Iterative GRU refinement from precomputed features."""
        if jax.default_backend() == "cpu":
            pyramid = tuple(corr_pyramid(fmap1, fmap2, self.corr_levels))
        else:
            # transposed (query-pixel-laned) volume: pools and the fused
            # lookup run at full lane width (see ops/corr_pallas.py)
            if self.corr_layout == "flat":
                # cast-before-transpose happens inside the builder
                pyramid = tuple(corr_pyramid_flat(
                    fmap1, fmap2, self.corr_levels,
                    out_dtype=self.corr_volume_dtype))
            else:
                pyramid = tuple(
                    c.astype(self.corr_volume_dtype)
                    for c in corr_pyramid_t(fmap1, fmap2, self.corr_levels))
        B, H8, W8, _ = net.shape
        coords0 = coords_grid(B, H8, W8)
        coords1 = coords_grid(B, H8, W8)

        (net, coords1, _, _, _), _ = self.scanned(
            (net, coords1, inp, coords0, pyramid),
            jnp.zeros((iters,), jnp.int32))

        # convex-upsample mask from the FINAL net only (identical to the
        # reference's last-iteration mask; the per-iteration computation is
        # dead work at inference — see BasicUpdateBlock.with_mask)
        up_mask = 0.25 * self.mask_2(jax.nn.relu(self.mask_0(net)))

        flow_low = coords1 - coords0
        flow_up = upsample_flow_convex(flow_low, up_mask)
        return flow_low, flow_up

    def __call__(self, image1, image2, iters: int = 20):
        fmap1 = self.fnet(image1.astype(jnp.float32))
        fmap2 = self.fnet(image2.astype(jnp.float32))
        c = self.cnet(image1.astype(jnp.float32))
        net = jnp.tanh(c[..., : self.hidden_dim])
        inp = jax.nn.relu(c[..., self.hidden_dim :])
        return self.refine(fmap1, fmap2, net, inp, iters)


def convert_raft_state_dict(sd) -> dict:
    """Convert a torch RAFT state dict (raft-things.pth) to flax params."""
    from propainter_tpu.convert.torch_to_jax import convert_state_dict

    return convert_state_dict(
        sd,
        rename=[
            # the convex-upsample mask head lives on RAFT itself (applied
            # once after the scan), not inside the scanned update block
            (r"^update_block\.mask\.0\.", "mask_0."),
            (r"^update_block\.mask\.2\.", "mask_2."),
            (r"^update_block\.", "scanned.update_block."),
        ],
        # ResidualBlock.norm3 is also registered as downsample.1 — keep the
        # downsample copy, drop the duplicate attribute keys.
        skip=[r"\.norm3\."],
    )
