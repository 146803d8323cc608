"""Recurrent flow completion network in JAX/flax (NDHWC / NHWC).

TPU-native re-design of reference model/recurrent_flow_completion.py:
  * P3D encoder / dilated 3-D mid layers run as XLA conv3d in NDHWC;
  * the second-order bidirectional deformable propagation — a Python loop over
    frames in the reference (:66-124) — is a `lax.scan` with a
    (prop_{t-1}, prop_{t-2}) carry;
  * deformable alignment uses ops/deform.py (one gather + MXU matmul).

Module names mirror the torch attribute tree for mechanical weight
conversion of recurrent_flow_completion.pth (see convert_flowcomp_state_dict).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from propainter_tpu.models.layers import conv2d, Conv3d, leaky_relu
from propainter_tpu.ops.deform import (
    modulated_deform_conv2d_mxu,
    split_offset_mask_channels,
)
from propainter_tpu.ops.deform_pallas import modulated_deform_conv2d_opt2
from propainter_tpu.ops.interp import resize


class P3DBlock(nn.Module):
    """(1,k,k) spatial conv + (3,1,1) dilated temporal conv.
    Reference model/recurrent_flow_completion.py:148-169."""

    out_channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        y = Conv3d(self.out_channels, (1, 3, 3), (1, self.stride, self.stride),
                   (0, 1, 1), name="conv1_0")(x)
        y = leaky_relu(y, 0.2)
        y = Conv3d(self.out_channels, (3, 1, 1), (1, 1, 1), (2, 0, 0),
                   dilation=(2, 1, 1), name="conv2_0")(y)
        return y


class SecondOrderDeformableAlignment(nn.Module):
    """Deformable alignment conditioned on current + two previous features.
    Reference model/recurrent_flow_completion.py:9-44.

    x: (B, H, W, 2C) stacked (prop_{t-1}, prop_{t-2});
    cond: (B, H, W, 3C) cat(prop_{t-1}, current, prop_{t-2}).
    """

    channels: int
    deform_groups: int = 16
    max_residue_magnitude: float = 5.0

    @nn.compact
    def __call__(self, x, cond):
        c = self.channels
        dg = self.deform_groups
        o = leaky_relu(conv2d(c, 3, 1, 1, name="conv_offset_0")(cond), 0.1)
        o = leaky_relu(conv2d(c, 3, 1, 1, name="conv_offset_2")(o), 0.1)
        o = leaky_relu(conv2d(c, 3, 1, 1, name="conv_offset_4")(o), 0.1)
        raw = conv2d(27 * dg, 3, 1, 1, name="conv_offset_6")(o)
        offset, mask = split_offset_mask_channels(
            raw, dg, self.max_residue_magnitude)
        kernel = self.param(
            "kernel", nn.initializers.he_normal(), (3, 3, 2 * c, c))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        # separable-matmul (MXU) formulation — gathers are slow on TPU.
        # NOTE: the static-band formulation (modulated_deform_conv2d_banded,
        # valid here since offsets are 5*tanh with no flow term) does ~70x
        # fewer FLOPs but measured 3x SLOWER (PERF.md) — the D^2 shifted-copy
        # stack and tiny-contraction einsums lose to one dense MXU matmul.
        return modulated_deform_conv2d_opt2(x, offset, mask, kernel, bias,
                                            None)


class _PropStep(nn.Module):
    """One time-step of second-order propagation (scanned over frames).

    carry: (i, prop1, prop2) — step index and the two previous propagated
    features; xs: (feat_current, extra) where extra stacks features from
    already-finished branches ((B,H,W,0) placeholder for the first branch).
    """

    channels: int

    @nn.compact
    def __call__(self, carry, xs):
        i, prop1, prop2 = carry
        feat_current, extra = xs
        c = self.channels

        cond = jnp.concatenate([prop1, feat_current, prop2], axis=-1)
        x2 = jnp.concatenate([prop1, prop2], axis=-1)
        aligned = SecondOrderDeformableAlignment(
            c, name="deform_align")(x2, cond)
        # reference: at i == 0 the deform step is skipped and prop stays zero
        feat_prop = jnp.where(i > 0, aligned, jnp.zeros_like(aligned))

        feat = jnp.concatenate([feat_current, extra, feat_prop], axis=-1)
        y = leaky_relu(conv2d(c, 3, 1, 1, name="backbone_0")(feat), 0.1)
        y = conv2d(c, 3, 1, 1, name="backbone_2")(y)
        feat_prop = feat_prop + y

        return (i + 1, feat_prop, prop1), feat_prop


class BidirectionalPropagation3D(nn.Module):
    """Backward then forward second-order propagation + fusion.
    Reference model/recurrent_flow_completion.py:46-124."""

    channels: int
    # scan unroll factor: the per-step bodies are tiny (latency-bound at
    # the 1/8-res grid), so unrolling amortizes loop bookkeeping and lets
    # XLA fuse across consecutive steps
    unroll: int = 1
    # rematerialize each scan step under differentiation: the deform
    # alignment's separable-interp matmuls materialize large per-step
    # temporaries that XLA otherwise saves for the backward pass — at the
    # reference train config the un-remat'd flow step needs 27.5 GB vs the
    # v5e's 15.75 GB HBM. Identity for forward-only use (inference).
    remat: bool = False

    @nn.compact
    def __call__(self, x):
        """x: (B, T, H, W, C) -> (B, T, H, W, C)."""
        B, T, H, W, C = x.shape
        c = self.channels

        def run(name: str, inputs, extra):
            scan = nn.scan(
                nn.remat(_PropStep, prevent_cse=False)
                if self.remat else _PropStep,
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=0,
                out_axes=0,
                unroll=self.unroll,
            )(c, name=name)
            zeros = jnp.zeros((B, H, W, c), x.dtype)
            (_, _, _), out = scan((jnp.int32(0), zeros, zeros), (inputs, extra))
            return out  # (T, B, H, W, C)

        xs_t = jnp.moveaxis(x, 1, 0)  # (T, B, H, W, C)
        empty = jnp.zeros((T, B, H, W, 0), x.dtype)
        back = run("backward_", xs_t[::-1], empty)[::-1]
        fwd = run("forward_", xs_t, back)

        cat = jnp.concatenate([back, fwd], axis=-1)
        fused = conv2d(c, 1, 1, 0, name="fusion")(
            cat.reshape(T * B, H, W, 2 * c))
        fused = fused.reshape(T, B, H, W, c)
        return jnp.moveaxis(fused, 0, 1) + x


class _Deconv(nn.Module):
    """2x bilinear (align_corners=True) upsample + 3x3 conv.
    Reference model/recurrent_flow_completion.py:127-145."""

    features: int

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        # matmul-form upsample: 0.87x the gather form here (tools/resize_ab)
        x = resize(x, (2 * H, 2 * W), "bilinear", align_corners=True,
                   impl="mxu")
        return conv2d(self.features, 3, 1, 1, name="conv")(x)


class EdgeDetection(nn.Module):
    """Flow-edge head (training only). Reference :172-200."""

    mid_ch: int = 16

    @nn.compact
    def __call__(self, flow):
        x = leaky_relu(conv2d(self.mid_ch, 3, 1, 1, name="projection_0")(flow), 0.2)
        e = leaky_relu(conv2d(self.mid_ch, 3, 1, 1, name="mid_layer_1_0")(x), 0.2)
        e = conv2d(self.mid_ch, 3, 1, 1, name="mid_layer_2_0")(e)
        e = leaky_relu(x + e, 0.01)
        e = conv2d(1, 1, 1, 0, name="out_layer")(e)
        return jax.nn.sigmoid(e)


class RecurrentFlowCompleteNet(nn.Module):
    """Complete masked optical flow. Reference :203-309.

    __call__(masked_flows (B,T,H,W,2), masks (B,T,H,W,1), train)
      -> (flow (B,T,H,W,2), edge (B,T,H,W,1) | None)
    """

    scan_unroll: int = 1
    # rematerialize propagation scan steps under grad (see
    # BidirectionalPropagation3D.remat); set by the trainer
    remat: bool = False

    @nn.compact
    def __call__(self, masked_flows, masks, train: bool = False):
        B, T, H, W, _ = masked_flows.shape
        x = jnp.concatenate([masked_flows, masks], axis=-1)  # (B,T,H,W,3)

        x = Conv3d(32, (1, 5, 5), (1, 2, 2), (0, 2, 2), replicate_pad=True,
                   name="downsample_0")(x)
        x = leaky_relu(x, 0.2)  # (B,T,H/2,W/2,32)

        e1 = leaky_relu(P3DBlock(32, 1, name="encoder1_0")(x), 0.2)
        e1 = leaky_relu(P3DBlock(64, 2, name="encoder1_2")(e1), 0.2)  # 4x

        e2 = leaky_relu(P3DBlock(64, 1, name="encoder2_0")(e1), 0.2)
        e2 = leaky_relu(P3DBlock(128, 2, name="encoder2_2")(e2), 0.2)  # 8x

        m = leaky_relu(Conv3d(128, (1, 3, 3), (1, 1, 1), (0, 3, 3),
                              dilation=(1, 3, 3), name="mid_dilation_0")(e2), 0.2)
        m = leaky_relu(Conv3d(128, (1, 3, 3), (1, 1, 1), (0, 2, 2),
                              dilation=(1, 2, 2), name="mid_dilation_2")(m), 0.2)
        m = leaky_relu(Conv3d(128, (1, 3, 3), (1, 1, 1), (0, 1, 1),
                              name="mid_dilation_4")(m), 0.2)

        prop = BidirectionalPropagation3D(
            128, unroll=self.scan_unroll, remat=self.remat,
            name="feat_prop_module")(m)
        h8, w8 = H // 8, W // 8
        prop = prop.reshape(B * T, h8, w8, 128)

        d2 = leaky_relu(conv2d(128, 3, 1, 1, name="decoder2_0")(prop), 0.2)
        d2 = leaky_relu(_Deconv(64, name="decoder2_2")(d2), 0.2)
        d2 = d2 + e1.reshape(B * T, H // 4, W // 4, 64)

        d1 = leaky_relu(conv2d(64, 3, 1, 1, name="decoder1_0")(d2), 0.2)
        d1 = leaky_relu(_Deconv(32, name="decoder1_2")(d1), 0.2)

        u = leaky_relu(conv2d(32, 3, 1, 1, name="upsample_0")(d1), 0.2)
        flow = _Deconv(2, name="upsample_2")(u)

        edge = None
        if train:
            edge = EdgeDetection(name="edgeDetector")(flow)
            edge = edge.reshape(B, T, H, W, 1)

        return flow.reshape(B, T, H, W, 2), edge


def forward_bidirect_flow(apply_fn, masked_flows_bi, masks, train=False):
    """Complete both flow directions. Reference :312-337.

    Args:
      apply_fn: bound model apply, (flows, masks, train) -> (flow, edge).
      masked_flows_bi: (flows_f, flows_b), each (B, T-1, H, W, 2).
      masks: (B, T, H, W, 1).
    """
    masks_forward = masks[:, :-1]
    masks_backward = masks[:, 1:]
    mf = masked_flows_bi[0] * (1 - masks_forward)
    mb = masked_flows_bi[1] * (1 - masks_backward)

    # one batched call: forward direction stacked with the time-flipped
    # backward direction (the reference runs two sequential forwards,
    # :321-331; batching halves the scan count — identical numerics)
    B = mf.shape[0]
    flows_in = jnp.concatenate([mf, mb[:, ::-1]], axis=0)
    masks_in = jnp.concatenate(
        [masks_forward, masks_backward[:, ::-1]], axis=0)
    pred, edges = apply_fn(flows_in, masks_in, train)
    pred_f, pred_b = pred[:B], pred[B:, ::-1]
    edges_f = edges_b = None
    if edges is not None:
        edges_f, edges_b = edges[:B], edges[B:, ::-1]
    return [pred_f, pred_b], [edges_f, edges_b]


def combine_flow(masked_flows_bi, pred_flows_bi, masks):
    """pred*mask + observed*(1-mask). Reference :340-347."""
    masks_forward = masks[:, :-1]
    masks_backward = masks[:, 1:]
    f = pred_flows_bi[0] * masks_forward + masked_flows_bi[0] * (1 - masks_forward)
    b = pred_flows_bi[1] * masks_backward + masked_flows_bi[1] * (1 - masks_backward)
    return f, b


def convert_flowcomp_state_dict(sd) -> dict:
    """Convert recurrent_flow_completion.pth to flax params."""
    from propainter_tpu.convert.torch_to_jax import convert_state_dict

    return convert_state_dict(
        sd,
        rename=[
            # torch: feat_prop_module.{deform_align|backbone}.{dir}.X
            # flax:  feat_prop_module.{dir}.{deform_align|backbone}.X
            (r"feat_prop_module\.(deform_align|backbone)\.(backward_|forward_)\.",
             r"feat_prop_module.\2.\1."),
        ],
    )
