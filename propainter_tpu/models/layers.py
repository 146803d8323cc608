"""Shared NN building blocks (NHWC / NDHWC, flax.linen).

Module attribute names deliberately mirror the reference's torch attribute
paths so the generic state-dict converter (convert/torch_to_jax.py) can map
weights mechanically.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn


def leaky_relu(x, negative_slope=0.2):
    return jax.nn.leaky_relu(x, negative_slope)


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


def conv2d(features, kernel_size, stride=1, padding=0, groups=1, bias=True,
           dilation=1, dtype=None, name=None) -> nn.Conv:
    """nn.Conv configured with torch Conv2d conventions (NHWC, HWIO kernel).

    Named inline (e.g. name='conv1') so the flax param path mirrors the torch
    attribute path for mechanical weight conversion.
    """
    k = _pair(kernel_size)
    s = _pair(stride)
    p = _pair(padding)
    d = _pair(dilation)
    return nn.Conv(
        features=features,
        kernel_size=k,
        strides=s,
        padding=[(p[0], p[0]), (p[1], p[1])],
        kernel_dilation=d,
        feature_group_count=groups,
        use_bias=bias,
        dtype=dtype,
        name=name,
    )


class SplitGroupConv2d(nn.Module):
    """Grouped 3x3 conv computed as per-group dense convs on channel slices.

    Param names/shapes are identical to ``nn.Conv(feature_group_count=g)``
    (kernel (kh, kw, cin/g, features), bias (features,)), so checkpoints are
    interchangeable with `conv2d`. XLA's feature_group_count lowering on v5e
    runs measurably below per-group dense convs at the encoder's fusion
    shapes (tools/encoder_ab.py), and taking the group inputs as a LIST of
    slices avoids materializing the interleaved concat tensor the reference
    builds (model/propainter.py:341-349).
    """

    features: int
    kernel_size: tuple[int, int] = (3, 3)
    stride: tuple[int, int] = (1, 1)
    padding: tuple[int, int] = (1, 1)
    # 'split': g per-group dense convs on the slices (avoids the concat).
    # 'dense': ONE dense conv over cat(xs) with a block-diagonal-masked
    #   kernel — g-fold redundant FLOPs, but at full MXU lane width the
    #   grouped stages' narrow (cin/g, cout/g) contractions underutilize;
    #   the zero blocks contribute exact 0s so outputs match 'split' up to
    #   fp32 accumulation order (measured: the win at the encoder fusion
    #   shapes, tools/enc_opt_ab.py).
    impl: str = "split"

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray]):
        g = len(xs)
        cig = xs[0].shape[-1]
        kh, kw = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kh, kw, cig, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        x0, kernel, bias = nn.dtypes.promote_dtype(
            xs[0], kernel, bias, dtype=None)
        cog = self.features // g
        p = self.padding
        if self.impl == "dense":
            # scatter the per-group kernel into a block-diagonal dense one:
            # output group i reads only input slice i of cat(xs)
            dense_k = jnp.zeros((kh, kw, g * cig, self.features),
                                kernel.dtype)
            for i in range(g):
                dense_k = dense_k.at[
                    :, :, i * cig:(i + 1) * cig,
                    i * cog:(i + 1) * cog].set(
                        kernel[..., i * cog:(i + 1) * cog])
            cat = jnp.concatenate(
                [x.astype(x0.dtype) for x in xs], axis=-1)
            return jax.lax.conv_general_dilated(
                cat, dense_k, window_strides=self.stride,
                padding=[(p[0], p[0]), (p[1], p[1])],
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
        outs = [
            jax.lax.conv_general_dilated(
                x.astype(x0.dtype), kernel[..., i * cog:(i + 1) * cog],
                window_strides=self.stride,
                padding=[(p[0], p[0]), (p[1], p[1])],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            for i, x in enumerate(xs)
        ]
        return jnp.concatenate(outs, axis=-1) + bias


class Conv3d(nn.Module):
    """3-D conv, NDHWC. kernel layout (kd, kh, kw, I, O).

    padding is ((pd, pd), (ph, ph), (pw, pw)); `replicate` pads edge-mode
    first then runs VALID (torch padding_mode='replicate').
    """

    features: int
    kernel_size: tuple[int, int, int]
    strides: tuple[int, int, int] = (1, 1, 1)
    padding: tuple[int, int, int] = (0, 0, 0)
    dilation: tuple[int, int, int] = (1, 1, 1)
    use_bias: bool = True
    replicate_pad: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        kd, kh, kw = self.kernel_size
        in_feat = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.he_normal(),
            (kd, kh, kw, in_feat, self.features),
        )
        pd, ph, pw = self.padding
        if self.replicate_pad:
            x = jnp.pad(
                x,
                ((0, 0), (pd, pd), (ph, ph), (pw, pw), (0, 0)),
                mode="edge",
            )
            pad = "VALID"
        else:
            pad = [(pd, pd), (ph, ph), (pw, pw)]
        dtype = self.dtype or x.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            kernel.astype(dtype),
            window_strides=self.strides,
            padding=pad,
            rhs_dilation=self.dilation,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(dtype)
        return y


class InstanceNorm(nn.Module):
    """InstanceNorm2d, torch defaults: affine=False, eps=1e-5.

    Normalizes each (sample, channel) over spatial dims of an NHWC tensor.
    """

    eps: float = 1e-5
    # 'two_pass': mean, then E[(x-mean)^2] — torch-faithful, cancellation-
    #   safe, but three fp32 traversals of the tensor.
    # 'one_pass': var = E[x^2] - mean^2 with fp32 accumulation — one fewer
    #   pass over HBM (the norm inputs are post-conv activations with O(1)
    #   scale, so the cancellation risk that motivates two_pass does not
    #   bite; measured drift at RAFT fnet shapes < 2e-3 on unit-scale
    #   activations, tools/enc_opt_ab.py).
    impl: str = "two_pass"

    @nn.compact
    def __call__(self, x):
        # stats in fp32 regardless of compute dtype: a bf16 spatial mean/var
        # reduce is not guaranteed to accumulate wide, and variance is
        # cancellation-prone. No-op (and bitwise identical) for fp32 inputs;
        # the normalized result is cast back to the input dtype.
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
        if self.impl == "one_pass":
            var = jnp.mean(jnp.square(xf), axis=(1, 2),
                           keepdims=True) - jnp.square(mean)
            var = jnp.maximum(var, 0.0)
        else:
            var = jnp.var(xf, axis=(1, 2), keepdims=True)
        return ((xf - mean) * jax.lax.rsqrt(var + self.eps)).astype(x.dtype)


class FrozenBatchNorm(nn.Module):
    """BatchNorm2d in eval mode: running stats are parameters (converted from
    the torch checkpoint) and never updated. RAFT's cnet uses this and is
    frozen in the whole ProPainter pipeline (reference RAFT/raft.py:59-62)."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        inv = jax.lax.rsqrt(var + self.eps) * scale
        return (x - mean) * inv + bias
