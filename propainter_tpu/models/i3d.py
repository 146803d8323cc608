"""InceptionI3d in JAX/flax (NDHWC) for the VFID metric.

Architecture follows reference core/metrics.py:334-569 (itself the public
pytorch-i3d port of the Kinetics I3D): Unit3D = TF-style dynamic SAME pad ->
conv3d VALID -> frozen BatchNorm(eps=1e-3) -> relu; Inception modules; the
VFID feature is the (T, H, W)-mean of Mixed_5c (1024-d), as the reference's
extract_features('Logits') computes (core/metrics.py:555-567).

Weights convert mechanically from i3d_rgb_imagenet.pt.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn
from jax import lax

from propainter_tpu.models.layers import FrozenBatchNorm


def _same_pad(size: int, kernel: int, stride: int) -> tuple[int, int]:
    """TF SAME padding (reference Unit3D.compute_pad, core/metrics.py:259-263)."""
    if size % stride == 0:
        pad = max(kernel - stride, 0)
    else:
        pad = max(kernel - size % stride, 0)
    return pad // 2, pad - pad // 2


def _pad_same(x, kernel, stride):
    B, T, H, W, C = x.shape
    pt = _same_pad(T, kernel[0], stride[0])
    ph = _same_pad(H, kernel[1], stride[1])
    pw = _same_pad(W, kernel[2], stride[2])
    return jnp.pad(x, ((0, 0), pt, ph, pw, (0, 0)))


class _Unit3DNamed(nn.Module):
    """Unit3D with torch-mirroring child names (conv3d / bn)."""

    features: int
    kernel_shape: tuple[int, int, int] = (1, 1, 1)
    stride: tuple[int, int, int] = (1, 1, 1)
    use_batch_norm: bool = True
    use_bias: bool = False
    activation: bool = True

    @nn.compact
    def __call__(self, x):
        x = _pad_same(x, self.kernel_shape, self.stride)

        class _Conv(nn.Module):
            features: int
            kernel_shape: tuple
            stride: tuple
            use_bias: bool

            @nn.compact
            def __call__(self, x):
                kernel = self.param(
                    "kernel", nn.initializers.he_normal(),
                    (*self.kernel_shape, x.shape[-1], self.features))
                y = lax.conv_general_dilated(
                    x, kernel, self.stride, "VALID",
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
                if self.use_bias:
                    y = y + self.param("bias", nn.initializers.zeros,
                                       (self.features,))
                return y

        y = _Conv(self.features, self.kernel_shape, self.stride,
                  self.use_bias, name="conv3d")(x)
        if self.use_batch_norm:
            y = FrozenBatchNorm(self.features, eps=1e-3, name="bn")(y)
        if self.activation:
            y = jax.nn.relu(y)
        return y


def _max_pool_same(x, kernel, stride):
    x = _pad_same(x, kernel, stride)
    return lax.reduce_window(
        x, -jnp.inf, lax.max,
        (1, *kernel, 1), (1, *stride, 1), "VALID")


class InceptionModule(nn.Module):
    out_channels: tuple[int, ...]

    @nn.compact
    def __call__(self, x):
        oc = self.out_channels
        b0 = _Unit3DNamed(oc[0], (1, 1, 1), name="b0")(x)
        b1 = _Unit3DNamed(oc[1], (1, 1, 1), name="b1a")(x)
        b1 = _Unit3DNamed(oc[2], (3, 3, 3), name="b1b")(b1)
        b2 = _Unit3DNamed(oc[3], (1, 1, 1), name="b2a")(x)
        b2 = _Unit3DNamed(oc[4], (3, 3, 3), name="b2b")(b2)
        b3 = _max_pool_same(x, (3, 3, 3), (1, 1, 1))
        b3 = _Unit3DNamed(oc[5], (1, 1, 1), name="b3b")(b3)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionI3d(nn.Module):
    """__call__(video (B, T, H, W, 3) in [-1, 1]) -> (B, 1024) VFID feature."""

    @nn.compact
    def __call__(self, x):
        x = _Unit3DNamed(64, (7, 7, 7), (2, 2, 2), name="Conv3d_1a_7x7")(x)
        x = _max_pool_same(x, (1, 3, 3), (1, 2, 2))
        x = _Unit3DNamed(64, (1, 1, 1), name="Conv3d_2b_1x1")(x)
        x = _Unit3DNamed(192, (3, 3, 3), name="Conv3d_2c_3x3")(x)
        x = _max_pool_same(x, (1, 3, 3), (1, 2, 2))
        x = InceptionModule((64, 96, 128, 16, 32, 32), name="Mixed_3b")(x)
        x = InceptionModule((128, 128, 192, 32, 96, 64), name="Mixed_3c")(x)
        x = _max_pool_same(x, (3, 3, 3), (2, 2, 2))
        x = InceptionModule((192, 96, 208, 16, 48, 64), name="Mixed_4b")(x)
        x = InceptionModule((160, 112, 224, 24, 64, 64), name="Mixed_4c")(x)
        x = InceptionModule((128, 128, 256, 24, 64, 64), name="Mixed_4d")(x)
        x = InceptionModule((112, 144, 288, 32, 64, 64), name="Mixed_4e")(x)
        x = InceptionModule((256, 160, 320, 32, 128, 128), name="Mixed_4f")(x)
        x = _max_pool_same(x, (2, 2, 2), (2, 2, 2))
        x = InceptionModule((256, 160, 320, 32, 128, 128), name="Mixed_5b")(x)
        x = InceptionModule((384, 192, 384, 48, 128, 128), name="Mixed_5c")(x)
        # VFID feature: mean over (T, H, W) — reference core/metrics.py:565
        return jnp.mean(x, axis=(1, 2, 3))


def convert_i3d_state_dict(sd) -> dict:
    """Convert i3d_rgb_imagenet.pt to flax params (logits head dropped —
    the VFID feature never uses it)."""
    from propainter_tpu.convert.torch_to_jax import convert_state_dict

    return convert_state_dict(sd, skip=[r"^logits\."])
