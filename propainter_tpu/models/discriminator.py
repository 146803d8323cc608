"""T-PatchGAN discriminators (3-D convs + spectral norm), NDHWC.

Reference model/propainter.py:378-527 and the vendored spectral norm
(model/modules/spectral_norm.py). We use flax.linen.SpectralNorm (power
iteration state lives in the 'batch_stats' collection) instead of vendoring.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from propainter_tpu.models.layers import Conv3d, leaky_relu


class Discriminator(nn.Module):
    """3-D temporal PatchGAN: 6x spectral-norm Conv3d k=(3,5,5) s=(1,2,2).
    Reference model/propainter.py:378-451.

    __call__(x: (B, T, H, W, C), update_stats) -> (B, T', H', W', 128).
    """

    in_channels: int = 3
    use_sigmoid: bool = False
    nf: int = 32
    kd: int = 3  # temporal kernel; Discriminator_2D uses 1 (reference :454)

    @nn.compact
    def __call__(self, x, update_stats: bool = True):
        nf = self.nf
        kd = self.kd
        pd = (kd - 1) // 2

        # first conv uses padding=1 -> (1,1,1) in the 3-D reference variant,
        # (0,2,2) in the 2-D one; the rest use (pd,2,2).
        def block(i, feats, x, padding):
            conv = Conv3d(feats, (kd, 5, 5), (1, 2, 2), padding,
                          use_bias=False, name=f"conv_{i}")
            sn = nn.SpectralNorm(conv, collection_name="batch_stats")
            return sn(x, update_stats=update_stats)

        pad0 = (1, 1, 1) if kd == 3 else (0, 2, 2)
        x = leaky_relu(block(0, nf, x, pad0), 0.2)
        x = leaky_relu(block(2, nf * 2, x, (pd, 2, 2)), 0.2)
        x = leaky_relu(block(4, nf * 4, x, (pd, 2, 2)), 0.2)
        x = leaky_relu(block(6, nf * 4, x, (pd, 2, 2)), 0.2)
        x = leaky_relu(block(8, nf * 4, x, (pd, 2, 2)), 0.2)
        x = Conv3d(nf * 4, (kd, 5, 5), (1, 2, 2), (pd, 2, 2),
                   name="conv_10")(x)
        if self.use_sigmoid:
            x = jax.nn.sigmoid(x)
        return x


def Discriminator2D(**kwargs) -> Discriminator:
    """k=(1,5,5) variant. Reference model/propainter.py:454-527."""
    return Discriminator(kd=1, **kwargs)


def convert_discriminator_state_dict(sd) -> dict:
    """Convert a torch T-PatchGAN state dict (dis_*.pth) to flax params.

    Spectral-norm wrapped convs store `weight_orig` + power-iteration vectors
    (`weight_u`/`weight_v`); we take weight_orig as the kernel — flax's
    SpectralNorm re-estimates u/sigma in its own batch_stats within a few
    steps (reference model/modules/spectral_norm.py keeps the same raw
    weight + iteration state split).
    """
    from propainter_tpu.convert.torch_to_jax import convert_state_dict

    cleaned = {}
    for k, v in sd.items():
        if k.endswith(("weight_u", "weight_v")):
            continue
        cleaned[k.replace("weight_orig", "weight")] = v
    return convert_state_dict(cleaned)
