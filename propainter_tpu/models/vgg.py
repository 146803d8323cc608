"""VGG feature extractor + LPIPS network in JAX/flax (NHWC).

Re-designs reference model/vgg_arch.py:51-157 (VGGFeatureExtractor used by
PerceptualLoss, core/loss.py:6-114) and the `lpips.LPIPS(net='vgg')` network
used by LPIPSLoss (core/loss.py:116-141) as pure flax modules.

Weights are converted from torchvision-format state dicts
(`features.{i}.weight` -> conv name per `NAMES` layout) and from the lpips
package's linear-head checkpoints via `convert_vgg_state_dict` /
`convert_lpips_state_dict`. No torchvision/lpips import is needed at runtime.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


# Layer layouts of the torchvision VGG `features` Sequential.
# Mirrors reference model/vgg_arch.py:8-31 (behavioral spec, not a copy: this
# is the standard public VGG architecture definition).
VGG_LAYOUTS = {
    "vgg16": [
        "conv1_1", "relu1_1", "conv1_2", "relu1_2", "pool1",
        "conv2_1", "relu2_1", "conv2_2", "relu2_2", "pool2",
        "conv3_1", "relu3_1", "conv3_2", "relu3_2", "conv3_3", "relu3_3",
        "pool3",
        "conv4_1", "relu4_1", "conv4_2", "relu4_2", "conv4_3", "relu4_3",
        "pool4",
        "conv5_1", "relu5_1", "conv5_2", "relu5_2", "conv5_3", "relu5_3",
        "pool5",
    ],
    "vgg19": [
        "conv1_1", "relu1_1", "conv1_2", "relu1_2", "pool1",
        "conv2_1", "relu2_1", "conv2_2", "relu2_2", "pool2",
        "conv3_1", "relu3_1", "conv3_2", "relu3_2", "conv3_3", "relu3_3",
        "conv3_4", "relu3_4", "pool3",
        "conv4_1", "relu4_1", "conv4_2", "relu4_2", "conv4_3", "relu4_3",
        "conv4_4", "relu4_4", "pool4",
        "conv5_1", "relu5_1", "conv5_2", "relu5_2", "conv5_3", "relu5_3",
        "conv5_4", "relu5_4", "pool5",
    ],
}

_CHANNELS = {1: 64, 2: 128, 3: 256, 4: 512, 5: 512}

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class VGGFeatureExtractor(nn.Module):
    """Runs VGG up to the deepest requested layer, returning named features.

    Args (match reference model/vgg_arch.py:51-157 semantics):
      layer_names: which activations to return (e.g. ('relu1_2', 'conv5_4')).
      vgg_type: 'vgg16' | 'vgg19'.
      use_input_norm: ImageNet-normalize input in [0, 1].
      range_norm: map [-1, 1] input to [0, 1] first.
    """

    layer_names: Sequence[str] = ("conv5_4",)
    vgg_type: str = "vgg19"
    use_input_norm: bool = True
    range_norm: bool = False

    @nn.compact
    def __call__(self, x):
        layout = VGG_LAYOUTS[self.vgg_type]
        max_idx = max(layout.index(n) for n in self.layer_names)
        if self.range_norm:
            x = (x + 1.0) / 2.0
        if self.use_input_norm:
            x = (x - jnp.asarray(IMAGENET_MEAN, x.dtype)) / jnp.asarray(
                IMAGENET_STD, x.dtype)
        out = {}
        for i, name in enumerate(layout[: max_idx + 1]):
            if name.startswith("conv"):
                stage = int(name[4])
                x = nn.Conv(_CHANNELS[stage], (3, 3), padding=1, name=name)(x)
            elif name.startswith("relu"):
                x = nn.relu(x)
            elif name.startswith("pool"):
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            if name in self.layer_names:
                out[name] = x
        return out


class LPIPSVgg(nn.Module):
    """LPIPS perceptual distance with a VGG16 backbone.

    Matches the public LPIPS formulation used by `lpips.LPIPS(net='vgg',
    spatial=False)` (reference core/loss.py:122): inputs scaled by the LPIPS
    `ScalingLayer`, VGG16 features at relu{1_2,2_2,3_3,4_3,5_3},
    channel-unit-normalized, squared difference, learned 1x1 linear head per
    tap, spatial mean, summed over taps.
    """

    TAPS = ("relu1_2", "relu2_2", "relu3_3", "relu4_3", "relu5_3")
    # lpips package ScalingLayer constants (shift/scale for [-1,1] inputs)
    SHIFT = (-0.030, -0.088, -0.188)
    SCALE = (0.458, 0.448, 0.450)

    @nn.compact
    def __call__(self, pred, target):
        """pred/target: (B, H, W, 3) in [-1, 1]. Returns (B,) distances."""
        shift = jnp.asarray(self.SHIFT, pred.dtype)
        scale = jnp.asarray(self.SCALE, pred.dtype)
        vgg = VGGFeatureExtractor(
            self.TAPS, "vgg16", use_input_norm=False, range_norm=False,
            name="net")

        def feats(x):
            return vgg((x - shift) / scale)

        fa = feats(pred)
        fb = feats(target)
        total = 0.0
        for i, tap in enumerate(self.TAPS):
            a = _unit_normalize(fa[tap])
            b = _unit_normalize(fb[tap])
            diff = (a - b) ** 2
            w = self.param(f"lin{i}", nn.initializers.ones, (diff.shape[-1],))
            # lpips lin layers are 1x1 convs with non-negative weights
            d = jnp.sum(diff * jnp.abs(w), axis=-1)
            total = total + jnp.mean(d, axis=(1, 2))
        return total


def _unit_normalize(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / (norm + eps)


def convert_vgg_state_dict(sd, vgg_type: str = "vgg19") -> dict:
    """torchvision `vgg*.pth` (features.N.{weight,bias}) -> flax params."""
    layout = VGG_LAYOUTS[vgg_type]
    conv_names = [n for n in layout if n.startswith("conv")]
    # torchvision indexes convs at the positions of conv layers in `features`
    conv_idx = [i for i, n in enumerate(layout) if n.startswith("conv")]
    params = {}
    for name, i in zip(conv_names, conv_idx):
        w = np.asarray(sd[f"features.{i}.weight"])  # (O, I, kh, kw)
        b = np.asarray(sd[f"features.{i}.bias"])
        params[name] = {
            "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),  # HWIO
            "bias": jnp.asarray(b),
        }
    return params


def convert_lpips_state_dict(lpips_sd, vgg_sd) -> dict:
    """lpips package checkpoint (lin{i}.model.1.weight) + torchvision vgg16
    state dict -> LPIPSVgg flax params."""
    params = {"net": convert_vgg_state_dict(vgg_sd, "vgg16")}
    for i in range(5):
        for key in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if key in lpips_sd:
                w = np.asarray(lpips_sd[key])  # (1, C, 1, 1)
                params[f"lin{i}"] = jnp.asarray(w.reshape(-1))
                break
        else:
            raise KeyError(f"lin{i} weight not found in lpips state dict")
    return params
