"""Harness for numerical parity tests against the PyTorch reference.

The reference repo (mounted read-only at /root/reference) is imported at test
time with random weights to produce golden activations; our JAX modules must
match after weight conversion. torchvision is not installed in this image, so
we provide our own pure-PyTorch `deform_conv2d` (written from the documented
DCNv2 semantics, not copied) and install it as a fake `torchvision` module
before importing reference code.

Only tests import this file; the framework itself never touches torch except
in the optional checkpoint converter.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import torch
import torch.nn.functional as F

REFERENCE_ROOT = "/root/reference"


def torch_deform_conv2d(
    input: torch.Tensor,
    offset: torch.Tensor,
    weight: torch.Tensor,
    bias: torch.Tensor | None = None,
    stride=(1, 1),
    padding=(1, 1),
    dilation=(1, 1),
    mask: torch.Tensor | None = None,
) -> torch.Tensor:
    """Pure-torch modulated deformable conv (DCNv2 semantics).

    input:  (B, C, H, W); offset: (B, 2*dg*K, Ho, Wo) interleaved (dy, dx);
    mask:   (B, dg*K, Ho, Wo); weight: (O, C/groups, kh, kw).
    Bilinear sampling with zeros outside. Supports groups=1 only (all the
    reference's deform convs use groups=1).
    """
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    B, C, H, W = input.shape
    O, Cw, kh, kw = weight.shape
    assert Cw == C
    K = kh * kw
    dg = offset.shape[1] // (2 * K)
    Ho = (H + 2 * padding[0] - dilation[0] * (kh - 1) - 1) // stride[0] + 1
    Wo = (W + 2 * padding[1] - dilation[1] * (kw - 1) - 1) // stride[1] + 1
    Cg = C // dg

    off = offset.view(B, dg, K, 2, Ho, Wo)
    if mask is None:
        m = torch.ones(B, dg, K, Ho, Wo, dtype=input.dtype)
    else:
        m = mask.view(B, dg, K, Ho, Wo)

    ys = torch.arange(Ho, dtype=input.dtype) * stride[0] - padding[0]
    xs = torch.arange(Wo, dtype=input.dtype) * stride[1] - padding[1]
    taps_y = torch.arange(kh, dtype=input.dtype) * dilation[0]
    taps_x = torch.arange(kw, dtype=input.dtype) * dilation[1]

    out = torch.zeros(B, O, Ho, Wo, dtype=input.dtype)
    cols = torch.zeros(B, K, C, Ho, Wo, dtype=input.dtype)
    for k in range(K):
        i, j = divmod(k, kw)
        py = ys.view(1, 1, Ho, 1) + taps_y[i] + off[:, :, k, 0]
        px = xs.view(1, 1, 1, Wo) + taps_x[j] + off[:, :, k, 1]
        # bilinear with zeros padding
        y0 = torch.floor(py)
        x0 = torch.floor(px)
        wy1 = py - y0
        wx1 = px - x0
        val = torch.zeros(B, dg, Cg, Ho, Wo, dtype=input.dtype)
        xg = input.view(B, dg, Cg, H, W)
        for (yc, xc, wy, wx) in (
            (y0, x0, 1 - wy1, 1 - wx1),
            (y0, x0 + 1, 1 - wy1, wx1),
            (y0 + 1, x0, wy1, 1 - wx1),
            (y0 + 1, x0 + 1, wy1, wx1),
        ):
            valid = (yc >= 0) & (yc <= H - 1) & (xc >= 0) & (xc <= W - 1)
            yi = yc.long().clamp(0, H - 1)
            xi = xc.long().clamp(0, W - 1)
            # gather per (B, dg)
            flat = xg.reshape(B, dg, Cg, H * W)
            idx = (yi * W + xi).view(B, dg, 1, -1).expand(B, dg, Cg, -1)
            g = torch.gather(flat, 3, idx).view(B, dg, Cg, Ho, Wo)
            w = (wy * wx * valid.to(input.dtype)).unsqueeze(2)
            val = val + g * w
        val = val * m[:, :, k].unsqueeze(2)
        cols[:, k] = val.reshape(B, C, Ho, Wo)

    wk = weight.view(O, C, K).permute(2, 1, 0)  # (K, C, O)
    out = torch.einsum("bkchw,kco->bohw", cols, wk)
    if bias is not None:
        out = out + bias.view(1, O, 1, 1)
    return out


def install_fake_torchvision():
    """Install a minimal fake torchvision exposing ops.deform_conv2d."""
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    ops = types.ModuleType("torchvision.ops")

    def deform_conv2d(input, offset, weight, bias=None, stride=(1, 1),
                      padding=(1, 1), dilation=(1, 1), mask=None):
        return torch_deform_conv2d(input, offset, weight, bias, stride,
                                   padding, dilation, mask)

    ops.deform_conv2d = deform_conv2d
    tv.ops = ops

    # minimal transforms shim (reference core/utils.py:15 imports it; only
    # Compose is exercised by the code paths we test)
    transforms = types.ModuleType("torchvision.transforms")

    class Compose:
        def __init__(self, fns):
            self.fns = fns

        def __call__(self, x):
            for f in self.fns:
                x = f(x)
            return x

    transforms.Compose = Compose
    tv.transforms = transforms

    # empty models.vgg: reference model/vgg_arch.py:5 imports it at module
    # level but only touches it when a VGG extractor is instantiated
    models = types.ModuleType("torchvision.models")
    vgg = types.ModuleType("torchvision.models.vgg")
    models.vgg = vgg
    tv.models = models

    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = ops
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.models"] = models
    sys.modules["torchvision.models.vgg"] = vgg


def install_fake_skimage():
    """skimage isn't installed; reference core/metrics.py imports it at module
    level (only the SSIM call actually uses it)."""
    if "skimage" in sys.modules:
        return
    sk = types.ModuleType("skimage")
    measure = types.ModuleType("skimage.measure")
    measure.compare_ssim = None
    sk.measure = measure
    sys.modules["skimage"] = sk
    sys.modules["skimage.measure"] = measure


def install_fake_lpips():
    """lpips isn't installed; reference core/loss.py imports it at module
    level (only LPIPSLoss instantiates lpips.LPIPS)."""
    if "lpips" in sys.modules:
        return
    lp = types.ModuleType("lpips")

    class LPIPS:  # placeholder: tests never instantiate LPIPSLoss
        def __init__(self, *a, **k):
            raise RuntimeError("lpips not available in tests")

    lp.LPIPS = LPIPS
    sys.modules["lpips"] = lp


def install_fake_omegaconf():
    """omegaconf isn't installed; the vendored Cutie tracker
    (web-demos/hugging_face/tracker/*) uses DictConfig for its config and
    OmegaConf.create on a plain dict with '${a.b}' interpolations."""
    if "omegaconf" in sys.modules:
        return
    oc = types.ModuleType("omegaconf")

    class DictConfig(dict):
        def __getattr__(self, k):
            try:
                v = self[k]
            except KeyError as e:
                raise AttributeError(k) from e
            return v

    def _resolve(node, root):
        if isinstance(node, dict):
            return DictConfig({k: _resolve(v, root) for k, v in node.items()})
        if isinstance(node, str) and node.startswith("${") and node.endswith("}"):
            cur = root
            for part in node[2:-1].split("."):
                cur = cur[part]
            return _resolve(cur, root)
        return node

    class OmegaConf:
        @staticmethod
        def create(d):
            return _resolve(d, d)

    oc.DictConfig = DictConfig
    oc.OmegaConf = OmegaConf
    sys.modules["omegaconf"] = oc


def import_cutie_module(name: str):
    """Import a module from the vendored Cutie tracker (the reference's web
    demo), with fake omegaconf and resnet downloads disabled."""
    install_fake_torchvision()
    install_fake_omegaconf()
    demo_root = REFERENCE_ROOT + "/web-demos/hugging_face"
    if demo_root not in sys.path:
        sys.path.insert(0, demo_root)
    import importlib

    resnet = importlib.import_module("tracker.model.utils.resnet")
    if not getattr(resnet, "_offline_patched", False):
        # pretrained=True would hit model_zoo (no network); parity tests use
        # random weights anyway
        _r18, _r50 = resnet.resnet18, resnet.resnet50

        def r18(pretrained=True, extra_dim=0):
            return _r18(False, extra_dim)

        def r50(pretrained=True, extra_dim=0):
            return _r50(False, extra_dim)

        resnet.resnet18, resnet.resnet50 = r18, r50
        resnet._offline_patched = True
    return importlib.import_module(name)


def add_reference_to_path():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)


def import_reference_module(name: str):
    """Import a module from the reference repo (with fake torchvision)."""
    install_fake_torchvision()
    install_fake_skimage()
    install_fake_lpips()
    add_reference_to_path()
    import importlib

    return importlib.import_module(name)


def to_nchw(x: np.ndarray) -> torch.Tensor:
    """NHWC numpy -> NCHW torch."""
    return torch.from_numpy(np.ascontiguousarray(np.moveaxis(x, -1, -3)))


def to_nhwc(t: torch.Tensor) -> np.ndarray:
    """NCHW(-ish) torch -> NHWC numpy (moves dim -3 to last)."""
    return np.ascontiguousarray(np.moveaxis(t.detach().numpy(), -3, -1))
