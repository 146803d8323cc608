"""VGG feature extractor / LPIPS / flow visualization parity tests."""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from propainter_tpu.models.vgg import (
    VGGFeatureExtractor, LPIPSVgg, VGG_LAYOUTS,
    convert_vgg_state_dict, convert_lpips_state_dict)
from propainter_tpu.core import losses as L
from propainter_tpu.utils.flow_viz import flow_to_image
from tests.torch_ref import import_reference_module


def _torch_vgg_features(vgg_type: str) -> tnn.Sequential:
    """Build the torchvision-layout `features` Sequential with random weights
    (torchvision itself is not installed)."""
    chans = {1: 64, 2: 128, 3: 256, 4: 512, 5: 512}
    layers = []
    c_in = 3
    for name in VGG_LAYOUTS[vgg_type]:
        if name.startswith("conv"):
            c_out = chans[int(name[4])]
            layers.append(tnn.Conv2d(c_in, c_out, 3, padding=1))
            c_in = c_out
        elif name.startswith("relu"):
            layers.append(tnn.ReLU())
        else:
            layers.append(tnn.MaxPool2d(2, 2))
    return tnn.Sequential(*layers)


def test_vgg19_feature_parity(rng):
    torch.manual_seed(0)
    feats = _torch_vgg_features("vgg19")
    sd = {f"features.{i}.{k}": v for i, m in enumerate(feats)
          for k, v in m.state_dict().items()}
    taps = ("relu1_2", "relu3_4", "conv5_4")
    params = convert_vgg_state_dict(sd, "vgg19")

    x = rng.standard_normal((1, 32, 48, 3), np.float32) * 0.5 + 0.5
    model = VGGFeatureExtractor(taps, "vgg19", use_input_norm=True)
    out = model.apply({"params": params}, jnp.asarray(x))

    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    xt = (torch.from_numpy(x).permute(0, 3, 1, 2) - mean) / std
    layout = VGG_LAYOUTS["vgg19"]
    with torch.no_grad():
        cur = xt
        ref = {}
        for name, m in zip(layout, feats):
            cur = m(cur)
            if name in taps:
                ref[name] = cur.permute(0, 2, 3, 1).numpy()
    for t in taps:
        np.testing.assert_allclose(np.asarray(out[t]), ref[t],
                                   rtol=2e-4, atol=2e-4)


def test_lpips_shape_and_zero_distance(rng):
    x = rng.standard_normal((2, 16, 16, 3), np.float32).clip(-1, 1)
    model = LPIPSVgg()
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                        jnp.asarray(x))["params"]
    d_same = model.apply({"params": params}, jnp.asarray(x), jnp.asarray(x))
    assert d_same.shape == (2,)
    np.testing.assert_allclose(np.asarray(d_same), 0.0, atol=1e-6)
    y = np.flip(x, axis=1).copy()
    d_diff = model.apply({"params": params}, jnp.asarray(x), jnp.asarray(y))
    assert np.all(np.asarray(d_diff) > 0)

    val = L.lpips_loss(
        lambda a, b: model.apply({"params": params}, a, b),
        jnp.asarray(x), jnp.asarray(y))
    assert np.isfinite(float(val))


def test_lpips_converter_roundtrip():
    feats = _torch_vgg_features("vgg16")
    vgg_sd = {f"features.{i}.{k}": v for i, m in enumerate(feats)
              for k, v in m.state_dict().items()}
    lpips_sd = {f"lin{i}.model.1.weight": torch.rand(1, c, 1, 1)
                for i, c in enumerate([64, 128, 256, 512, 512])}
    params = convert_lpips_state_dict(lpips_sd, vgg_sd)
    x = np.zeros((1, 16, 16, 3), np.float32)
    d = LPIPSVgg().apply({"params": params}, jnp.asarray(x), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)


def test_perceptual_loss_runs(rng):
    x = rng.standard_normal((1, 16, 16, 3), np.float32)
    gt = rng.standard_normal((1, 16, 16, 3), np.float32)
    taps = {"relu1_2": 1.0, "relu2_2": 0.5}
    model = VGGFeatureExtractor(tuple(taps), "vgg19")
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    p, s = L.perceptual_loss(
        lambda im: model.apply({"params": params}, im), taps,
        jnp.asarray(x), jnp.asarray(gt), style_weight=1.0)
    assert np.isfinite(float(p)) and np.isfinite(float(s))


def test_flow_to_image_matches_reference(rng):
    ref = import_reference_module("RAFT.utils.flow_viz_pt")
    flow = rng.standard_normal((2, 20, 24, 2), np.float32) * 5
    ours = flow_to_image(flow)
    theirs = (ref.flow_to_image(
        torch.from_numpy(flow).permute(0, 3, 1, 2))
        .permute(0, 2, 3, 1).numpy())
    assert ours.dtype == np.uint8
    np.testing.assert_array_equal(ours, theirs)
