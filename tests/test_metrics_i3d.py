"""Metrics + I3D parity tests."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from tests.torch_ref import import_reference_module


def test_psnr_matches_reference(rng):
    from propainter_tpu.core.metrics import calculate_psnr
    ref = import_reference_module("core.metrics")
    a = rng.uniform(0, 255, (32, 48, 3))
    b = rng.uniform(0, 255, (32, 48, 3))
    np.testing.assert_allclose(
        calculate_psnr(a, b), ref.calculate_psnr(a, b), rtol=1e-10)


def test_epe_matches_reference(rng):
    from propainter_tpu.core.metrics import calculate_epe
    ref = import_reference_module("core.metrics")
    f1 = rng.standard_normal((2, 2, 16, 16)).astype(np.float32)
    f2 = rng.standard_normal((2, 2, 16, 16)).astype(np.float32)
    ours = calculate_epe(np.moveaxis(f1, 1, -1), np.moveaxis(f2, 1, -1))
    theirs = ref.calculate_epe(torch.from_numpy(f1), torch.from_numpy(f2))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_ssim_formula_sanity(rng):
    """SSIM(x, x) == 1; SSIM decreases with noise; win crop handled."""
    from propainter_tpu.core.metrics import calculate_ssim
    img = rng.uniform(0, 255, (128, 160, 3))
    assert calculate_ssim(img, img) == pytest.approx(1.0)
    noisy = np.clip(img + rng.normal(0, 25, img.shape), 0, 255)
    s = calculate_ssim(img, noisy)
    assert 0 < s < 0.99


def test_vfid_frechet(rng):
    from propainter_tpu.core.metrics import calculate_vfid
    a = [rng.standard_normal(64) for _ in range(20)]
    b = [x + 0.5 for x in a]
    assert calculate_vfid(a, a) == pytest.approx(0.0, abs=1e-4)
    assert calculate_vfid(a, b) > 0.1


def test_i3d_parity(rng):
    from propainter_tpu.models.i3d import InceptionI3d, convert_i3d_state_dict
    ref = import_reference_module("core.metrics")
    torch.manual_seed(0)
    tm = ref.InceptionI3d(400, in_channels=3, final_endpoint="Logits")
    tm.eval()

    B, T, H, W = 1, 16, 64, 64
    x = rng.uniform(-1, 1, (B, T, H, W, 3)).astype(np.float32)
    xt = torch.from_numpy(np.moveaxis(x, -1, 1).copy())  # (B, 3, T, H, W)
    with torch.no_grad():
        feat_t = tm.extract_features(xt, "Logits")

    model = InceptionI3d()
    params = convert_i3d_state_dict(tm.state_dict())
    feat = model.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(feat), feat_t.numpy(), rtol=2e-3,
                               atol=2e-3)


def test_mask_synthesis_distribution():
    from propainter_tpu.core.mask_synthesis import (
        create_random_shape_with_random_motion)
    import random
    random.seed(0)
    np.random.seed(0)
    masks = create_random_shape_with_random_motion(10, 240, 432)
    assert masks.shape == (10, 240, 432)
    assert masks.dtype == np.uint8
    frac = masks.mean()
    assert 0.005 < frac < 0.6  # plausible hole fraction
