"""Independent SSIM oracle vs core/metrics.calculate_ssim.

The reference protocol is skimage `compare_ssim(img1, img2, data_range=255,
multichannel=True, win_size=65)` (reference core/metrics.py:39-54) with the
skimage defaults gaussian_weights=False and use_sample_covariance=True.
skimage is not installed in this image, so this file transcribes the
algorithm from first principles, with NO shared code with the production
implementation (which uses scipy.ndimage.uniform_filter):

  * per-window moments computed brute-force over every FULLY-VALID window
    via numpy.lib.stride_tricks.sliding_window_view — this is exactly what
    survives skimage's crop of pad=(win-1)//2 on each side, because the
    uniform filter at distance >= pad from the border sees only valid data;
  * sample (N/(N-1)) covariance normalization;
  * per-channel SSIM averaged for multichannel.

If calculate_ssim ever drifts from the skimage semantics (crop convention,
uniform vs gaussian window, data_range, covariance normalization), these
tests catch it.
"""

import numpy as np
import pytest

from propainter_tpu.core.metrics import calculate_ssim


def _ssim_oracle_single(im1, im2, win_size, data_range=255.0):
    """Brute-force single-channel SSIM over valid windows (float64)."""
    from numpy.lib.stride_tricks import sliding_window_view

    im1 = im1.astype(np.float64)
    im2 = im2.astype(np.float64)
    w1 = sliding_window_view(im1, (win_size, win_size))  # (Hv, Wv, w, w)
    w2 = sliding_window_view(im2, (win_size, win_size))
    NP = win_size * win_size
    cov_norm = NP / (NP - 1.0)

    ux = w1.mean(axis=(-2, -1))
    uy = w2.mean(axis=(-2, -1))
    # sample variance/covariance: E[xy] - E[x]E[y], scaled by N/(N-1)
    vx = cov_norm * ((w1 * w1).mean(axis=(-2, -1)) - ux * ux)
    vy = cov_norm * ((w2 * w2).mean(axis=(-2, -1)) - uy * uy)
    vxy = cov_norm * ((w1 * w2).mean(axis=(-2, -1)) - ux * uy)

    C1 = (0.01 * data_range) ** 2
    C2 = (0.03 * data_range) ** 2
    S = ((2 * ux * uy + C1) * (2 * vxy + C2)) / (
        (ux * ux + uy * uy + C1) * (vx + vy + C2))
    return S.mean()


def _ssim_oracle(img1, img2, win_size):
    """Multichannel: per-channel SSIM averaged (skimage multichannel=True)."""
    return float(np.mean([
        _ssim_oracle_single(img1[..., c], img2[..., c], win_size)
        for c in range(img1.shape[-1])
    ]))


@pytest.mark.parametrize("win_size,shape", [
    (7, (24, 30, 3)),    # small window: many windows, heavy edge influence
    (65, (80, 96, 3)),   # the protocol window (valid grid 16x32)
    (65, (65, 65, 1)),   # degenerate: exactly one valid window
])
def test_ssim_matches_independent_oracle(win_size, shape):
    rng = np.random.default_rng(7)
    img1 = rng.integers(0, 256, shape).astype(np.float64)
    img2 = np.clip(
        img1 + rng.normal(0, 20, shape), 0, 255).astype(np.float64)
    ours = calculate_ssim(img1, img2, win_size=win_size)
    oracle = _ssim_oracle(img1, img2, win_size)
    assert ours == pytest.approx(oracle, abs=1e-7)


def test_ssim_structured_images():
    # smooth gradient vs shifted copy: high but non-trivial SSIM — checks
    # the covariance normalization and crop against structure, not noise
    H, W = 90, 110
    yy, xx = np.mgrid[0:H, 0:W]
    img1 = np.stack([(yy * 2.0) % 256, (xx * 1.7) % 256,
                     ((xx + yy) * 1.1) % 256], axis=-1)
    img2 = np.roll(img1, (1, 2), axis=(0, 1))
    ours = calculate_ssim(img1, img2, win_size=65)
    oracle = _ssim_oracle(img1, img2, 65)
    assert ours == pytest.approx(oracle, abs=1e-7)
    assert 0.0 < ours < 1.0


def test_ssim_identity_and_range():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (70, 70, 3)).astype(np.float64)
    assert calculate_ssim(img, img) == pytest.approx(1.0)
    noisy = np.clip(img + rng.normal(0, 60, img.shape), 0, 255)
    assert calculate_ssim(img, noisy) < calculate_ssim(
        img, np.clip(img + rng.normal(0, 10, img.shape), 0, 255))
