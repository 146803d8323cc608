"""Evaluation metrics: PSNR, SSIM (skimage-exact, win_size=65), EPE, VFID.

Matches reference core/metrics.py:12-150 — in particular the SSIM convention
(uniform window 65, sample covariance, data_range=255, per-channel averaged)
that the published ProPainter numbers use; skimage is not installed in this
image so the formula is implemented directly.
"""

from __future__ import annotations

import numpy as np
import scipy.ndimage
from scipy import linalg


def calculate_psnr(img1: np.ndarray, img2: np.ndarray) -> float:
    """PSNR for [0, 255] images. Reference core/metrics.py:20-37."""
    img1 = img1.astype(np.float64)
    img2 = img2.astype(np.float64)
    mse = np.mean((img1 - img2) ** 2)
    if mse == 0:
        return float("inf")
    return 20.0 * np.log10(255.0 / np.sqrt(mse))


def _ssim_single(im1, im2, win_size=65, data_range=255.0):
    """skimage structural_similarity, gaussian_weights=False,
    use_sample_covariance=True (the defaults the reference hits)."""
    K1, K2 = 0.01, 0.03
    NP = win_size ** 2
    cov_norm = NP / (NP - 1)

    def f(x):
        return scipy.ndimage.uniform_filter(x, size=win_size)

    ux = f(im1)
    uy = f(im2)
    uxx = f(im1 * im1)
    uyy = f(im2 * im2)
    uxy = f(im1 * im2)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    A1 = 2 * ux * uy + C1
    A2 = 2 * vxy + C2
    B1 = ux ** 2 + uy ** 2 + C1
    B2 = vx + vy + C2
    S = (A1 * A2) / (B1 * B2)

    pad = (win_size - 1) // 2
    return S[pad:-pad, pad:-pad].mean()


def calculate_ssim(img1: np.ndarray, img2: np.ndarray,
                   win_size: int = 65) -> float:
    """Multichannel SSIM, per-channel averaged (skimage multichannel=True).
    img1/img2: (H, W, C) in [0, 255]."""
    img1 = img1.astype(np.float64)
    img2 = img2.astype(np.float64)
    vals = [
        _ssim_single(img1[..., c], img2[..., c], win_size)
        for c in range(img1.shape[-1])
    ]
    return float(np.mean(vals))


def calc_psnr_and_ssim(img1, img2):
    """Reference core/metrics.py:39-54."""
    return calculate_psnr(img1, img2), calculate_ssim(img1, img2)


def calculate_epe(flow1: np.ndarray, flow2: np.ndarray) -> float:
    """Mean end-point error; flows (..., 2). Reference core/metrics.py:12-17."""
    return float(np.mean(np.sqrt(np.sum((flow1 - flow2) ** 2, axis=-1))))


def calculate_frechet_distance(mu1, sigma1, mu2, sigma2, eps=1e-6) -> float:
    """Frechet distance between gaussians (standard FID formula).
    Reference core/metrics.py:99-150."""
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def calculate_vfid(real_activations: list[np.ndarray],
                   fake_activations: list[np.ndarray]) -> float:
    """VFID over per-video I3D features. Reference core/metrics.py:85-97."""
    m1 = np.mean(real_activations, axis=0)
    m2 = np.mean(fake_activations, axis=0)
    s1 = np.cov(real_activations, rowvar=False)
    s2 = np.cov(fake_activations, rowvar=False)
    return calculate_frechet_distance(m1, s1, m2, s2)


def calculate_warping_error(frames: np.ndarray, flows_f: np.ndarray,
                            flows_b: np.ndarray) -> float:
    """Temporal warping error E_warp (Lai et al. 2018 formulation).

    The reference delegates E_warp to the external fast_blind_video_
    consistency repo (README.md:281); this is a native implementation so the
    full eval protocol runs in one place: for consecutive frames,
    occlusion-masked MSE between frame t and frame t+1 backward-warped by the
    forward flow, with the occlusion mask from forward-backward consistency
    (|F_f + warp(F_b)|^2 < 0.01 (|F_f|^2 + |warp(F_b)|^2) + 0.5).

    Args:
      frames: (T, H, W, 3) uint8 or [0,1] float.
      flows_f: (T-1, H, W, 2) forward flow t -> t+1.
      flows_b: (T-1, H, W, 2) backward flow t+1 -> t.
    Returns:
      mean occlusion-masked per-pixel MSE (frames scaled to [0, 1]).
    """
    import jax.numpy as jnp
    from propainter_tpu.ops.warp import flow_warp, fb_consistency_check

    f = frames.astype(np.float32)
    if f.max() > 1.5:
        f = f / 255.0
    cur = jnp.asarray(f[:-1])
    nxt = jnp.asarray(f[1:])
    ff = jnp.asarray(flows_f.astype(np.float32))
    fb = jnp.asarray(flows_b.astype(np.float32))
    warped = flow_warp(nxt, ff, "bilinear")
    valid = fb_consistency_check(ff, fb)  # (T-1, H, W, 1), 1 = non-occluded
    err = jnp.sum(valid * jnp.sum((cur - warped) ** 2, -1, keepdims=True))
    denom = jnp.maximum(jnp.sum(valid) * 3.0, 1.0)
    return float(err / denom)
