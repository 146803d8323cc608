"""Training losses.

Reimplements (NHWC, jax) the reference's loss suite:
  * hole/valid L1 (core/trainer.py:403-427 weighting),
  * hinge / lsgan / nsgan adversarial (core/loss.py:144-180),
  * flow completion losses: masked L1, 1st/2nd-order charbonnier smoothness,
    ternary census warp (model/modules/flow_comp_raft.py:59-204,
    flow_loss_utils.py:89-141),
  * pos/neg-weighted edge BCE (model/modules/flow_comp_raft.py:207-244).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from propainter_tpu.ops.warp import flow_warp


# ---------------------------------------------------------------------------
# Generic / GAN
# ---------------------------------------------------------------------------


def l1(x, y):
    return jnp.mean(jnp.abs(x - y))


def hole_valid_l1(pred, gt, mask, hole_weight=1.0, valid_weight=1.0):
    """ProPainter generator reconstruction losses (core/trainer.py:403-412)."""
    hole = l1(pred * mask, gt * mask) / jnp.mean(mask)
    valid = l1(pred * (1 - mask), gt * (1 - mask)) / jnp.mean(1 - mask)
    return hole_weight * hole + valid_weight * valid, hole, valid


def _bce(probs, target: float):
    """torch nn.BCELoss on probabilities, incl. its log clamp at -100
    (the reference's nsgan discriminator outputs sigmoid probabilities:
    use_sigmoid = GAN_LOSS != 'hinge', core/trainer.py:89-96)."""
    logp = jnp.maximum(jnp.log(probs), -100.0)
    log1mp = jnp.maximum(jnp.log1p(-probs), -100.0)
    return -jnp.mean(target * logp + (1.0 - target) * log1mp)


def adversarial_g_loss(fake_out, gan_type: str = "hinge"):
    """Generator-side GAN loss (core/loss.py:160-180, is_disc=False).

    fake_out: raw logits for 'hinge'; sigmoid probabilities for
    'nsgan'/'lsgan' (the discriminator applies the sigmoid itself when
    use_sigmoid=True, matching reference core/trainer.py:89-96 where
    use_sigmoid = GAN_LOSS != 'hinge')."""
    if gan_type == "hinge":
        return -jnp.mean(fake_out)
    if gan_type == "lsgan":
        return jnp.mean((fake_out - 1.0) ** 2)
    if gan_type == "nsgan":
        return _bce(fake_out, 1.0)
    raise ValueError(gan_type)


def adversarial_d_loss(real_out, fake_out, gan_type: str = "hinge"):
    """Discriminator-side GAN loss, (real+fake)/2 (core/trainer.py:430-441).
    Input convention as in adversarial_g_loss."""
    if gan_type == "hinge":
        real = jnp.mean(jax.nn.relu(1.0 - real_out))
        fake = jnp.mean(jax.nn.relu(1.0 + fake_out))
        return (real + fake) / 2.0
    if gan_type == "lsgan":
        return (jnp.mean((real_out - 1.0) ** 2)
                + jnp.mean(fake_out ** 2)) / 2.0
    if gan_type == "nsgan":
        return (_bce(real_out, 1.0) + _bce(fake_out, 0.0)) / 2.0
    raise ValueError(gan_type)


# ---------------------------------------------------------------------------
# Perceptual losses (VGG / LPIPS)
# ---------------------------------------------------------------------------


def perceptual_loss(vgg_apply, layer_weights: dict, x, gt,
                    criterion: str = "l1", style_weight: float = 0.0):
    """Layer-weighted VGG perceptual (+ optional gram style) loss.
    Reference core/loss.py:6-114 (PerceptualLoss.forward).

    Args:
      vgg_apply: fn(images (B,H,W,3)) -> {layer_name: (B,h,w,c)} — a bound
        VGGFeatureExtractor.apply.
      layer_weights: {layer_name: weight}.
    Returns (percep_loss, style_loss) — style_loss is None if weight == 0.
    """
    xf = vgg_apply(x)
    gf = jax.tree.map(jax.lax.stop_gradient, vgg_apply(gt))

    def crit(a, b):
        if criterion == "l1":
            return jnp.mean(jnp.abs(a - b))
        if criterion in ("l2", "mse"):
            return jnp.mean(jnp.square(a - b))
        if criterion == "fro":
            return jnp.linalg.norm((a - b).reshape(-1))
        raise ValueError(criterion)

    percep = sum(crit(xf[k], gf[k]) * w for k, w in layer_weights.items())

    style = None
    if style_weight > 0:
        def gram(f):
            b, h, w, c = f.shape
            f2 = f.reshape(b, h * w, c)
            return jnp.einsum("bnc,bnd->bcd", f2, f2) / (c * h * w)

        style = sum(
            crit(gram(xf[k]), gram(gf[k])) * w
            for k, w in layer_weights.items()) * style_weight
    return percep, style


def lpips_loss(lpips_apply, pred, gt, loss_weight: float = 1.0,
               use_input_norm: bool = True, range_norm: bool = True):
    """LPIPS distance, averaged over the batch. Reference core/loss.py:116-141.

    Faithfully reproduces the reference's LPIPSLoss(use_input_norm=True,
    range_norm=True): [-1,1] inputs are mapped to [0,1] then ImageNet
    normalized *before* the lpips net (which applies its own scaling layer on
    top — a reference quirk we keep for parity). lpips_apply is a bound
    LPIPSVgg.apply.
    """
    if range_norm:
        pred = (pred + 1.0) / 2.0
        gt = (gt + 1.0) / 2.0
    if use_input_norm:
        mean = jnp.asarray([0.485, 0.456, 0.406], pred.dtype)
        std = jnp.asarray([0.229, 0.224, 0.225], pred.dtype)
        pred = (pred - mean) / std
        gt = (gt - mean) / std
    return loss_weight * jnp.mean(lpips_apply(pred, jax.lax.stop_gradient(gt)))


# ---------------------------------------------------------------------------
# Flow-completion losses
# ---------------------------------------------------------------------------


def charbonnier(x, mask=None, alpha=0.45, beta=1.0, eps=0.001):
    """Generalized charbonnier, normalized by total element count
    (model/modules/flow_comp_raft.py:94-110)."""
    norm = float(np.prod(x.shape))
    error = jnp.power(jnp.square(x * beta) + eps * eps, alpha)
    if mask is not None:
        error = mask * error
    return jnp.sum(error) / norm


def _conv2d_fixed(x, kernels):
    """Depthwise-style conv of (B, H, W, 1) with a stack of 3x3 kernels
    -> (B, H, W, K)."""
    k = jnp.asarray(kernels, x.dtype)  # (K, 3, 3)
    k = k.transpose(1, 2, 0)[:, :, None, :]  # (3, 3, 1, K)
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


_FILTER_X = np.array([[0, 0, 0], [0, 1, -1], [0, 0, 0]], np.float32)
_FILTER_Y = np.array([[0, 0, 0], [0, 1, 0], [0, -1, 0]], np.float32)
_FILTER_X2 = np.array([[0, 0, 0], [1, -2, 1], [0, 0, 0]], np.float32)
_FILTER_Y2 = np.array([[0, 1, 0], [0, -2, 0], [0, 1, 0]], np.float32)
_FILTER_D1 = np.array([[1, 0, 0], [0, -2, 0], [0, 0, 1]], np.float32)
_FILTER_D2 = np.array([[0, 0, 1], [0, -2, 0], [1, 0, 0]], np.float32)


def smoothness_loss(flow, cmask):
    """1st-order charbonnier smoothness (flow (B,H,W,2), cmask (B,H,W,1)).
    Reference flow_comp_raft.py:59-84 (note: the reference computes but does
    not apply the border mask to the loss — we match that)."""
    ks = np.stack([_FILTER_X, _FILTER_Y])
    du = _conv2d_fixed(flow[..., 0:1], ks)
    dv = _conv2d_fixed(flow[..., 1:2], ks)
    return charbonnier(du, cmask) + charbonnier(dv, cmask)


def second_order_loss(flow, cmask):
    """2nd-order charbonnier smoothness. Reference flow_comp_raft.py:87-140."""
    ks = np.stack([_FILTER_X2, _FILTER_Y2, _FILTER_D1, _FILTER_D2])
    du = _conv2d_fixed(flow[..., 0:1], ks)
    dv = _conv2d_fixed(flow[..., 1:2], ks)
    return charbonnier(du, cmask) + charbonnier(dv, cmask)


def rgb2gray(img):
    """(B, H, W, 3) -> (B, H, W, 1). Reference flow_loss_utils.py:83-86
    (note the reference's 0.110 blue weight)."""
    g = img[..., 0] * 0.299 + img[..., 1] * 0.587 + 0.110 * img[..., 2]
    return g[..., None]


def ternary_transform(image, max_distance=1):
    """Census transform. Reference flow_loss_utils.py:89-99."""
    patch_size = 2 * max_distance + 1
    intensities = rgb2gray(image) * 255.0
    out_channels = patch_size * patch_size
    w = np.eye(out_channels, dtype=np.float32).reshape(
        out_channels, patch_size, patch_size)
    patches = _conv2d_fixed(intensities, w)
    transf = patches - intensities
    return transf / jnp.sqrt(0.81 + jnp.square(transf))


def hamming_distance(t1, t2):
    dist = jnp.square(t1 - t2)
    dist_norm = dist / (0.1 + dist)
    return jnp.sum(dist_norm, axis=-1, keepdims=True)


def ternary_loss(flow_comp, flow_gt, mask, current_frame, shift_frame):
    """Census warp loss. Reference flow_comp_raft.py:163-171."""
    warped_sc = flow_warp(shift_frame, flow_gt)
    noc_mask = jnp.exp(
        -50.0 * jnp.square(
            jnp.sum(jnp.abs(current_frame - warped_sc), axis=-1)))[..., None]
    warped_comp_sc = flow_warp(shift_frame, flow_comp)
    t1 = ternary_transform(current_frame)
    t21 = ternary_transform(warped_comp_sc)
    dist = hamming_distance(t1, t21)
    return jnp.mean(dist * noc_mask * mask) / jnp.mean(mask)


def flow_loss(pred_flows, gt_flows, masks, frames):
    """Combined flow-completion loss (L1 + smoothness + census warp).
    Reference flow_comp_raft.py:173-204.

    Args:
      pred_flows/gt_flows: [fwd, bwd], each (B, T-1, H, W, 2).
      masks: (B, T, H, W, 1); frames: (B, T, H, W, 3).
    """
    loss = 0.0
    warp_loss = 0.0
    m = [masks[:, :-1], masks[:, 1:]]
    frames0, frames1 = frames[:, :-1], frames[:, 1:]
    currents = [frames0, frames1]
    nexts = [frames1, frames0]
    B, Tm1, H, W, _ = pred_flows[0].shape

    for i in range(2):
        combined = pred_flows[i] * m[i] + gt_flows[i] * (1 - m[i])
        l1_loss = (l1(pred_flows[i] * m[i], gt_flows[i] * m[i])
                   / jnp.mean(m[i]))
        l1_loss += (l1(pred_flows[i] * (1 - m[i]), gt_flows[i] * (1 - m[i]))
                    / jnp.mean(1 - m[i]))
        cf = combined.reshape(-1, H, W, 2)
        mf = m[i].reshape(-1, H, W, 1)
        loss += l1_loss + smoothness_loss(cf, mf) + second_order_loss(cf, mf)
        warp_loss += ternary_loss(
            cf, gt_flows[i].reshape(-1, H, W, 2), mf,
            currents[i].reshape(-1, H, W, 3), nexts[i].reshape(-1, H, W, 3))
    return loss, warp_loss


def flow_simple_loss(pred_flows, gt_flows):
    """Plain L1 of predicted flow vs area-downscaled, magnitude-rescaled GT
    flow. Reference FlowSimpleLoss (flow_comp_raft.py:247-265) — unused by
    the reference's released configs, provided for completeness.

    pred_flows/gt_flows: [fwd, bwd], each (B, T-1, h, w, 2) / (B, T-1, H, W, 2)
    with H/h == W/w an integer (torch 'area' interpolation at an integer
    factor == average pooling).
    """
    loss = 0.0
    for pf, gf in zip(pred_flows, gt_flows):
        _, _, h, w, _ = pf.shape
        _, _, H, W, _ = gf.shape
        assert H % h == 0 and W % w == 0, "area resize needs integer factor"
        fy, fx = H // h, W // w
        g = gf.reshape(-1, h, fy, w, fx, 2).mean(axis=(2, 4)) * (h / H)
        loss += jnp.mean(jnp.abs(pf.reshape(-1, h, w, 2) - g))
    return loss


def edge_bce(pred_edges, gt_edges):
    """Pos/neg-weighted BCE on edges (logits = probabilities here, as the
    reference passes sigmoided edges to BCE-with-logits — we match that
    exactly). Reference flow_comp_raft.py:207-226."""
    mask = (gt_edges > 0.5).astype(jnp.float32)
    B = mask.shape[0]
    num_pos = jnp.sum(mask, axis=(1, 2, 3))
    total = float(np.prod(mask.shape[1:]))
    num_neg = total - num_pos
    neg_w = (num_neg / total)[:, None, None, None]
    pos_w = (num_pos / total)[:, None, None, None]
    weight = neg_w * mask + pos_w * (1 - mask)
    # BCEWithLogits on x: max(x,0) - x*y + log(1+exp(-|x|))
    x = pred_edges
    y = gt_edges
    losses = jnp.maximum(x, 0) - x * y + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return jnp.mean(weight * losses)


def edge_loss(pred_edges, gt_edges, masks):
    """Combined edge loss over both directions.
    Reference flow_comp_raft.py:228-244."""
    loss = 0.0
    m = [masks[:, :-1], masks[:, 1:]]
    B, Tm1, H, W, _ = pred_edges[0].shape
    for i in range(2):
        combined = pred_edges[i] * m[i] + gt_edges[i] * (1 - m[i])
        loss += (edge_bce(pred_edges[i].reshape(-1, H, W, 1),
                          gt_edges[i].reshape(-1, H, W, 1))
                 + 5 * edge_bce(combined.reshape(-1, H, W, 1),
                                gt_edges[i].reshape(-1, H, W, 1)))
    return loss
