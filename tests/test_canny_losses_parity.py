"""Canny edge detector and training-loss parity vs the torch reference."""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from tests.torch_ref import import_reference_module


def _nchw(x):
    return torch.from_numpy(np.moveaxis(x, -1, 1).copy())


def _nhwc(t):
    return np.moveaxis(t.detach().numpy(), 1, -1)


def test_canny_parity(rng):
    from propainter_tpu.ops.canny import canny_edges
    ref = import_reference_module("model.canny.canny_filter")

    # smooth-ish random field in [0, 1] like a normalized flow magnitude
    base = rng.uniform(0, 1, (2, 1, 24, 32)).astype(np.float32)
    x = torch.nn.functional.avg_pool2d(
        torch.from_numpy(base), 3, 1, 1).numpy()

    with torch.no_grad():
        _, edges_t = ref.canny(torch.from_numpy(x))

    ours = canny_edges(jnp.asarray(np.moveaxis(x, 1, -1)))
    np.testing.assert_allclose(np.asarray(ours), _nhwc(edges_t), atol=1e-5)


def test_canny_trainer_config_parity(rng):
    """The flow trainer's Canny(sigma=(2,2)) config (trainer_flow_w_edge.py:60)
    on a NOISY normalized-flow-magnitude input — the regime GT edges are
    computed in (caught a hardcoded sigma=1 via gradient-parity testing)."""
    from propainter_tpu.ops.canny import canny_edges
    ref = import_reference_module("model.canny.canny_filter")

    mag = rng.uniform(0, 1, (2, 1, 32, 48)).astype(np.float32)
    c = ref.Canny(sigma=(2, 2), low_threshold=0.1, high_threshold=0.2)
    with torch.no_grad():
        _, edges_t = c(torch.from_numpy(mag))

    ours = canny_edges(jnp.asarray(np.moveaxis(mag, 1, -1)), sigma=2.0)
    np.testing.assert_allclose(np.asarray(ours), _nhwc(edges_t), atol=1e-5)


def test_flow_loss_parity(rng):
    from propainter_tpu.core import losses as L
    ref = import_reference_module("model.modules.flow_comp_raft")

    B, T, H, W = 1, 4, 24, 32
    pred_f = (2 * rng.standard_normal((B, T - 1, H, W, 2))).astype(np.float32)
    pred_b = (2 * rng.standard_normal((B, T - 1, H, W, 2))).astype(np.float32)
    gt_f = (2 * rng.standard_normal((B, T - 1, H, W, 2))).astype(np.float32)
    gt_b = (2 * rng.standard_normal((B, T - 1, H, W, 2))).astype(np.float32)
    masks = (rng.uniform(size=(B, T, H, W, 1)) > 0.6).astype(np.float32)
    frames = rng.uniform(-1, 1, (B, T, H, W, 3)).astype(np.float32)

    with torch.no_grad():
        fl = ref.FlowLoss()
        loss_t, warp_t = fl(
            [_nchw(pred_f.reshape(-1, H, W, 2)).view(B, T - 1, 2, H, W),
             _nchw(pred_b.reshape(-1, H, W, 2)).view(B, T - 1, 2, H, W)],
            [_nchw(gt_f.reshape(-1, H, W, 2)).view(B, T - 1, 2, H, W),
             _nchw(gt_b.reshape(-1, H, W, 2)).view(B, T - 1, 2, H, W)],
            _nchw(masks.reshape(-1, H, W, 1)).view(B, T, 1, H, W),
            _nchw(frames.reshape(-1, H, W, 3)).view(B, T, 3, H, W))

    loss, warp = L.flow_loss(
        [jnp.asarray(pred_f), jnp.asarray(pred_b)],
        [jnp.asarray(gt_f), jnp.asarray(gt_b)],
        jnp.asarray(masks), jnp.asarray(frames))
    np.testing.assert_allclose(float(loss), loss_t.item(), rtol=1e-4)
    np.testing.assert_allclose(float(warp), warp_t.item(), rtol=1e-4)


def test_edge_loss_parity(rng):
    from propainter_tpu.core import losses as L
    ref = import_reference_module("model.modules.flow_comp_raft")

    B, T, H, W = 1, 4, 16, 16
    pred = rng.uniform(0, 1, (B, T - 1, H, W, 1)).astype(np.float32)
    gt = (rng.uniform(size=(B, T - 1, H, W, 1)) > 0.8).astype(np.float32)
    masks = (rng.uniform(size=(B, T, H, W, 1)) > 0.6).astype(np.float32)

    with torch.no_grad():
        el = ref.EdgeLoss()
        loss_t = el(
            [_nchw(pred.reshape(-1, H, W, 1)).view(B, T - 1, 1, H, W)] * 2,
            [_nchw(gt.reshape(-1, H, W, 1)).view(B, T - 1, 1, H, W)] * 2,
            _nchw(masks.reshape(-1, H, W, 1)).view(B, T, 1, H, W))

    loss = L.edge_loss(
        [jnp.asarray(pred)] * 2, [jnp.asarray(gt)] * 2, jnp.asarray(masks))
    np.testing.assert_allclose(float(loss), loss_t.item(), rtol=1e-4)


def test_adversarial_losses(rng):
    # reference core/loss.py imports lpips, unavailable here; its hinge math
    # (core/loss.py:160-180) is replicated inline as the golden value
    from propainter_tpu.core import losses as L

    logits = rng.standard_normal((2, 4, 4)).astype(np.float32)
    lt = torch.from_numpy(logits)
    with torch.no_grad():
        g_t = (-lt.mean()).item()
        d_real_t = torch.nn.functional.relu(1.0 - lt).mean().item()
        d_fake_t = torch.nn.functional.relu(1.0 + lt).mean().item()

    g = float(L.adversarial_g_loss(jnp.asarray(logits)))
    d = float(L.adversarial_d_loss(jnp.asarray(logits), jnp.asarray(logits)))
    np.testing.assert_allclose(g, g_t, rtol=1e-5)
    np.testing.assert_allclose(d, (d_real_t + d_fake_t) / 2, rtol=1e-5)


def test_flow_simple_loss_parity(rng):
    from propainter_tpu.core import losses as L
    ref = import_reference_module("model.modules.flow_comp_raft")

    B, T, H, W = 1, 3, 32, 48
    h, w = H // 4, W // 4
    pred_f = rng.standard_normal((B, T - 1, h, w, 2)).astype(np.float32)
    pred_b = rng.standard_normal((B, T - 1, h, w, 2)).astype(np.float32)
    gt_f = (2 * rng.standard_normal((B, T - 1, H, W, 2))).astype(np.float32)
    gt_b = (2 * rng.standard_normal((B, T - 1, H, W, 2))).astype(np.float32)

    with torch.no_grad():
        fsl = ref.FlowSimpleLoss()
        loss_t = fsl(
            [_nchw(pred_f.reshape(-1, h, w, 2)).view(B, T - 1, 2, h, w),
             _nchw(pred_b.reshape(-1, h, w, 2)).view(B, T - 1, 2, h, w)],
            [_nchw(gt_f.reshape(-1, H, W, 2)).view(B, T - 1, 2, H, W),
             _nchw(gt_b.reshape(-1, H, W, 2)).view(B, T - 1, 2, H, W)])

    loss = L.flow_simple_loss(
        [jnp.asarray(pred_f), jnp.asarray(pred_b)],
        [jnp.asarray(gt_f), jnp.asarray(gt_b)])
    np.testing.assert_allclose(float(loss), loss_t.item(), rtol=1e-4)
