"""GRADIENT-level train-step parity vs the torch reference trainers.

Forward parity alone cannot catch a wrong VJP in the custom-op stack (deform
conv, soft split/comp, window attention, canny); these tests compare the
actual training gradients:

  * ProPainter GAN stage: generator AND discriminator per-parameter grads of
    `make_propainter_train_step` vs autograd through a transcription of the
    reference's loss math (core/trainer.py:350-445) — including the frozen
    flow-completion stage, image propagation, hole/valid L1 weighting,
    hinge GAN, stop-gradient placement and spectral norm.
  * Flow-completion stage: loss value + grads of `make_flow_train_step` vs
    core/trainer_flow_w_edge.py:276-322 (FlowLoss + ternary warp + Canny
    edge loss).

Gradients are extracted from the real train steps by running them with an
SGD(lr=1) optimizer: new_params = params - grads exactly.

Torch-side grads convert to flax trees through the same mechanical converter
as the weights (transposition is linear, so it maps gradients identically).
"""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp
import optax

from propainter_tpu.convert.torch_to_jax import convert_state_dict
from propainter_tpu.models.flow_completion import (
    RecurrentFlowCompleteNet, convert_flowcomp_state_dict)
from propainter_tpu.models.propainter import (
    InpaintGenerator, convert_inpaint_state_dict)
from propainter_tpu.models.discriminator import (
    convert_discriminator_state_dict)
from tests.torch_ref import import_reference_module
from tests.test_discriminator_parity import _inject_torch_sn_state


def _randomize(model, seed=0, scale=1.0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            fan_in = int(np.prod(p.shape[1:])) if p.ndim > 1 else 1
            p.copy_(torch.randn(p.shape, generator=g)
                    / max(fan_in, 1) ** 0.5 * scale)
    return model


def _btchw(x):
    return torch.from_numpy(np.moveaxis(x, -1, 2).copy())


def _grad_tree(model, convert_fn):
    sd = {k: p.grad if p.grad is not None else torch.zeros_like(p)
          for k, p in model.named_parameters()}
    return convert_fn(sd)


def _compare_trees(ours, theirs, rtol=2e-2, atol=None, path=""):
    """Per-parameter comparison, tolerant in absolute scale per leaf."""
    bad = []

    def walk(o, t, path):
        if isinstance(t, dict):
            for k in t:
                walk(o[k], t[k], f"{path}/{k}")
            return
        o = np.asarray(o)
        t = np.asarray(t)
        scale = max(np.abs(t).max(), 1e-8)
        d = np.abs(o - t).max()
        if d > rtol * scale + (atol or 0.0):
            bad.append((path, float(d), float(scale)))

    walk(ours, theirs, path)
    assert not bad, f"grad mismatches (path, maxdiff, scale): {bad[:10]}"


@pytest.fixture(scope="module")
def torch_mods():
    return (import_reference_module("model.propainter"),
            import_reference_module("model.recurrent_flow_completion"),
            import_reference_module("core.loss"),
            import_reference_module("model.modules.flow_comp_raft"))


def test_propainter_train_step_grad_parity(torch_mods, rng):
    ref_pp, ref_fc, ref_loss, _ = torch_mods
    from propainter_tpu.core.trainer import (
        PropainterTrainConfig, init_propainter_state,
        make_propainter_train_step)

    B, T, l_t, H, W = 1, 4, 3, 64, 96
    config = PropainterTrainConfig(num_local_frames=l_t)

    # ---- torch models, converged spectral-norm state ----
    torch.manual_seed(0)
    netG = _randomize(ref_pp.InpaintGenerator(init_weights=True), seed=2)
    netD = ref_pp.Discriminator(in_channels=3, use_sigmoid=False)
    _randomize(netD, seed=3)
    fix_fc = _randomize(ref_fc.RecurrentFlowCompleteNet(), seed=1)
    fix_fc.eval()
    for p in fix_fc.parameters():
        p.requires_grad = False
    adversarial_loss = ref_loss.AdversarialLoss(type="hinge")
    l1_loss = torch.nn.L1Loss()

    frames_np = rng.uniform(-1, 1, (B, T, H, W, 3)).astype(np.float32)
    masks_np = (rng.uniform(size=(B, T, H, W, 1)) > 0.8).astype(np.float32)
    flows_f_np = (2 * rng.standard_normal(
        (B, l_t - 1, H, W, 2))).astype(np.float32)
    flows_b_np = (2 * rng.standard_normal(
        (B, l_t - 1, H, W, 2))).astype(np.float32)

    frames = _btchw(frames_np)
    masks = _btchw(masks_np)
    with torch.no_grad():  # settle D's power iteration
        netD.train()
        for _ in range(100):
            netD(frames[:, :l_t])

    # ---- torch loss math: transcription of core/trainer.py:350-445 ----
    netG.train()
    netD.train()
    gt_local = frames[:, :l_t]
    local_masks = masks[:, :l_t]
    masked_frames = frames * (1 - masks)
    gt_flows_bi = (_btchw(flows_f_np), _btchw(flows_b_np))
    with torch.no_grad():
        pred_flows_bi, _ = fix_fc.forward_bidirect_flow(
            gt_flows_bi, local_masks)
        pred_flows_bi = fix_fc.combine_flow(
            gt_flows_bi, pred_flows_bi, local_masks)

    prop_imgs, updated_local_masks = netG.img_propagation(
        masked_frames[:, :l_t], pred_flows_bi, local_masks,
        interpolation="nearest")
    updated_masks = masks.clone()
    updated_masks[:, :l_t] = updated_local_masks.view(B, l_t, 1, H, W)
    updated_frames = masked_frames.clone()
    prop_local = gt_local * (1 - local_masks) + prop_imgs.view(
        B, l_t, 3, H, W) * local_masks
    updated_frames[:, :l_t] = prop_local

    pred_imgs = netG(updated_frames, pred_flows_bi, masks, updated_masks,
                     l_t).view(B, -1, 3, H, W)
    comp_imgs = frames * (1 - masks) + pred_imgs * masks

    for p in netD.parameters():
        p.requires_grad = False
    hole = l1_loss(pred_imgs * masks, frames * masks) / torch.mean(masks)
    valid = (l1_loss(pred_imgs * (1 - masks), frames * (1 - masks))
             / torch.mean(1 - masks))
    gan = adversarial_loss(netD(comp_imgs), True, False) * 0.01
    gen_loss = hole + valid + gan
    netG.zero_grad()
    gen_loss.backward()

    for p in netD.parameters():
        p.requires_grad = True
    netD.zero_grad()
    dis_loss = (adversarial_loss(netD(frames), True, True)
                + adversarial_loss(netD(comp_imgs.detach()), False, True)) / 2
    dis_loss.backward()

    g_grads_t = _grad_tree(netG, convert_inpaint_state_dict)
    d_grads_t = _grad_tree(netD, convert_discriminator_state_dict)

    # ---- our train step with SGD(1): params - new_params == grads ----
    fc_params = convert_flowcomp_state_dict(fix_fc.state_dict())
    gen_params = convert_inpaint_state_dict(netG.state_dict())
    dis_params = convert_discriminator_state_dict(netD.state_dict())

    g_tx = optax.sgd(1.0)
    d_tx = optax.sgd(1.0)
    rng_key = jax.random.PRNGKey(0)
    state, _, _ = init_propainter_state(
        rng_key, config, raft_params=None, flowcomp_params=fc_params,
        sample_shape=(B, T, H, W))
    # converged torch spectral-norm u/sigma -> flax batch_stats
    dis_stats = _inject_torch_sn_state(state.dis_stats, netD)
    state = state.replace(
        gen_params=jax.tree.map(jnp.asarray, gen_params),
        dis_params=jax.tree.map(jnp.asarray, dis_params),
        dis_stats=dis_stats,
        gen_opt=g_tx.init(gen_params), dis_opt=d_tx.init(dis_params))

    step = make_propainter_train_step(config, g_tx, d_tx,
                                      use_precomputed_flows=True)
    batch = {
        "frames": jnp.asarray(frames_np),
        "masks": jnp.asarray(masks_np),
        "flows_f": jnp.asarray(flows_f_np),
        "flows_b": jnp.asarray(flows_b_np),
    }
    new_state, metrics, _ = jax.jit(step)(state, batch)

    np.testing.assert_allclose(float(metrics["gen_loss"]), gen_loss.item(),
                               rtol=1e-3)
    np.testing.assert_allclose(float(metrics["dis_loss"]), dis_loss.item(),
                               rtol=1e-3)

    g_grads = jax.tree.map(lambda a, b: np.asarray(a) - np.asarray(b),
                           state.gen_params, new_state.gen_params)
    d_grads = jax.tree.map(lambda a, b: np.asarray(a) - np.asarray(b),
                           state.dis_params, new_state.dis_params)
    _compare_trees(g_grads, g_grads_t, rtol=2e-2, atol=1e-6)
    _compare_trees(d_grads, d_grads_t, rtol=2e-2, atol=1e-6)


def test_flow_train_step_grad_parity(torch_mods, rng):
    _, ref_fc, _, ref_raft = torch_mods
    canny_mod = import_reference_module("model.canny.canny_filter")
    from propainter_tpu.core.trainer import (
        FlowTrainConfig, init_flow_state, make_flow_train_step)

    B, T, H, W = 1, 3, 64, 96
    config = FlowTrainConfig(num_local_frames=T)

    torch.manual_seed(0)
    netG = _randomize(ref_fc.RecurrentFlowCompleteNet(), seed=1)
    netG.train()
    flow_loss_m = ref_raft.FlowLoss()
    edge_loss_m = ref_raft.EdgeLoss()
    canny = canny_mod.Canny(sigma=(2, 2), low_threshold=0.1,
                            high_threshold=0.2)

    frames_np = rng.uniform(-1, 1, (B, T, H, W, 3)).astype(np.float32)
    masks_np = (rng.uniform(size=(B, T, H, W, 1)) > 0.8).astype(np.float32)
    flows_f_np = (2 * rng.standard_normal(
        (B, T - 1, H, W, 2))).astype(np.float32)
    flows_b_np = (2 * rng.standard_normal(
        (B, T - 1, H, W, 2))).astype(np.float32)

    frames = _btchw(frames_np)
    masks = _btchw(masks_np)
    gt_flows_bi = (_btchw(flows_f_np), _btchw(flows_b_np))

    # GT edges (reference trainer_flow_w_edge.py:261-273, verbatim logic)
    def get_edges(flows):
        b, t, _, h, w = flows.shape
        flows = flows.view(-1, 2, h, w)
        flows_gray = (flows[:, 0, None] ** 2 + flows[:, 1, None] ** 2) ** 0.5
        if flows_gray.max() < 1:
            flows_gray = flows_gray * 0
        else:
            flows_gray = flows_gray / flows_gray.max()
        _, edges = canny(flows_gray.float())
        return edges.view(b, t, 1, h, w)

    with torch.no_grad():
        gt_edges_bi = [get_edges(gt_flows_bi[0]), get_edges(gt_flows_bi[1])]

    pred_flows_bi, pred_edges_bi = netG.forward_bidirect_flow(
        gt_flows_bi, masks)
    flow_l, warp_l = flow_loss_m(pred_flows_bi, gt_flows_bi, masks, frames)
    edge_l = edge_loss_m(pred_edges_bi, gt_edges_bi, masks)
    loss = 0.25 * flow_l + 0.01 * warp_l + 1.0 * edge_l
    netG.zero_grad()
    loss.backward()
    grads_t = _grad_tree(netG, convert_flowcomp_state_dict)

    # ---- ours ----
    params = convert_flowcomp_state_dict(netG.state_dict())
    tx = optax.sgd(1.0)
    state, _ = init_flow_state(jax.random.PRNGKey(0), config,
                               raft_params=None,
                               sample_shape=(B, T + 1, H, W))
    state = state.replace(params=jax.tree.map(jnp.asarray, params),
                          opt=tx.init(params))
    step = make_flow_train_step(config, tx, use_precomputed_flows=True)
    batch = {
        "frames": jnp.asarray(frames_np),
        "masks": jnp.asarray(masks_np),
        "flows_f": jnp.asarray(flows_f_np),
        "flows_b": jnp.asarray(flows_b_np),
    }
    new_state, metrics, _ = jax.jit(step)(state, batch)

    np.testing.assert_allclose(float(metrics["loss"]), loss.item(),
                               rtol=2e-3)
    grads = jax.tree.map(lambda a, b: np.asarray(a) - np.asarray(b),
                         state.params, new_state.params)
    _compare_trees(grads, grads_t, rtol=2e-2, atol=1e-6)


def test_training_smoke_loss_decreases(rng):
    """40 steps of the real train step overfitting one tiny batch: the
    reconstruction losses must trend down (a failing VJP or optimizer wiring
    bug cannot pass this). Targets are SMOOTH low-frequency frames —
    per-pixel noise targets are unlearnable through the tanh decoder and
    plateau at saturation regardless of gradient correctness."""
    from propainter_tpu.core.trainer import (
        PropainterTrainConfig, init_propainter_state,
        make_propainter_train_step)

    B, T, l_t, H, W = 1, 4, 3, 32, 48
    config = PropainterTrainConfig(num_local_frames=l_t,
                                   use_discriminator=False, lr=3e-4)
    key = jax.random.PRNGKey(0)
    fc_params = RecurrentFlowCompleteNet().init(
        key, jnp.zeros((1, l_t - 1, H, W, 2)),
        jnp.zeros((1, l_t - 1, H, W, 1)))["params"]
    state, g_tx, d_tx = init_propainter_state(
        key, config, raft_params=None, flowcomp_params=fc_params,
        sample_shape=(B, T, H, W))
    step = jax.jit(make_propainter_train_step(
        config, g_tx, d_tx, use_precomputed_flows=True))

    k = jax.random.PRNGKey(1)
    small = jax.random.uniform(k, (B, T, 4, 6, 3), minval=-0.8, maxval=0.8)
    batch = {
        "frames": jax.image.resize(small, (B, T, H, W, 3), "linear"),
        "masks": (jax.random.uniform(k, (B, T, H, W, 1)) > 0.8).astype(
            jnp.float32),
        "flows_f": 0.5 * jax.random.normal(k, (B, l_t - 1, H, W, 2)),
        "flows_b": 0.5 * jax.random.normal(k, (B, l_t - 1, H, W, 2)),
    }
    losses = []
    for _ in range(40):
        state, metrics, _ = step(state, batch)
        losses.append(float(metrics["gen_loss"]))
    assert np.isfinite(losses).all()
    # overfitting one batch: late losses must be well below early ones
    assert np.mean(losses[-5:]) < 0.5 * np.mean(losses[:5]), losses