"""Training runtime: train states and jittable train steps for both stages.

Re-designs reference core/trainer.py (ProPainter GAN stage) and
core/trainer_flow_w_edge.py (flow-completion stage) as pure-functional jitted
steps over a `jax.sharding.Mesh`:

  * frozen models (RAFT, flow completion in stage 2) are param trees under
    `stop_gradient`, matching the reference's requires_grad=False modules;
  * DDP is replaced by data-parallel sharding annotations: the batch is
    sharded over the mesh 'data' axis, params are replicated, and XLA inserts
    the gradient all-reduce over ICI (the pjit analogue of NCCL allreduce);
  * optax Adam(beta1=0, beta2=0.99) + piecewise-constant schedule matches
    configs/train_propainter.json:28-47 and core/lr_scheduler.py:9-47.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax import struct

from propainter_tpu.models.raft import RAFT
from propainter_tpu.models.flow_completion import (
    RecurrentFlowCompleteNet, forward_bidirect_flow, combine_flow)
from propainter_tpu.models.propainter import InpaintGenerator, image_propagation
from propainter_tpu.models.discriminator import Discriminator
from propainter_tpu.core import losses as L


def multistep_lr(base_lr: float, milestones: dict[int, float]) -> optax.Schedule:
    """MultiStepLR analogue (core/lr_scheduler.py:9-47)."""
    return optax.piecewise_constant_schedule(base_lr, milestones)


def cosine_annealing_restart_lr(
    base_lr: float, periods: list[int],
    restart_weights: list[float] | None = None,
    eta_min: float = 1e-7) -> optax.Schedule:
    """CosineAnnealingRestartLR analogue (core/lr_scheduler.py:68-112):
    cosine decay to eta_min within each period, restarting at weight w_i."""
    restart_weights = restart_weights or [1.0] * len(periods)
    assert len(periods) == len(restart_weights)
    starts = np.cumsum([0] + periods[:-1]).tolist()

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        lr = jnp.full_like(step, eta_min, jnp.float32)
        for start, period, w in zip(starts, periods, restart_weights):
            frac = jnp.clip((step - start) / period, 0.0, 1.0)
            val = eta_min + 0.5 * w * (base_lr - eta_min) * (
                1 + jnp.cos(jnp.pi * frac))
            lr = jnp.where(step >= start, val, lr)
        return lr

    return schedule


def make_optimizer(lr: float, milestones: dict[int, float] | None = None,
                   b1: float = 0.0, b2: float = 0.99,
                   scheduler: str = "multistep",
                   periods: list[int] | None = None,
                   restart_weights: list[float] | None = None,
                   ) -> optax.GradientTransformation:
    if scheduler == "cosine":
        sched = cosine_annealing_restart_lr(
            lr, periods or [250_000, 250_000], restart_weights)
    else:
        sched = multistep_lr(lr, milestones or {})
    return optax.adam(sched, b1=b1, b2=b2)


class PropainterTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    gen_params: Any
    gen_opt: Any
    dis_params: Any
    dis_stats: Any  # spectral norm power-iteration state
    dis_opt: Any
    # frozen
    raft_params: Any = struct.field(pytree_node=True, default=None)
    flowcomp_params: Any = struct.field(pytree_node=True, default=None)


@dataclasses.dataclass
class PropainterTrainConfig:
    num_local_frames: int = 10
    lr: float = 1e-4
    milestones: dict = dataclasses.field(
        default_factory=lambda: {400_000: 0.1})
    hole_weight: float = 1.0
    valid_weight: float = 1.0
    adversarial_weight: float = 0.01
    gan_type: str = "hinge"
    use_discriminator: bool = True
    # temporal-kernel-1 T-PatchGAN variant (reference core/trainer.py:89-90
    # selects Discriminator_2D when config['model']['dis_2d'])
    dis_2d: bool = False
    interp_mode: str = "nearest"
    # LPIPS perceptual loss (reference core/trainer.py:66-69,414-418;
    # configured off by default per configs/train_propainter.json:20)
    perceptual_weight: float = 0.0


def _make_discriminator(config: PropainterTrainConfig) -> Discriminator:
    """Reference core/trainer.py:88-96: Discriminator_2D when dis_2d, and
    use_sigmoid iff the GAN loss is not hinge."""
    return Discriminator(in_channels=3, kd=1 if config.dis_2d else 3,
                         use_sigmoid=config.gan_type != "hinge")


def init_propainter_state(
    rng, config: PropainterTrainConfig, raft_params, flowcomp_params,
    sample_shape=(1, 12, 64, 96), gen: InpaintGenerator | None = None,
) -> tuple[PropainterTrainState, Any, Any]:
    """Initialize generator/discriminator params and optimizer states.

    sample_shape = (B, T, H, W); T = l_t + n_refs. gen overrides the
    generator architecture (e.g. a reduced-depth model for compile-budgeted
    sharding dry runs — the train step's DP sharding is depth-blind).
    """
    B, T, H, W = sample_shape
    l_t = config.num_local_frames
    gen = gen or InpaintGenerator(remat=True)
    dis = _make_discriminator(config)
    k1, k2 = jax.random.split(rng)
    gen_params = gen.init(
        k1, jnp.zeros((B, T, H, W, 3)),
        (jnp.zeros((B, l_t - 1, H, W, 2)), jnp.zeros((B, l_t - 1, H, W, 2))),
        jnp.zeros((B, T, H, W, 1)), jnp.zeros((B, T, H, W, 1)), l_t,
        train=True)["params"]
    dis_vars = dis.init(k2, jnp.zeros((B, l_t, H, W, 3)), update_stats=False)
    g_tx = make_optimizer(config.lr, config.milestones)
    d_tx = make_optimizer(config.lr, config.milestones)
    state = PropainterTrainState(
        step=jnp.zeros((), jnp.int32),
        gen_params=gen_params,
        gen_opt=g_tx.init(gen_params),
        dis_params=dis_vars["params"],
        dis_stats=dis_vars.get("batch_stats", {}),
        dis_opt=d_tx.init(dis_vars["params"]),
        raft_params=raft_params,
        flowcomp_params=flowcomp_params,
    )
    return state, g_tx, d_tx


def make_propainter_train_step(
    config: PropainterTrainConfig, g_tx, d_tx,
    raft_iters: int = 20, use_precomputed_flows: bool = False,
    lpips_params=None, gen: InpaintGenerator | None = None,
) -> Callable:
    """Build the jittable ProPainter GAN train step.

    batch: dict(frames (B,T,H,W,3) in [-1,1], masks (B,T,H,W,1),
                [flows_f/flows_b (B,l_t-1,H,W,2) if precomputed]).
    Mirrors reference core/trainer.py:350-445.

    lpips_params: LPIPSVgg params (required iff perceptual_weight > 0;
    reference core/trainer.py:66-69 builds LPIPSLoss under the same gate).
    gen must match the architecture used in init_propainter_state.
    """
    gen = gen or InpaintGenerator(remat=True)
    dis = _make_discriminator(config)
    raft = RAFT()
    flowcomp = RecurrentFlowCompleteNet()
    l_t = config.num_local_frames
    if config.perceptual_weight > 0:
        if lpips_params is None:
            raise ValueError("perceptual_weight > 0 requires lpips_params")
        from propainter_tpu.models.vgg import LPIPSVgg

        lpips_net = LPIPSVgg()

        def lpips_apply(a, b):
            return lpips_net.apply({"params": lpips_params}, a, b)

    def train_step(state: PropainterTrainState, batch):
        frames = batch["frames"]
        masks = batch["masks"].astype(frames.dtype)
        B, T, H, W, _ = frames.shape
        gt_local = frames[:, :l_t]
        local_masks = masks[:, :l_t]
        masked_frames = frames * (1 - masks)

        # ---- frozen flow stages (no grad) ----
        if use_precomputed_flows:
            gt_flows_bi = (batch["flows_f"], batch["flows_b"])
        else:
            f1 = gt_local[:, :-1].reshape(-1, H, W, 3)
            f2 = gt_local[:, 1:].reshape(-1, H, W, 3)
            a = jnp.concatenate([f1, f2], 0)
            b2 = jnp.concatenate([f2, f1], 0)
            _, flow = raft.apply({"params": state.raft_params}, a, b2,
                                 iters=raft_iters)
            n = f1.shape[0]
            gt_flows_bi = (flow[:n].reshape(B, l_t - 1, H, W, 2),
                           flow[n:].reshape(B, l_t - 1, H, W, 2))
        gt_flows_bi = jax.tree.map(jax.lax.stop_gradient, gt_flows_bi)

        def fc_apply(mf, mk, train):
            return flowcomp.apply({"params": state.flowcomp_params}, mf, mk,
                                  train)

        pred_flows_bi, _ = forward_bidirect_flow(
            fc_apply, gt_flows_bi, local_masks)
        pred_flows_bi = combine_flow(gt_flows_bi, pred_flows_bi, local_masks)
        pred_flows_bi = jax.tree.map(jax.lax.stop_gradient, pred_flows_bi)

        # ---- image propagation (no learnable params) ----
        prop_imgs, updated_local_masks = image_propagation(
            masked_frames[:, :l_t], pred_flows_bi[0], pred_flows_bi[1],
            local_masks, config.interp_mode)
        prop_local = gt_local * (1 - local_masks) + prop_imgs * local_masks
        updated_frames = jnp.concatenate(
            [prop_local, masked_frames[:, l_t:]], axis=1)
        updated_masks = jnp.concatenate(
            [updated_local_masks, masks[:, l_t:]], axis=1)

        # ---- generator step ----
        def gen_loss_fn(gen_params):
            pred_imgs = gen.apply(
                {"params": gen_params}, updated_frames, pred_flows_bi,
                masks, updated_masks, l_t, train=True)
            comp_imgs = frames * (1 - masks) + pred_imgs * masks
            total, hole, valid = L.hole_valid_l1(
                pred_imgs, frames, masks,
                config.hole_weight, config.valid_weight)
            metrics = {"hole_loss": hole, "valid_loss": valid}
            if config.perceptual_weight > 0:
                # reference core/trainer.py:414-417: LPIPS(pred, frames)
                perc = L.lpips_loss(
                    lpips_apply, pred_imgs.reshape(-1, H, W, 3),
                    frames.reshape(-1, H, W, 3),
                    loss_weight=config.perceptual_weight)
                total = total + perc
                metrics["perc_loss"] = perc
            if config.use_discriminator:
                fake_logits = dis.apply(
                    {"params": state.dis_params,
                     "batch_stats": state.dis_stats},
                    comp_imgs, update_stats=False)
                gan = L.adversarial_g_loss(fake_logits, config.gan_type)
                total = total + config.adversarial_weight * gan
                metrics["gan_loss"] = gan
            return total, (comp_imgs, metrics)

        (g_loss, (comp_imgs, metrics)), g_grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True)(state.gen_params)
        g_updates, gen_opt = g_tx.update(g_grads, state.gen_opt,
                                         state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, g_updates)
        metrics["gen_loss"] = g_loss

        dis_params, dis_stats, dis_opt = (
            state.dis_params, state.dis_stats, state.dis_opt)
        if config.use_discriminator:
            comp_detached = jax.lax.stop_gradient(comp_imgs)

            def dis_loss_fn(dp):
                real_logits, vs = dis.apply(
                    {"params": dp, "batch_stats": state.dis_stats},
                    frames, update_stats=True, mutable=["batch_stats"])
                fake_logits, vs = dis.apply(
                    {"params": dp, "batch_stats": vs["batch_stats"]},
                    comp_detached, update_stats=True, mutable=["batch_stats"])
                d = L.adversarial_d_loss(real_logits, fake_logits,
                                         config.gan_type)
                return d, vs["batch_stats"]

            (d_loss, dis_stats), d_grads = jax.value_and_grad(
                dis_loss_fn, has_aux=True)(state.dis_params)
            d_updates, dis_opt = d_tx.update(d_grads, state.dis_opt,
                                             state.dis_params)
            dis_params = optax.apply_updates(state.dis_params, d_updates)
            metrics["dis_loss"] = d_loss

        new_state = state.replace(
            step=state.step + 1,
            gen_params=gen_params, gen_opt=gen_opt,
            dis_params=dis_params, dis_stats=dis_stats, dis_opt=dis_opt)
        # viz arrays stay on device; the CLI only fetches them at viz_freq
        # (reference core/trainer.py:449-478 logs image/flow grids).
        # Full-batch tensors: slicing [:1] would force a resharding
        # collective on a batch-sharded mesh (deadlocks XLA's in-process
        # CPU AllToAll on starved hosts); the CLI takes row 0 on the host.
        viz = {
            "comp_local": comp_imgs[:, :l_t],
            "masked_local": masked_frames[:, :l_t],
            "gt_local": gt_local,
            "pred_flow_f": pred_flows_bi[0],
        }
        return new_state, metrics, viz

    return train_step


# ---------------------------------------------------------------------------
# Flow-completion stage
# ---------------------------------------------------------------------------


class FlowTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt: Any
    raft_params: Any


@dataclasses.dataclass
class FlowTrainConfig:
    num_local_frames: int = 10
    lr: float = 5e-5
    milestones: dict = dataclasses.field(
        default_factory=lambda: {300_000: 0.2, 400_000: 0.2 ** 2,
                                 500_000: 0.2 ** 3, 600_000: 0.2 ** 4})
    flow_weight: float = 0.25
    warp_weight: float = 0.01
    edge_weight: float = 1.0


def init_flow_state(rng, config: FlowTrainConfig, raft_params,
                    sample_shape=(1, 10, 64, 96)):
    B, T, H, W = sample_shape
    model = RecurrentFlowCompleteNet(remat=True)
    params = model.init(
        rng, jnp.zeros((B, T - 1, H, W, 2)), jnp.zeros((B, T - 1, H, W, 1)),
        train=True)["params"]
    tx = make_optimizer(config.lr, config.milestones)
    state = FlowTrainState(step=jnp.zeros((), jnp.int32), params=params,
                           opt=tx.init(params), raft_params=raft_params)
    return state, tx


def make_flow_train_step(config: FlowTrainConfig, tx, raft_iters: int = 20,
                         use_precomputed_flows: bool = False) -> Callable:
    """Flow-completion train step. Mirrors core/trainer_flow_w_edge.py:276-322."""
    from propainter_tpu.ops.canny import canny_edges

    model = RecurrentFlowCompleteNet(remat=True)
    raft = RAFT()
    l_t = config.num_local_frames

    def get_edges(flows):
        """GT edges from flow magnitude (trainer_flow_w_edge.py:261-273)."""
        B, T, H, W, _ = flows.shape
        f = flows.reshape(-1, H, W, 2)
        mag = jnp.sqrt(jnp.sum(jnp.square(f), axis=-1, keepdims=True))
        peak = jnp.max(mag)
        mag = jnp.where(peak < 1, jnp.zeros_like(mag), mag / peak)
        # the reference trainer's Canny uses sigma=(2,2)
        # (trainer_flow_w_edge.py:60), not the canny() default (1,1)
        edges = canny_edges(mag, sigma=2.0)
        return edges.reshape(B, T, H, W, 1)

    def train_step(state: FlowTrainState, batch):
        frames = batch["frames"]
        masks = batch["masks"].astype(frames.dtype)
        B, T, H, W, _ = frames.shape
        gt_local = frames[:, :l_t]
        local_masks = masks[:, :l_t]

        if use_precomputed_flows:
            gt_flows_bi = (batch["flows_f"], batch["flows_b"])
        else:
            f1 = gt_local[:, :-1].reshape(-1, H, W, 3)
            f2 = gt_local[:, 1:].reshape(-1, H, W, 3)
            a = jnp.concatenate([f1, f2], 0)
            b2 = jnp.concatenate([f2, f1], 0)
            _, flow = raft.apply({"params": state.raft_params}, a, b2,
                                 iters=raft_iters)
            n = f1.shape[0]
            gt_flows_bi = (flow[:n].reshape(B, l_t - 1, H, W, 2),
                           flow[n:].reshape(B, l_t - 1, H, W, 2))
        gt_flows_bi = jax.tree.map(jax.lax.stop_gradient, gt_flows_bi)
        gt_edges_bi = [get_edges(gt_flows_bi[0]), get_edges(gt_flows_bi[1])]

        def loss_fn(params):
            def apply_fn(mf, mk, train):
                return model.apply({"params": params}, mf, mk, train)

            pred_flows_bi, pred_edges_bi = forward_bidirect_flow(
                apply_fn, gt_flows_bi, local_masks, train=True)
            fl, warp = L.flow_loss(pred_flows_bi, gt_flows_bi, local_masks,
                                   gt_local)
            el = L.edge_loss(pred_edges_bi, gt_edges_bi, local_masks)
            total = (config.flow_weight * fl + config.warp_weight * warp
                     + config.edge_weight * el)
            return total, ({"flow_loss": fl, "warp_loss": warp,
                            "edge_loss": el},
                           {"pred_flow_f": pred_flows_bi[0],
                            "gt_flow_f": gt_flows_bi[0],
                            "pred_edge_f": pred_edges_bi[0]})

        (loss, (metrics, viz)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt = tx.update(grads, state.opt, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["loss"] = loss
        return (state.replace(step=state.step + 1, params=params, opt=opt),
                metrics, viz)

    return train_step
