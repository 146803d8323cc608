"""Discriminator parity vs the torch reference (both 3-D and 2-D variants)
and nsgan/lsgan/hinge adversarial-loss parity vs reference AdversarialLoss.

Spectral norm: the reference vendors torch's power-iteration spectral norm
(model/modules/spectral_norm.py); we use flax.linen.SpectralNorm. Both
normalize by sigma = u^T W v. We converge the torch u/v by repeated train-mode
forwards, then inject torch's u into flax's batch_stats — the matricizations
differ by a row permutation, which leaves both sigma and the u-space (R^out)
invariant, so converged states are interchangeable.
"""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from propainter_tpu.models.discriminator import (
    Discriminator, Discriminator2D, convert_discriminator_state_dict)
from tests.torch_ref import import_reference_module


def _btchw(x):
    return torch.from_numpy(np.moveaxis(x, -1, 2).copy())


def _inject_torch_sn_state(init_stats, tm):
    """Copy converged torch weight_u vectors into flax SpectralNorm stats."""
    stats = jax.tree.map(lambda a: np.array(a), init_stats)
    # torch: conv.{i}.weight_u ; flax: SpectralNorm_{j}/conv_{i}/kernel/u
    sd = tm.state_dict()
    for sn_name, block in stats.items():
        for var_name in block:
            # var_name like 'conv_0/kernel/u' or '.../sigma'
            conv_name = var_name.split("/")[0]
            i = int(conv_name.split("_")[1])
            if var_name.endswith("/u"):
                u = sd[f"conv.{i}.weight_u"].numpy()
                block[var_name] = u[None, :].astype(np.float32)
            elif var_name.endswith("/sigma"):
                w = sd[f"conv.{i}.weight_orig"].numpy().reshape(
                    sd[f"conv.{i}.weight_orig"].shape[0], -1)
                u = sd[f"conv.{i}.weight_u"].numpy()
                v = sd[f"conv.{i}.weight_v"].numpy()
                block[var_name] = np.float32(u @ w @ v)
    return jax.tree.map(jnp.asarray, stats)


@pytest.mark.parametrize("variant", ["3d", "2d"])
def test_discriminator_parity(variant, rng):
    ref = import_reference_module("model.propainter")
    torch.manual_seed(0)
    if variant == "3d":
        tm = ref.Discriminator(in_channels=3, use_sigmoid=False)
        model = Discriminator(in_channels=3)
    else:
        tm = ref.Discriminator_2D(in_channels=3, use_sigmoid=False)
        model = Discriminator2D(in_channels=3)

    x = rng.standard_normal((1, 5, 24, 40, 3)).astype(np.float32)
    xt = _btchw(x)
    # converge u/v (train-mode forwards run power iterations)
    tm.train()
    with torch.no_grad():
        for _ in range(100):
            tm(xt)
    tm.eval()
    with torch.no_grad():
        theirs = tm(xt)

    params = convert_discriminator_state_dict(tm.state_dict())
    init_vars = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           update_stats=False)
    stats = _inject_torch_sn_state(init_vars["batch_stats"], tm)
    ours = model.apply({"params": params, "batch_stats": stats},
                       jnp.asarray(x), update_stats=False)
    np.testing.assert_allclose(
        np.asarray(ours), np.moveaxis(theirs.numpy(), 2, -1),
        rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("gan_type", ["hinge", "lsgan", "nsgan"])
def test_adversarial_loss_parity(gan_type, rng):
    """All three GAN-loss branches vs reference core/loss.py:144-180,
    including the discriminator-side (real+fake)/2 (core/trainer.py:438-441).
    For nsgan/lsgan the discriminator applies sigmoid (use_sigmoid =
    GAN_LOSS != 'hinge', core/trainer.py:89-96) — inputs here are
    probabilities for those types, raw logits for hinge."""
    from propainter_tpu.core.losses import (
        adversarial_g_loss, adversarial_d_loss)

    loss_mod = import_reference_module("core.loss")
    crit = loss_mod.AdversarialLoss(type=gan_type)

    raw = rng.standard_normal((2, 3, 4, 5)).astype(np.float32)
    raw2 = rng.standard_normal((2, 3, 4, 5)).astype(np.float32)
    if gan_type == "hinge":
        real, fake = raw, raw2
    else:
        real = 1 / (1 + np.exp(-raw))
        fake = 1 / (1 + np.exp(-raw2))

    g_ref = crit(torch.from_numpy(fake), True, False).item()
    d_ref = ((crit(torch.from_numpy(real), True, True)
              + crit(torch.from_numpy(fake), False, True)) / 2).item()

    g = float(adversarial_g_loss(jnp.asarray(fake), gan_type))
    d = float(adversarial_d_loss(jnp.asarray(real), jnp.asarray(fake),
                                 gan_type))
    np.testing.assert_allclose(g, g_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(d, d_ref, rtol=1e-5, atol=1e-6)


def test_train_step_dis2d_and_gan_types():
    """The trainer builds and runs with dis_2d and every GAN type (reference
    core/trainer.py:88-96 config space)."""
    from propainter_tpu.core.trainer import (
        PropainterTrainConfig, init_propainter_state,
        make_propainter_train_step)
    from propainter_tpu.models.flow_completion import RecurrentFlowCompleteNet

    B, T, l_t, H, W = 1, 4, 3, 32, 48
    rng = jax.random.PRNGKey(0)
    fc_params = RecurrentFlowCompleteNet().init(
        rng, jnp.zeros((1, l_t - 1, H, W, 2)),
        jnp.zeros((1, l_t - 1, H, W, 1)))["params"]

    key = jax.random.PRNGKey(1)
    batch = {
        "frames": jax.random.uniform(key, (B, T, H, W, 3), minval=-1.0),
        "masks": (jax.random.uniform(key, (B, T, H, W, 1)) > 0.8).astype(
            jnp.float32),
        "flows_f": jax.random.normal(key, (B, l_t - 1, H, W, 2)),
        "flows_b": jax.random.normal(key, (B, l_t - 1, H, W, 2)),
    }
    for gan_type, dis_2d in (("lsgan", True), ("nsgan", False)):
        config = PropainterTrainConfig(
            num_local_frames=l_t, gan_type=gan_type, dis_2d=dis_2d)
        state, g_tx, d_tx = init_propainter_state(
            rng, config, raft_params=None, flowcomp_params=fc_params,
            sample_shape=(1, T, H, W))
        if dis_2d:
            # temporal kernel 1: every conv kernel has kd == 1
            kds = jax.tree.leaves(jax.tree.map(
                lambda a: a.shape[0] if a.ndim == 5 else None,
                state.dis_params))
            assert set(kds) == {1}
        step = make_propainter_train_step(
            config, g_tx, d_tx, use_precomputed_flows=True)
        new_state, metrics, _ = jax.jit(step)(state, batch)
        assert np.isfinite(float(metrics["gen_loss"]))
        assert np.isfinite(float(metrics["dis_loss"]))
