"""Training-dynamics smoke: the flow-stage step actually LEARNS.

Gradient-level parity (test_train_parity.py) proves the step computes the
reference's gradients; this proves the optimizer/schedule/state plumbing
reduces the loss when iterated — the class of state-threading bug parity
tests structurally cannot catch. Mirrors the reference flow-stage loop
semantics (/root/reference/core/trainer_flow_w_edge.py:276-340) on a fixed
tiny synthetic batch, overfit for a few dozen steps.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from propainter_tpu.core.trainer import (
    FlowTrainConfig, init_flow_state, make_flow_train_step)


@pytest.mark.slow
def test_flow_stage_overfits_tiny_batch():
    B, T, l_t, H, W = 2, 4, 3, 32, 48
    rng = jax.random.PRNGKey(0)
    cfg = FlowTrainConfig(num_local_frames=l_t, lr=1e-3)
    state, tx = init_flow_state(rng, cfg, raft_params=None,
                                sample_shape=(1, T, H, W))
    # precomputed-flow path (a first-class reference config, load_flow) so
    # the smoke test exercises flowcomp + losses + optimizer, not RAFT
    step = jax.jit(make_flow_train_step(cfg, tx, use_precomputed_flows=True))

    k1, k2 = jax.random.split(jax.random.PRNGKey(1), 2)
    # SMOOTH synthetic flows (constant translation + mild spatial ramp):
    # a learnable overfit target — iid-noise flows cannot drop the loss
    # materially in a few dozen steps no matter how correct the step is
    yy = jnp.linspace(-1, 1, H)[:, None, None]
    xx = jnp.linspace(-1, 1, W)[None, :, None]
    base = jnp.concatenate([1.5 + 0.5 * xx + 0 * yy,
                            -0.8 + 0.3 * yy + 0 * xx], -1)
    flows = jnp.broadcast_to(base, (B, l_t - 1, H, W, 2))
    batch = {
        "frames": jax.random.uniform(k1, (B, T, H, W, 3), minval=-1.0),
        "masks": (jax.random.uniform(k2, (B, T, H, W, 1)) > 0.85).astype(
            jnp.float32),
        "flows_f": flows,
        "flows_b": -flows,
    }

    p0 = jax.tree.map(np.asarray, state.params)
    losses = []
    n_steps = 40
    for _ in range(n_steps):
        state, metrics, _viz = step(state, batch)
        losses.append(float(metrics["loss"]))

    first = np.mean(losses[:3])
    last = np.mean(losses[-3:])
    assert np.isfinite(losses).all(), losses
    assert last < 0.7 * first, (
        f"loss did not drop >30% over {n_steps} overfit steps: "
        f"{first:.4f} -> {last:.4f} ({losses[:5]} ... {losses[-5:]})")
    assert int(np.asarray(state.step)) == n_steps

    # params actually moved (optimizer state threaded through)
    moved = jax.tree.map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
        p0, jax.tree.map(np.asarray, state.params))
    assert max(jax.tree.leaves(moved)) > 1e-4
