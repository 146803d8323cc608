"""Measure the TPU training-step time at the reference training config.

Times make_propainter_train_step (GAN stage) and make_flow_train_step
(flow stage) on the chip at the reference's training resolution and frame
counts (configs/train_propainter.json: 432x240, num_local_frames 10,
num_ref_frames 6; train_flowcomp.json same resolution), batch 1 per chip
(the reference trains batch 8 over 8 GPUs, i.e. 1/GPU). Reports compile
wall time and steady-state steps/s, fenced (see PERF.md methodology).

Run from the repo root with nothing else on the chip:
    python tools/train_step_bench.py [gan|flow]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from propainter_tpu.utils.jax_cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np


H, W = 240, 432
L_T, N_REF = 10, 6
RAFT_ITERS = 5  # reference train-time raft_iter (train_propainter.json)


def fence(x):
    np.asarray(jax.tree.leaves(x)[0].ravel()[0])


def _batch(rng, T, with_flows):
    b = {
        "frames": jnp.asarray(
            rng.uniform(-1, 1, (1, T, H, W, 3)), jnp.float32),
        "masks": jnp.asarray(
            rng.uniform(size=(1, T, H, W, 1)) > 0.9, jnp.float32),
    }
    if with_flows:
        b["flows_f"] = jnp.asarray(
            rng.standard_normal((1, L_T - 1, H, W, 2)), jnp.float32)
        b["flows_b"] = jnp.asarray(
            rng.standard_normal((1, L_T - 1, H, W, 2)), jnp.float32)
    return b


def _time_step(name, step_fn, state, batch, n=8):
    t0 = time.perf_counter()
    s, metrics, *_ = step_fn(state, batch)
    fence(metrics)
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        # carry s across rounds: with donate_argnums the previous state's
        # buffers are consumed, so the original `state` is single-use
        t0 = time.perf_counter()
        for _ in range(n):
            s, metrics, *_ = step_fn(s, batch)
        fence(metrics)
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{name}: compile {compile_s:.0f} s, step {best * 1e3:.0f} ms "
          f"({1.0 / best:.2f} steps/s), metrics "
          f"{ {k: round(float(v), 4) for k, v in metrics.items()} }",
          flush=True)


def bench_gan(rng_np, raft_params):
    from propainter_tpu.core.trainer import (
        PropainterTrainConfig, init_propainter_state,
        make_propainter_train_step)
    from propainter_tpu.models.flow_completion import RecurrentFlowCompleteNet

    fc = RecurrentFlowCompleteNet()
    fc_params = fc.init(jax.random.PRNGKey(1),
                        jnp.zeros((1, 2, 64, 96, 2)),
                        jnp.zeros((1, 2, 64, 96, 1)))["params"]
    config = PropainterTrainConfig(num_local_frames=L_T)
    state, g_tx, d_tx = init_propainter_state(
        jax.random.PRNGKey(0), config, raft_params, fc_params,
        sample_shape=(1, L_T + N_REF, H, W))
    step = jax.jit(make_propainter_train_step(
        config, g_tx, d_tx, raft_iters=RAFT_ITERS), donate_argnums=(0,))
    _time_step("gan step (432x240, 10+6f, b=1)", step, state,
               _batch(rng_np, L_T + N_REF, False))


def bench_flow(rng_np, raft_params):
    from propainter_tpu.core.trainer import (
        FlowTrainConfig, init_flow_state, make_flow_train_step)

    config = FlowTrainConfig(num_local_frames=L_T)
    state, tx = init_flow_state(jax.random.PRNGKey(0), config, raft_params,
                                sample_shape=(1, L_T, H, W))
    step = jax.jit(make_flow_train_step(config, tx, raft_iters=RAFT_ITERS),
                   donate_argnums=(0,))
    _time_step("flow step (432x240, 10f, b=1)", step, state,
               _batch(rng_np, L_T, False))


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    rng_np = np.random.default_rng(0)

    from propainter_tpu.models.raft import RAFT

    raft_params = RAFT().init(
        jax.random.PRNGKey(2), jnp.zeros((1, 128, 128, 3)),
        jnp.zeros((1, 128, 128, 3)), iters=1)["params"]

    # fresh copies per bench: the donated train state embeds these params,
    # so stepping deletes the shared buffers
    copy = lambda t: jax.tree.map(jnp.array, t)
    if which in ("flow", "both"):
        bench_flow(rng_np, copy(raft_params))
    if which in ("gan", "both"):
        bench_gan(rng_np, copy(raft_params))


if __name__ == "__main__":
    main()
