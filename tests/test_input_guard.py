"""Sub-128px input guard: auto-pad into RAFT's valid domain.

Below 128 px the coarsest RAFT corr-pyramid level degenerates and the torch
reference silently emits NaN flow -> all-black uint8 output. The framework
pads such inputs to 128 (replicate frames / zero masks — the reference's
unused InputPadder remedy, RAFT/utils/utils.py:7-24), inpaints, and crops
back, so small inputs produce real output instead of garbage.
"""

import numpy as np
import jax
import jax.numpy as jnp

from propainter_tpu.models.raft import RAFT
from propainter_tpu.models.flow_completion import RecurrentFlowCompleteNet
from propainter_tpu.models.propainter import InpaintGenerator
from propainter_tpu.pipeline import ProPainterPipeline, PipelineConfig


def test_sub128_input_autopads_to_valid_output(rng):
    T, H, W = 4, 100, 120  # below RAFT's valid domain in both dims
    key = jax.random.PRNGKey(0)
    raft = RAFT().init(key, jnp.zeros((1, 128, 128, 3)),
                       jnp.zeros((1, 128, 128, 3)), iters=1)["params"]
    fc = RecurrentFlowCompleteNet().init(
        key, jnp.zeros((1, 2, 128, 128, 2)),
        jnp.zeros((1, 2, 128, 128, 1)))["params"]
    gen = InpaintGenerator().init(
        key, jnp.zeros((1, 3, 128, 128, 3)),
        (jnp.zeros((1, 1, 128, 128, 2)), jnp.zeros((1, 1, 128, 128, 2))),
        jnp.zeros((1, 3, 128, 128, 1)), jnp.zeros((1, 3, 128, 128, 1)),
        2)["params"]
    pipe = ProPainterPipeline(
        raft, fc, gen,
        PipelineConfig(ref_stride=4, neighbor_length=4, raft_iter=2))

    frames = rng.integers(0, 255, (T, H, W, 3), np.uint8)
    mask = np.zeros((T, H, W), np.uint8)
    mask[:, 40:70, 50:90] = 1

    out = pipe.inpaint_video(frames, mask, mask)
    assert len(out) == T and out[0].shape == (H, W, 3)
    out = np.stack(out)
    # finite everywhere and NOT the reference's all-black NaN failure
    assert np.isfinite(out.astype(np.float32)).all()
    hole = out[:, 42:68, 52:88]
    assert hole.mean() > 1.0, "hole region is black — NaN leaked through"
    # non-hole pixels pass through the composite exactly
    np.testing.assert_array_equal(out[0, :30, :40], frames[0, :30, :40])
