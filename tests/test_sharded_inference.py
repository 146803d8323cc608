"""Multi-chip inference sharding: 8 virtual devices == single device output.

The pipeline's embarrassingly-parallel batch axes (RAFT frame pairs, stage-4
window batches) are sharded over the mesh via with_sharding_constraint; XLA
splits the work across chips. Output must match the unsharded pipeline
exactly (same program, different layout).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from propainter_tpu.models.raft import RAFT
from propainter_tpu.models.flow_completion import RecurrentFlowCompleteNet
from propainter_tpu.models.propainter import InpaintGenerator
from propainter_tpu.pipeline import ProPainterPipeline, PipelineConfig


def _params(H, W):
    key = jax.random.PRNGKey(0)
    raft = RAFT().init(key, jnp.zeros((1, H, W, 3)), jnp.zeros((1, H, W, 3)),
                       iters=1)["params"]
    fc = RecurrentFlowCompleteNet().init(
        key, jnp.zeros((1, 2, H, W, 2)), jnp.zeros((1, 2, H, W, 1)))["params"]
    gen = InpaintGenerator().init(
        key, jnp.zeros((1, 3, H, W, 3)),
        (jnp.zeros((1, 1, H, W, 2)), jnp.zeros((1, 1, H, W, 2))),
        jnp.zeros((1, 3, H, W, 1)), jnp.zeros((1, 3, H, W, 1)), 2)["params"]
    return raft, fc, gen


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs a multi-device mesh")
def test_sharded_matches_unsharded(rng):
    T, H, W = 8, 64, 96
    raft, fc, gen = _params(H, W)
    frames = rng.integers(0, 255, (T, H, W, 3), np.uint8)
    mask = np.zeros((T, H, W), np.uint8)
    mask[:, 20:40, 30:60] = 1

    base_cfg = dict(ref_stride=4, neighbor_length=4, subvideo_length=6,
                    raft_iter=2, window_batch=4)
    plain = ProPainterPipeline(raft, fc, gen, PipelineConfig(**base_cfg))
    sharded = ProPainterPipeline(
        raft, fc, gen, PipelineConfig(**base_cfg, shard_inference=True))

    out_plain = plain.inpaint_video(frames, mask, mask)
    out_shard = sharded.inpaint_video(frames, mask, mask)
    for a, b in zip(out_plain, out_shard):
        # identical program, different device layout: allow 1 uint8 LSB
        assert np.max(np.abs(a.astype(int) - b.astype(int))) <= 1
