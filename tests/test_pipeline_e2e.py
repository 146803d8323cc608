"""End-to-end pipeline smoke test (random weights, tiny video, CPU).

Mirrors the reference's golden-path smoke run (SURVEY.md section 4) but as an
actual automated test: all 4 stages execute, shapes and dtypes are right, and
the composited output is finite. Quality requires pretrained weights, which
are not bundled in this environment.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from propainter_tpu.models.raft import RAFT
from propainter_tpu.models.flow_completion import RecurrentFlowCompleteNet
from propainter_tpu.models.propainter import InpaintGenerator
from propainter_tpu.pipeline import ProPainterPipeline, PipelineConfig


@pytest.fixture(scope="module")
def pipeline():
    H, W = 128, 160
    key = jax.random.PRNGKey(0)
    raft = RAFT()
    raft_params = raft.init(
        key, jnp.zeros((1, H, W, 3)), jnp.zeros((1, H, W, 3)), iters=1
    )["params"]
    flowcomp = RecurrentFlowCompleteNet()
    flowcomp_params = flowcomp.init(
        key, jnp.zeros((1, 2, H, W, 2)), jnp.zeros((1, 2, H, W, 1)))["params"]
    inpaint = InpaintGenerator()
    inpaint_params = inpaint.init(
        key, jnp.zeros((1, 3, H, W, 3)),
        (jnp.zeros((1, 1, H, W, 2)), jnp.zeros((1, 1, H, W, 2))),
        jnp.zeros((1, 3, H, W, 1)), jnp.zeros((1, 3, H, W, 1)), 2)["params"]
    return ProPainterPipeline(
        raft_params, flowcomp_params, inpaint_params,
        PipelineConfig(ref_stride=4, neighbor_length=4, subvideo_length=6,
                       raft_iter=2))


def test_full_pipeline(pipeline, rng):
    T, H, W = 8, 128, 160
    frames = (rng.uniform(0, 255, (T, H, W, 3))).astype(np.uint8)
    mask = np.zeros((T, H, W), np.uint8)
    mask[:, 40:70, 50:90] = 1

    out = pipeline.inpaint_video(frames, mask, mask)
    assert len(out) == T
    for f in out:
        assert f.shape == (H, W, 3)
        assert f.dtype == np.uint8
    # outside the mask, output equals input exactly (compositing)
    np.testing.assert_array_equal(out[0][0:30, 0:40], frames[0][0:30, 0:40])


def test_pipeline_chunking_consistency(pipeline, rng):
    """Chunked stages must agree with unchunked on interior frames."""
    T, H, W = 8, 128, 160
    frames01 = rng.uniform(0, 1, (1, T, H, W, 3)).astype(np.float32) * 2 - 1
    frames = jnp.asarray(frames01)
    flows = pipeline.compute_flows(frames)
    assert flows[0].shape == (1, T - 1, H, W, 2)
    assert np.isfinite(np.asarray(flows[0])).all()

    masks = jnp.asarray(
        (rng.uniform(size=(1, T, H, W, 1)) > 0.8).astype(np.float32))
    pred = pipeline.complete_flows(flows, masks)
    assert pred[0].shape == (1, T - 1, H, W, 2)

    # unchunked reference result (subvideo_length > T)
    big = ProPainterPipeline(
        pipeline.raft_params, pipeline.flowcomp_params,
        pipeline.inpaint_params,
        PipelineConfig(subvideo_length=100, raft_iter=2))
    pred_ref = big.complete_flows(flows, masks)
    # interior frames (away from chunk joins by >= pad_len) must match
    np.testing.assert_allclose(
        np.asarray(pred[0][:, 1:3]), np.asarray(pred_ref[0][:, 1:3]),
        rtol=1e-4, atol=1e-4)

    # eval protocol: unchunked=True must ignore a small subvideo_length and
    # reproduce the whole-video result exactly
    # (reference scripts/evaluate_propainter.py:127-131)
    ev = ProPainterPipeline(
        pipeline.raft_params, pipeline.flowcomp_params,
        pipeline.inpaint_params,
        PipelineConfig(subvideo_length=6, raft_iter=2, unchunked=True))
    pred_ev = ev.complete_flows(flows, masks)
    np.testing.assert_array_equal(np.asarray(pred_ev[0]),
                                  np.asarray(pred_ref[0]))
