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
    """Each pipeline stage, sharded over the mesh, matches the unsharded run.

    64x96 is below RAFT's valid domain (coarsest corr-pyramid level under
    2x2 -> NaN, faithful to the reference; tests/test_pipeline_parity.py:243),
    so RAFT is compared at 128x128 and stages 2-4 get finite substitute
    flows — a NaN pipeline would make every comparison vacuous (NaN casts
    to uint8 zero on both sides).
    """
    T, H, W = 8, 64, 96
    raft, fc, gen = _params(H, W)
    frames_np = rng.integers(0, 255, (T, H, W, 3), np.uint8)
    mask = np.zeros((T, H, W), np.uint8)
    mask[:, 20:40, 30:60] = 1

    base_cfg = dict(ref_stride=4, neighbor_length=4, subvideo_length=6,
                    raft_iter=2, window_batch=4)
    plain = ProPainterPipeline(raft, fc, gen, PipelineConfig(**base_cfg))
    sharded = ProPainterPipeline(
        raft, fc, gen, PipelineConfig(**base_cfg, shard_inference=True))
    assert sharded._batch_sharding is not None

    # ---- stage 1 at a RAFT-valid size (params are shape-independent) ----
    fr_big = jnp.asarray(
        rng.uniform(-1, 1, (1, 4, 128, 128, 3)).astype(np.float32))
    for a, b in zip(plain.compute_flows(fr_big), sharded.compute_flows(fr_big)):
        assert np.isfinite(np.asarray(a)).all()
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)

    # ---- stages 2-4 with finite flows ----
    frames = (jnp.asarray(frames_np)[None].astype(jnp.float32)
              / 255.0 * 2.0 - 1.0)
    masks = jnp.asarray(mask)[None, ..., None].astype(jnp.float32)
    flows = (jnp.asarray(rng.standard_normal(
                 (1, T - 1, H, W, 2)).astype(np.float32)),
             jnp.asarray(rng.standard_normal(
                 (1, T - 1, H, W, 2)).astype(np.float32)))
    outs = []
    for pipe in (plain, sharded):
        pred = pipe.complete_flows(flows, masks)
        uf, um = pipe.propagate_images(frames, pred, masks)
        outs.append(np.asarray(
            pipe.generate(uf, pred, masks, um, frames_np)))
    assert np.isfinite(outs[0].astype(np.float32)).all()
    # non-hole pixels pass through the composite exactly
    np.testing.assert_array_equal(outs[0][0, :10, :20],
                                  frames_np[0, :10, :20])
    # identical program, different device layout: allow 1 uint8 LSB
    assert np.max(np.abs(outs[0].astype(int) - outs[1].astype(int))) <= 1


def test_equal_chunk_schedule_invariants():
    from propainter_tpu.pipeline import equal_chunk_schedule

    for length, n, pad in [(39, 8, 5), (80, 8, 10), (100, 4, 5),
                           (17, 2, 5), (64, 8, 10)]:
        sched = equal_chunk_schedule(length, n, pad)
        if sched is None:
            continue
        L = sched[0][1] - sched[0][0]
        covered = []
        for (s, e, os, oe) in sched:
            assert e - s == L  # equal chunk length (stackable)
            assert 0 <= s and e <= length
            if oe > os:
                assert s <= os and oe <= e
                # pad-frame margin except at the video boundary
                if os > 0:
                    assert os - s >= pad
                if oe < length:
                    assert e - oe >= pad
                covered.extend(range(os, oe))
        assert covered == list(range(length))  # outputs tile the video

    # too short to split -> None (caller falls back)
    assert equal_chunk_schedule(7, 8, 5) is None
    # n_chunks < 2 -> None, not ZeroDivisionError
    assert equal_chunk_schedule(80, 1, 5) is None
    assert equal_chunk_schedule(80, 0, 5) is None


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs a multi-device mesh")
def test_sharded_chunk_stages_match_sequential(rng):
    """Stages 2+3 sharded (one batched call, chunk axis over the mesh) must
    equal running the SAME equal-chunk schedule sequentially — the batched
    program is the same math in a different layout."""
    from propainter_tpu.pipeline import equal_chunk_schedule

    # sub=4 so the quality guard (each chunk >= subvideo_length of context,
    # in device multiples) admits 8 chunks: (39//4)//8*8 = 8
    T, H, W = 40, 64, 96
    sub = 4
    raft, fc, gen = _params(H, W)
    cfg = PipelineConfig(subvideo_length=sub, raft_iter=1,
                         shard_inference=True)
    pipe = ProPainterPipeline(raft, fc, gen, cfg)
    assert pipe._batch_sharding is not None

    ff = jnp.asarray(rng.standard_normal((1, T - 1, H, W, 2)).astype(np.float32))
    fb = jnp.asarray(rng.standard_normal((1, T - 1, H, W, 2)).astype(np.float32))
    masks = jnp.asarray(
        (rng.uniform(size=(1, T, H, W, 1)) > 0.8).astype(np.float32))
    frames = jnp.asarray(
        rng.uniform(-1, 1, (1, T, H, W, 3)).astype(np.float32))

    # ---- stage 2 ----
    pf_sh, pb_sh = pipe.complete_flows((ff, fb), masks)
    n_dev = pipe._batch_sharding.mesh.size
    n_chunks = ((T - 1) // sub) // n_dev * n_dev
    sched = equal_chunk_schedule(T - 1, n_chunks, 5)
    assert sched is not None, "test must exercise the sharded path"
    pf_seq, pb_seq = [], []
    for (s, e, os, oe) in sched:
        if oe <= os:
            continue
        cf, cb = pipe._complete_flow(pipe._flowcomp_params_c,
                                     ff[:, s:e], fb[:, s:e],
                                     masks[:, s : e + 1])
        pf_seq.append(cf[:, os - s : oe - s])
        pb_seq.append(cb[:, os - s : oe - s])
    np.testing.assert_allclose(np.asarray(pf_sh),
                               np.asarray(jnp.concatenate(pf_seq, 1)),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(pb_sh),
                               np.asarray(jnp.concatenate(pb_seq, 1)),
                               rtol=2e-5, atol=2e-5)

    # ---- stage 3 ----
    uf_sh, um_sh = pipe.propagate_images(frames, (pf_sh, pb_sh), masks)
    sched3 = equal_chunk_schedule(T, n_chunks, 10)
    if sched3 is None:
        return
    uf_seq, um_seq = [], []
    for (s, e, os, oe) in sched3:
        if oe <= os:
            continue
        cf, cm = pipe._img_prop(frames[:, s:e], pf_sh[:, s : e - 1],
                                pb_sh[:, s : e - 1], masks[:, s:e])
        uf_seq.append(cf[:, os - s : oe - s])
        um_seq.append(cm[:, os - s : oe - s])
    np.testing.assert_allclose(np.asarray(uf_sh),
                               np.asarray(jnp.concatenate(uf_seq, 1)),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(um_sh),
                               np.asarray(jnp.concatenate(um_seq, 1)),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs a multi-device mesh")
def test_sharded_stage1_lowering_carries_mesh_sharding(rng):
    """Layout regression guard (cheap): the sharded pipeline's stage-1
    lowering must carry the 8-way batch sharding annotation for the frame
    axis — catching a dropped with_sharding_constraint without paying for
    execution."""
    H, W = 64, 96
    raft, fc, gen = _params(H, W)
    pipe = ProPainterPipeline(
        raft, fc, gen, PipelineConfig(raft_iter=1, shard_inference=True))
    assert pipe._batch_sharding is not None
    n_dev = pipe._batch_sharding.mesh.size
    frames = jnp.zeros((1, n_dev, H, W, 3), jnp.float32)
    txt = pipe._raft_bi.lower(pipe.raft_params, frames, iters=1).as_text()
    # Shardy (sdy) dialect: the mesh declares the 8-way 'data' axis and the
    # frame-batch tensors carry explicit sharding constraints on it
    assert f'"data"={n_dev}' in txt, "mesh axis declaration missing"
    assert 'sdy.sharding_constraint' in txt and '[{"data"}' in txt, (
        "stage-1 lowering lost the mesh sharding annotation")
