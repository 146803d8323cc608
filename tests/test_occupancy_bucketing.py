"""Stage-4 occupancy bucketing is bit-exact vs the dense dual-branch.

Branch-A attention (cross-frame, ~85% of block FLOPs) runs on only a
power-of-2 bucket of the windows that contain hole tokens
(models.propainter.masked_window_bitmap + the masked_windows argument).
Clean windows take branch B either way and masked windows compute the same
math, so outputs must be IDENTICAL — these tests pin that, plus the
bitmap's exact agreement with the attention's internal occupancy.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from propainter_tpu.models.propainter import (
    InpaintGenerator, masked_window_bitmap)
from propainter_tpu.models.raft import RAFT
from propainter_tpu.models.flow_completion import RecurrentFlowCompleteNet
from propainter_tpu.pipeline import ProPainterPipeline, PipelineConfig

T, l_t, H, W = 6, 4, 64, 96


def _bucket_from_bitmap(bm, m_b):
    idxs = np.zeros((bm.shape[0], m_b), np.int32)
    valids = np.zeros((bm.shape[0], m_b), np.bool_)
    for gi, row in enumerate(np.asarray(bm)):
        nz = np.nonzero(row)[0]
        if len(nz):
            idxs[gi] = np.resize(nz, m_b)
            valids[gi] = True
    return jnp.asarray(idxs), jnp.asarray(valids)


@pytest.fixture(scope="module")
def gen_and_params():
    model = InpaintGenerator()
    key = jax.random.PRNGKey(0)
    params = model.init(
        key, jnp.zeros((1, T, H, W, 3)),
        (jnp.zeros((1, l_t - 1, H, W, 2)), jnp.zeros((1, l_t - 1, H, W, 2))),
        jnp.zeros((1, T, H, W, 1)), jnp.zeros((1, T, H, W, 1)),
        l_t)["params"]
    return model, params


def _inputs(rng, mask_region):
    frames = jnp.asarray(rng.uniform(-1, 1, (1, T, H, W, 3)), jnp.float32)
    flows = (jnp.asarray(rng.standard_normal((1, l_t - 1, H, W, 2)),
                         jnp.float32),
             jnp.asarray(rng.standard_normal((1, l_t - 1, H, W, 2)),
                         jnp.float32))
    mask = np.zeros((1, T, H, W, 1), np.float32)
    y0, y1, x0, x1 = mask_region
    mask[:, :, y0:y1, x0:x1] = 1.0
    return frames, flows, jnp.asarray(mask)


def test_generator_bucketed_equals_dense(gen_and_params, rng):
    model, params = gen_and_params
    frames, flows, masks = _inputs(rng, (20, 36, 30, 58))

    out_dense = model.apply({"params": params}, frames, flows, masks, masks,
                            l_t, masked_windows=None)

    bm = masked_window_bitmap(masks[:, :l_t])
    m = int(jnp.sum(bm[0]))
    nW = bm.shape[1]
    assert 0 < m < nW, f"test mask must cover some but not all windows ({m}/{nW})"
    m_b = 1
    while m_b < m:
        m_b *= 2
    mw = _bucket_from_bitmap(bm, m_b)
    out_bucket = model.apply({"params": params}, frames, flows, masks, masks,
                             l_t, masked_windows=mw)
    np.testing.assert_array_equal(np.asarray(out_dense),
                                  np.asarray(out_bucket))

    # padding semantics: duplicate slots of real masked windows scatter
    # identical values and must change nothing
    dup_idx = jnp.concatenate([mw[0], mw[0]], axis=1)
    dup_valid = jnp.concatenate([mw[1], mw[1]], axis=1)
    out_dup = model.apply({"params": params}, frames, flows, masks, masks,
                          l_t, masked_windows=(dup_idx, dup_valid))
    np.testing.assert_array_equal(np.asarray(out_dense), np.asarray(out_dup))


def test_generator_empty_mask_bucket(gen_and_params, rng):
    """m=0: all-False bucket leaves the branch-B output untouched."""
    model, params = gen_and_params
    frames, flows, _ = _inputs(rng, (0, 0, 0, 0))
    masks = jnp.zeros((1, T, H, W, 1), jnp.float32)
    out_dense = model.apply({"params": params}, frames, flows, masks, masks,
                            l_t, masked_windows=None)
    mw = (jnp.zeros((1, 1), jnp.int32), jnp.zeros((1, 1), jnp.bool_))
    out_bucket = model.apply({"params": params}, frames, flows, masks, masks,
                             l_t, masked_windows=mw)
    np.testing.assert_array_equal(np.asarray(out_dense),
                                  np.asarray(out_bucket))


def test_pipeline_bucketing_on_off_identical(rng):
    """Full stage-4 (window schedule + compositing): bucketing on == off."""
    key = jax.random.PRNGKey(0)
    raft = None  # stage 4 only
    fc = None
    gen = InpaintGenerator().init(
        key, jnp.zeros((1, T, H, W, 3)),
        (jnp.zeros((1, l_t - 1, H, W, 2)), jnp.zeros((1, l_t - 1, H, W, 2))),
        jnp.zeros((1, T, H, W, 1)), jnp.zeros((1, T, H, W, 1)),
        l_t)["params"]

    Tv = 10
    frames_np = rng.integers(0, 255, (Tv, H, W, 3), np.uint8)
    frames = (jnp.asarray(frames_np)[None].astype(jnp.float32)
              / 255.0 * 2.0 - 1.0)
    mask = np.zeros((Tv, H, W), np.uint8)
    mask[:, 24:40, 30:60] = 1
    masks = jnp.asarray(mask)[None, ..., None].astype(jnp.float32)
    flows = (jnp.asarray(rng.standard_normal((1, Tv - 1, H, W, 2)),
                         jnp.float32),
             jnp.asarray(rng.standard_normal((1, Tv - 1, H, W, 2)),
                         jnp.float32))

    outs = []
    # (occupancy_bucketing, encoder_carry): plain baseline, the default
    # fast path, and each optimization alone — all must be IDENTICAL
    for bucketing, carry in ((False, False), (True, True), (False, True),
                             (True, False)):
        pipe = ProPainterPipeline(
            raft, fc, gen,
            PipelineConfig(ref_stride=4, neighbor_length=4,
                           occupancy_bucketing=bucketing,
                           encoder_carry=carry))
        outs.append(np.asarray(
            pipe.generate(frames, flows, masks, masks, frames_np)))
    for o in outs[1:]:
        np.testing.assert_array_equal(outs[0], o)
    # and the mask region was actually generated, not passed through
    assert (outs[1][:, 26:38, 32:58] != frames_np[:, 26:38, 32:58]).mean() \
        > 0.5


def test_plan_bucket_subruns():
    from propainter_tpu.pipeline import plan_bucket_subruns

    def bm(counts, nW=16):
        out = np.zeros((len(counts), nW), bool)
        for i, c in enumerate(counts):
            out[i, :c] = True
        return out

    # uniform small counts: one sub-run at the rounded bucket
    assert plan_bucket_subruns(bm([3, 4, 2])) == [(4, [0, 1, 2])]
    # oscillating small counts merge to the max (upgrade cheaper than a
    # dispatch)
    [(b, rows)] = plan_bucket_subruns(bm([3, 7, 3, 7]))
    assert b == 8 and rows == [0, 1, 2, 3]
    # one briefly-large mask must NOT drag a long run up: split
    plans = plan_bucket_subruns(bm([4, 4, 4, 4, 4, 16]))
    assert plans == [(4, [0, 1, 2, 3, 4]), (16, [5])]
    # order is preserved and rows partition the run
    plans = plan_bucket_subruns(bm([2, 2, 12, 12, 12, 2, 2]))
    flat = [r for _, rows in plans for r in rows]
    assert flat == list(range(7))
    # counts of zero still get a (cheap) minimum bucket
    assert plan_bucket_subruns(bm([0, 0]))[0][0] == 4
