"""Demo layer (L6): segmenter, flow tracker, facade wiring."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def raft_params():
    from propainter_tpu.models.raft import RAFT

    H, W = 64, 96
    return RAFT().init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)),
                       jnp.zeros((1, H, W, 3)), iters=1)["params"]


def _scene(t, H=64, W=96):
    """Frame with a bright square moving right by 2px/frame."""
    img = np.full((H, W, 3), 30, np.uint8)
    x = 20 + 2 * t
    img[20:40, x : x + 20] = 220
    return img


def test_click_segmenter_finds_square():
    from propainter_tpu.demo import ClickSegmenter

    img = _scene(0)
    seg = ClickSegmenter()
    mask, logit, painted = seg.first_frame_click(
        img, np.array([[30, 30]]), np.array([1]))
    assert mask.shape == img.shape[:2] and mask.dtype == np.uint8
    assert mask[30, 30] == 1
    assert logit.dtype == np.float32
    assert painted.shape == img.shape

    # probe: background click suppresses the region
    mask2, _, _ = seg.first_frame_click(
        img, np.array([[30, 30], [5, 5]]), np.array([1, 0]))
    assert mask2[5, 5] == 0


def test_flow_tracker_api(raft_params):
    from propainter_tpu.demo import FlowMaskTracker

    tracker = FlowMaskTracker(raft_params, raft_iter=2)
    frames = [_scene(t) for t in range(3)]
    template = np.zeros((64, 96), np.uint8)
    template[20:40, 20:40] = 1

    m0, l0, p0 = tracker.track(frames[0], template)
    np.testing.assert_array_equal(m0, template)
    for f in frames[1:]:
        m, l, p = tracker.track(f)
        assert m.shape == template.shape and m.dtype == np.uint8
        assert l.shape == template.shape
    # random-weight flow won't track correctly; API + shape contract only.
    tracker.clear_memory()
    assert tracker._mask is None


def test_facade_requires_gradio_free_api(raft_params):
    """The facade composes without gradio installed."""
    from propainter_tpu.demo.tracking import TrackingFacade, paint_mask

    class _StubInpainter:
        def inpaint(self, frames, masks, **kw):
            return frames

    facade = TrackingFacade.__new__(TrackingFacade)
    from propainter_tpu.demo import ClickSegmenter, FlowMaskTracker

    facade.segmenter = ClickSegmenter()
    facade.tracker = FlowMaskTracker(raft_params, raft_iter=2)
    facade.inpainter = _StubInpainter()

    frames = [_scene(t) for t in range(2)]
    template = np.zeros((64, 96), np.uint8)
    template[20:40, 20:40] = 1
    masks, logits, painted = facade.generator(frames, template)
    assert len(masks) == 2
    out = facade.inpaint(np.stack(frames), np.stack(masks))
    assert out.shape == np.stack(frames).shape

    pm = paint_mask(frames[0], template)
    assert pm.shape == frames[0].shape and pm.dtype == np.uint8


def test_facade_selects_sam_segmenter(monkeypatch):
    """params['sam'] present -> the facade builds the SAM stack (the
    reference demo always runs SAM; GrabCut is the weight-free fallback)."""
    import propainter_tpu.api as api_mod
    from propainter_tpu.demo.segmenter import SamControler
    from propainter_tpu.demo.tracking import TrackingFacade, FlowMaskTracker
    from tests.test_sam_parity import TINY, _randomize
    from tests import torch_sam
    from propainter_tpu.models.sam import convert_sam_state_dict

    class _StubInpainter:
        def __init__(self, params, **kw):
            pass

    monkeypatch.setattr(api_mod, "ProInpainter", _StubInpainter)
    sam_params = convert_sam_state_dict(
        _randomize(torch_sam.Sam(TINY), 11).state_dict())

    class _StubTracker:
        def clear_memory(self):
            pass

    facade = TrackingFacade({"sam": sam_params}, tracker=_StubTracker())
    assert isinstance(facade.segmenter, SamControler)
    facade.segmenter.sam_controler.config = TINY
    facade.segmenter.sam_controler.model = __import__(
        "propainter_tpu.models.sam", fromlist=["Sam"]).Sam(TINY)


# ---------------------------------------------------------------------------
# Painters (pixel parity vs the reference tools/painter.py + mask_painter.py)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ref_painter():
    from tests.torch_ref import import_cutie_module

    return import_cutie_module("tools.painter")


@pytest.fixture(scope="module")
def painter_inputs():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (72, 96, 3), np.uint8)
    mask = np.zeros((72, 96), np.uint8)
    mask[20:48, 30:70] = 1
    mask[10:16, 10:20] = 1  # second component exercises the contour field
    return img, mask


def test_colormap_matches_reference(ref_painter):
    from propainter_tpu.demo.painters import colormap

    np.testing.assert_array_equal(colormap(), ref_painter.colormap())
    np.testing.assert_array_equal(colormap(False), ref_painter.colormap(False))


def test_mask_painter_pixel_parity(ref_painter, painter_inputs):
    from propainter_tpu.demo.painters import mask_painter

    img, mask = painter_inputs
    ours = mask_painter(img.copy(), mask, mask_color=3, mask_alpha=0.7,
                        contour_color=1, contour_width=5)
    theirs = ref_painter.mask_painter(img.copy(), mask, 3, 0.7, 1, 5)
    np.testing.assert_array_equal(ours, theirs)


def test_point_painter_pixel_parity(ref_painter, painter_inputs):
    from propainter_tpu.demo.painters import point_painter

    img, _ = painter_inputs
    pts = np.array([[40, 30], [70, 50]])
    ours = point_painter(img.copy(), pts, 8, 0.9, 15, 2, 5)
    theirs = ref_painter.point_painter(img.copy(), pts, 8, 0.9, 15, 2, 5)
    np.testing.assert_array_equal(ours, theirs)


def test_background_remover_matches_reference(ref_painter, painter_inputs):
    from propainter_tpu.demo.painters import background_remover

    img, mask = painter_inputs
    ours = background_remover(img, mask)
    theirs = np.asarray(ref_painter.background_remover(img, mask))
    np.testing.assert_array_equal(ours, theirs)


def test_mask_painter_blur_pixel_parity(painter_inputs):
    from tests.torch_ref import import_cutie_module
    from propainter_tpu.demo.painters import mask_painter_blur

    ref_mp = import_cutie_module("tools.mask_painter")
    img, mask = painter_inputs
    for mode in ("00", "01", "10", "11"):
        ours = mask_painter_blur(img.copy(), mask, 0.5, 7, 3, 3, 1, mode)
        theirs = ref_mp.mask_painter(img.copy(), mask, 0.5, 7, 3, 3, 1, mode)
        np.testing.assert_array_equal(ours, theirs, err_msg=f"mode {mode}")


# ---------------------------------------------------------------------------
# Multi-mask session (reference app.py:166-230 semantics, gradio-free)
# ---------------------------------------------------------------------------


def test_multimask_session_add_show_template():
    from propainter_tpu.demo.multimask import MultiMaskSession

    H, W = 48, 64
    m1 = np.zeros((H, W), np.uint8)
    m1[10:20, 10:30] = 1
    m2 = np.zeros((H, W), np.uint8)
    m2[15:30, 25:45] = 1  # overlaps m1

    s = MultiMaskSession()
    assert s.add_mask(m1) == "mask_001"
    assert s.add_mask(m2) == "mask_002"
    assert s.mask_names == ["mask_001", "mask_002"]

    # template: mask k -> label k+1; overlap clips to the later id
    # (app.py:216-224)
    t = s.template_mask(["mask_001", "mask_002"])
    assert set(np.unique(t)) == {0, 1, 2}
    assert (t[16, 26] == 2) and (t[11, 11] == 1)
    # single selection
    t1 = s.template_mask(["mask_002"])
    assert set(np.unique(t1)) <= {0, 2}

    frame = np.full((H, W, 3), 128, np.uint8)
    painted = s.show(frame.copy(), ["mask_002", "mask_001"])  # sorts
    assert painted.shape == frame.shape
    assert (painted != frame).any()

    s.remove_all()
    assert s.masks == [] and s.mask_names == []
    with pytest.raises(ValueError):
        s.template_mask(["mask_001"])


class _RecordingFacade:
    """Deterministic facade stub: the tracker labels every frame with the
    template mask unchanged; painted frames are originals + 100."""

    def __init__(self):
        self.inpaint_calls = []

    def generator(self, images, template_mask):
        masks = [np.asarray(template_mask)] * len(images)
        painted = [np.asarray(im) + 100 for im in images]
        return masks, [None] * len(images), painted

    def inpaint(self, frames, masks, **kw):
        self.inpaint_calls.append((np.asarray(masks).copy(), kw))
        return np.asarray(frames)


def test_two_step_session_track_then_inpaint():
    """Reference two-stage flow (app.py:203-296): Track stores full-video
    masks + a painted preview; Inpaint consumes the FULL video and filters
    mask ids by the current dropdown selection without re-tracking."""
    from propainter_tpu.demo.session import TwoStepSession

    H, W = 48, 64
    frames = [np.full((H, W, 3), 10 * t, np.uint8) for t in range(6)]
    m1 = np.zeros((H, W), np.uint8)
    m1[5:15, 5:25] = 1
    m2 = np.zeros((H, W), np.uint8)
    m2[20:35, 30:50] = 1

    facade = _RecordingFacade()
    s = TwoStepSession(facade)
    s.reset(frames)
    s.multi.add_mask(m1)
    s.multi.add_mask(m2)

    # inpaint before track must refuse (the reference prompts the user)
    with pytest.raises(ValueError):
        s.inpaint(["mask_001"])

    # track from frame 2 to 5 (exclusive): masks outside stay zero,
    # painted preview keeps the original prefix/suffix (app.py:239-246)
    painted = s.track(["mask_001", "mask_002"], select_frame=2, track_end=5)
    assert len(painted) == 6
    np.testing.assert_array_equal(painted[0], frames[0])
    np.testing.assert_array_equal(painted[2], frames[2] + 100)
    np.testing.assert_array_equal(painted[5], frames[5])
    assert s.masks[0] is None and s.masks[2] is not None

    # inpaint with only mask_002 selected: id 1 zeroed, id 2 kept
    # (app.py:272-284); full video passed through
    s.inpaint(["mask_002"], dilate_radius=3)
    masks_sent, kw = facade.inpaint_calls[-1]
    assert masks_sent.shape == (6, H, W)
    assert set(np.unique(masks_sent[2])) == {0, 2}
    assert masks_sent[0].max() == 0 and masks_sent[5].max() == 0
    assert kw == {"dilate_radius": 3}

    # different selection re-inpaints WITHOUT re-tracking
    s.inpaint(["mask_001", "mask_002"])
    masks_sent2, _ = facade.inpaint_calls[-1]
    assert set(np.unique(masks_sent2[2])) == {0, 1, 2}

    # empty selection falls back to mask_001 (app.py:213-214, 273-274)
    s.inpaint([])
    masks_sent3, _ = facade.inpaint_calls[-1]
    assert set(np.unique(masks_sent3[2])) == {0, 1}


def test_two_step_session_single_mask_fallback():
    """No Added masks: track falls back to the click mask (the reference
    uses video_state['masks'][select] when multi_mask is empty)."""
    from propainter_tpu.demo.session import TwoStepSession

    frames = [np.zeros((32, 40, 3), np.uint8) for _ in range(3)]
    mask = np.zeros((32, 40), np.uint8)
    mask[4:10, 4:10] = 1

    facade = _RecordingFacade()
    s = TwoStepSession(facade)
    s.reset(frames)
    with pytest.raises(ValueError):
        s.track([], 0)  # no mask anywhere
    s.track([], 0, single_mask=mask)
    np.testing.assert_array_equal(s.masks[0], mask)
    s.inpaint([])
    masks_sent, _ = facade.inpaint_calls[-1]
    np.testing.assert_array_equal(masks_sent[1], mask)
