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
