"""SAM parity: the flax model (models/sam.py) vs an independent torch
implementation of the published architecture (tests/torch_sam.py), with
weights converted through `convert_sam_state_dict`.

Uses a scaled-down config (4x4 grid, windowed + global blocks both present)
so the full pipeline — ViT with windowing + decomposed rel-pos, prompt
encoder, two-way decoder — runs in seconds on CPU. A separate test checks
the converter against the real released checkpoints' key schema (vit_b
shapes) without running the 1024^2 forward.
"""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from propainter_tpu.models.sam import (
    Sam, SamConfig, convert_sam_state_dict)
from propainter_tpu.convert import assert_tree_shapes_match
from tests import torch_sam


TINY = SamConfig(
    embed_dim=32, depth=3, num_heads=2, global_attn_indexes=(1,),
    img_size=64, patch_size=16, window_size=3, mlp_ratio=2.0,
    out_chans=32, mask_in_chans=8, decoder_depth=2, decoder_num_heads=2,
    decoder_mlp_dim=64)


def _randomize(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            fan_in = int(np.prod(p.shape[1:])) if p.ndim > 1 else 1
            p.copy_(torch.randn(p.shape, generator=g) / max(fan_in, 1) ** 0.5)
        for b in model.buffers():  # pe gaussian matrix
            b.copy_(torch.randn(b.shape, generator=g))
    return model


@pytest.fixture(scope="module")
def torch_model():
    net = torch_sam.Sam(TINY)
    _randomize(net)
    net.eval()
    return net


@pytest.fixture(scope="module")
def jax_params(torch_model):
    params = convert_sam_state_dict(torch_model.state_dict())
    g4 = 4 * TINY.grid
    ref = jax.eval_shape(
        lambda: Sam(TINY).init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, TINY.img_size, TINY.img_size, 3)),
            jnp.zeros((1, 4, 2)), jnp.zeros((1, 4), jnp.int32),
            jnp.zeros((1, g4, g4, 1))))["params"]
    assert_tree_shapes_match(params, ref)
    return params


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(0)
    img = rng.standard_normal((1, TINY.img_size, TINY.img_size, 3),
                              np.float32)
    coords = np.array([[[10.0, 20.0], [40.0, 33.0], [0.0, 0.0], [5.0, 60.0]]],
                      np.float32)
    labels = np.array([[1, 0, -1, 2]], np.int32)  # fg, bg, pad, box corner
    return img, coords, labels


def test_full_forward_parity(torch_model, jax_params, inputs):
    img, coords, labels = inputs
    with torch.no_grad():
        t_masks, t_iou = torch_model(
            torch.from_numpy(np.moveaxis(img, -1, 1)),
            torch.from_numpy(coords), torch.from_numpy(labels))
    j_masks, j_iou = Sam(TINY).apply(
        {"params": jax_params}, jnp.asarray(img), jnp.asarray(coords),
        jnp.asarray(labels))
    np.testing.assert_allclose(
        np.asarray(j_masks), t_masks.numpy(), atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(j_iou), t_iou.numpy(), atol=2e-3, rtol=1e-3)


def test_mask_prompt_parity(torch_model, jax_params, inputs):
    img, coords, labels = inputs
    rng = np.random.default_rng(1)
    g4 = 4 * TINY.grid
    mask_in = rng.standard_normal((1, g4, g4), np.float32)
    with torch.no_grad():
        t_masks, t_iou = torch_model(
            torch.from_numpy(np.moveaxis(img, -1, 1)),
            torch.from_numpy(coords), torch.from_numpy(labels),
            torch.from_numpy(mask_in[:, None]))
    j_masks, j_iou = Sam(TINY).apply(
        {"params": jax_params}, jnp.asarray(img), jnp.asarray(coords),
        jnp.asarray(labels), jnp.asarray(mask_in[..., None]))
    np.testing.assert_allclose(
        np.asarray(j_masks), t_masks.numpy(), atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(j_iou), t_iou.numpy(), atol=2e-3, rtol=1e-3)


def test_rel_pos_resize_matches_torch():
    """Table interpolation path (used when loading 1024-trained weights at a
    different grid) matches F.interpolate(align_corners=True)."""
    from propainter_tpu.models.sam import _rel_pos_table

    rng = np.random.default_rng(2)
    rel = rng.standard_normal((7, 4), np.float32)  # trained for size 4
    size = 6                                       # need 11 rows
    ours = np.asarray(_rel_pos_table(jnp.asarray(rel), size))
    theirs = torch_sam._rel_pos_table(torch.from_numpy(rel), size).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


@pytest.mark.parametrize("variant", ["vit_b", "vit_l", "vit_h"])
def test_vit_checkpoint_schema(variant):
    """convert_sam_state_dict maps the released checkpoints' exact key
    schema for every variant the reference demo downloads
    (sam_vit_b_01ec64 / sam_vit_l_0b3195 / sam_vit_h_4b8939.pth,
    weights/README.md). Build a synthetic state dict from the torch mirror
    (same module tree as segment_anything's build_sam.py) and shape-match
    the conversion against the flax init — without running a 1024^2
    forward."""
    cfg = getattr(SamConfig, variant)()
    net = torch_sam.Sam(cfg)
    sd = {k: v for k, v in net.state_dict().items()}
    # spot-check the schema contains the well-known released-checkpoint keys
    for key in [
        "image_encoder.patch_embed.proj.weight",
        "image_encoder.pos_embed",
        "image_encoder.blocks.0.attn.qkv.weight",
        "image_encoder.blocks.0.attn.rel_pos_h",
        "image_encoder.neck.0.weight",
        "prompt_encoder.pe_layer.positional_encoding_gaussian_matrix",
        "prompt_encoder.point_embeddings.0.weight",
        "prompt_encoder.not_a_point_embed.weight",
        "prompt_encoder.mask_downscaling.0.weight",
        "mask_decoder.transformer.layers.0.self_attn.q_proj.weight",
        "mask_decoder.transformer.final_attn_token_to_image.q_proj.weight",
        "mask_decoder.iou_token.weight",
        "mask_decoder.mask_tokens.weight",
        "mask_decoder.output_upscaling.0.weight",
        "mask_decoder.output_hypernetworks_mlps.0.layers.0.weight",
        "mask_decoder.iou_prediction_head.layers.0.weight",
    ]:
        assert key in sd, key
    # windowed blocks: (2*window_size - 1, head_dim); the first global
    # block: (2*grid - 1, head_dim). head_dim = 64/64/80 for vit_b/l/h.
    head_dim = cfg.embed_dim // cfg.num_heads
    g0 = cfg.global_attn_indexes[0]
    assert sd["image_encoder.blocks.0.attn.rel_pos_h"].shape == (27, head_dim)
    assert sd[f"image_encoder.blocks.{g0}.attn.rel_pos_h"].shape == (
        2 * cfg.grid - 1, head_dim)
    assert len([k for k in sd if k.startswith("image_encoder.blocks.")
                and k.endswith(".attn.qkv.weight")]) == cfg.depth

    params = convert_sam_state_dict(sd)
    g4 = 4 * cfg.grid
    ref = jax.eval_shape(
        lambda: Sam(cfg).init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.img_size, cfg.img_size, 3)),
            jnp.zeros((1, 4, 2)), jnp.zeros((1, 4), jnp.int32),
            jnp.zeros((1, g4, g4, 1))))["params"]
    assert_tree_shapes_match(params, ref)


def test_segmenter_exact_padding_matches_torch_predictor():
    """Default segmenter padding = the reference SamPredictor's exact scheme
    (n real clicks + ONE not-a-point token): decoder outputs must match the
    torch mirror fed the identically-padded prompt. Also bounds the drift of
    the opt-in fixed-bucket mode, whose extra pad tokens perturb decoder
    attention."""
    from propainter_tpu.demo.segmenter import SamSegmenter

    net = torch_sam.Sam(TINY)
    _randomize(net, seed=5)
    params = convert_sam_state_dict(net.state_dict())
    rng = np.random.default_rng(5)
    image = rng.integers(0, 255, (48, 64, 3), np.uint8)
    clicks = np.array([[30.0, 20.0], [50.0, 36.0]], np.float32)
    labels = np.array([1, 0], np.int32)

    seg = SamSegmenter(params, config=TINY)  # default: exact n+1 padding
    seg.set_image(image)
    coords_j, labels_j = seg._pack_points(clicks, labels)
    assert coords_j.shape == (1, 3, 2), "exactly one pad point"
    assert int(labels_j[0, -1]) == -1
    _, scores, logits = seg.predict(
        {"point_coords": clicks, "point_labels": labels}, "point")

    # torch mirror: same cv2-resized/normalized/padded image, same scaled
    # coords, the same single pad token
    from propainter_tpu.models.sam import SAM_PIXEL_MEAN, SAM_PIXEL_STD
    import cv2

    nh, nw = seg.input_size
    resized = cv2.resize(image, (nw, nh), interpolation=cv2.INTER_LINEAR)
    x = (resized.astype(np.float32) - SAM_PIXEL_MEAN) / SAM_PIXEL_STD
    pad = np.zeros((TINY.img_size, TINY.img_size, 3), np.float32)
    pad[:nh, :nw] = x
    with torch.no_grad():
        t_masks, t_iou = net(
            torch.from_numpy(np.moveaxis(pad[None], -1, 1)),
            torch.from_numpy(np.asarray(coords_j)),
            torch.from_numpy(np.asarray(labels_j)))
    np.testing.assert_allclose(logits, t_masks.numpy()[0, 1:],
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(scores, t_iou.numpy()[0, 1:],
                               atol=2e-3, rtol=1e-3)

    # opt-in bucket mode: drift from the extra not-a-point tokens exists but
    # stays small relative to the logit scale
    seg_b = SamSegmenter(params, config=TINY, points_bucket=8)
    seg_b.set_image(image)
    cb, lb = seg_b._pack_points(clicks, labels)
    assert cb.shape == (1, 8, 2)
    _, scores_b, logits_b = seg_b.predict(
        {"point_coords": clicks, "point_labels": labels}, "point")
    drift = np.max(np.abs(logits_b - logits))
    scale = np.max(np.abs(logits)) + 1e-6
    assert drift / scale < 0.25, f"bucket-mode drift too large: {drift}"


def test_segmenter_predict_api():
    """SamSegmenter behaves like BaseSegmenter.predict: non-square image,
    point/both modes, shapes and thresholding."""
    from propainter_tpu.demo.segmenter import SamSegmenter, SamControler

    net = torch_sam.Sam(TINY)
    _randomize(net, seed=3)
    params = convert_sam_state_dict(net.state_dict())
    seg = SamSegmenter(params, config=TINY, points_bucket=4)
    rng = np.random.default_rng(3)
    image = rng.integers(0, 255, (48, 64, 3), np.uint8)
    seg.set_image(image)
    prompts = {"point_coords": np.array([[30.0, 20.0]]),
               "point_labels": np.array([1])}
    masks, scores, logits = seg.predict(prompts, "point", multimask=True)
    assert masks.shape == (3, 48, 64) and masks.dtype == bool
    assert scores.shape == (3,)
    g4 = 4 * TINY.grid
    assert logits.shape == (3, g4, g4)
    # 'both' mode consumes the logits back (the demo's refine pass)
    prompts["mask_input"] = logits[np.argmax(scores)][None]
    masks2, scores2, logits2 = seg.predict(prompts, "both", multimask=True)
    assert masks2.shape == (3, 48, 64)
    # single-mask mode
    masks1, scores1, _ = seg.predict(prompts, "point", multimask=False)
    assert masks1.shape == (1, 48, 64) and scores1.shape == (1,)

    ctrl = SamControler(seg)
    seg.reset_image()
    mask, logit, painted = ctrl.first_frame_click(
        image, np.array([[30.0, 20.0]]), np.array([1]))
    assert mask.shape == (48, 64) and mask.dtype == np.uint8
    assert logit.shape == (48, 64)
    assert painted.shape == image.shape
