"""InpaintGenerator parity: torch reference (random weights) vs JAX, component
by component and full forward."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from propainter_tpu.convert import assert_tree_shapes_match
from propainter_tpu.convert.torch_to_jax import convert_state_dict
from tests.torch_ref import import_reference_module, to_nchw, to_nhwc


def _randomize(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            fan_in = int(np.prod(p.shape[1:])) if p.ndim > 1 else 1
            p.copy_(torch.randn(p.shape, generator=g) / max(fan_in, 1) ** 0.5)
    return model


def _btchw(x):  # (B,T,H,W,C) numpy -> (B,T,C,H,W) torch
    return torch.from_numpy(np.moveaxis(x, -1, 2).copy())


def _from_btchw(t):
    return np.moveaxis(t.detach().numpy(), 2, -1)


@pytest.fixture(scope="module")
def ref():
    return import_reference_module("model.propainter")


@pytest.fixture(scope="module")
def ref_st():
    return import_reference_module("model.modules.sparse_transformer")


def test_encoder_parity(ref, rng):
    from propainter_tpu.models.propainter import Encoder
    tm = _randomize(ref.Encoder())
    tm.eval()
    x = rng.standard_normal((2, 64, 96, 5)).astype(np.float32)
    with torch.no_grad():
        theirs = tm(to_nchw(x))
    model = Encoder()
    params = convert_state_dict(tm.state_dict())
    ours = model.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), to_nhwc(theirs),
                               rtol=1e-3, atol=1e-3)


def test_soft_split_comp_parity(ref_st, rng):
    from propainter_tpu.models.propainter import SoftSplit, SoftComp
    tss = _randomize(ref_st.SoftSplit(128, 512, (7, 7), (3, 3), (3, 3)))
    tsc = _randomize(ref_st.SoftComp(128, 512, (7, 7), (3, 3), (3, 3)), seed=1)
    b, t, h, w = 2, 3, 30, 54
    x = rng.standard_normal((b * t, h, w, 128)).astype(np.float32)
    with torch.no_grad():
        tok_t = tss(to_nchw(x), b, (h, w))
        out_t = tsc(tok_t, t, (h, w))

    ss = SoftSplit(512)
    sc = SoftComp(128)
    ss_params = convert_state_dict(tss.state_dict())
    sc_params = convert_state_dict(tsc.state_dict())
    tok = ss.apply({"params": ss_params}, jnp.asarray(x), b, (h, w))
    np.testing.assert_allclose(np.asarray(tok), tok_t.numpy(), rtol=1e-4,
                               atol=1e-4)
    out = sc.apply({"params": sc_params}, tok, t, (h, w))
    np.testing.assert_allclose(np.asarray(out), to_nhwc(out_t), rtol=1e-4,
                               atol=1e-4)


def test_fusion_ffn_parity(ref_st, rng):
    from propainter_tpu.models.propainter import FusionFeedForward
    tm = _randomize(ref_st.FusionFeedForward(
        512, t2t_params={"kernel_size": (7, 7), "stride": (3, 3),
                         "padding": (3, 3)}))
    b, t, fh, fw = 1, 3, 10, 18
    x = rng.standard_normal((b, t * fh * fw, 512)).astype(np.float32)
    with torch.no_grad():
        theirs = tm(torch.from_numpy(x), (30, 54))
    model = FusionFeedForward(512)
    params = convert_state_dict(tm.state_dict())
    ours = model.apply({"params": params}, jnp.asarray(x), (30, 54))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=1e-3,
                               atol=1e-3)


@pytest.mark.parametrize("use_tind", [False, True])
def test_sparse_attention_parity(ref_st, rng, use_tind):
    from propainter_tpu.models.propainter import SparseWindowAttention
    tm = _randomize(ref_st.SparseWindowAttention(
        512, 4, (5, 9), (4, 4)))
    tm.eval()
    b, t, h, w = 1, 4, 10, 18
    l_t = 3
    x = rng.standard_normal((b, t, h, w, 512)).astype(np.float32)
    # mask: make some windows occupied, some clean
    mask = np.zeros((b, l_t, h, w, 1), np.float32)
    mask[:, :, 1:4, 2:6] = 1.0  # occupies window (0,0) only
    # the reference always passes T_ind (its None path is dead, broken code);
    # "all frames" is T_ind = arange(t)
    T_ind = torch.arange(0, t, 2) if use_tind else torch.arange(t)

    with torch.no_grad():
        theirs = tm(torch.from_numpy(x),
                    torch.from_numpy(mask[..., 0][..., None]).squeeze(-1).unsqueeze(-1),
                    T_ind)

    model = SparseWindowAttention(512, 4, (5, 9), (4, 4))
    params = convert_state_dict(tm.state_dict(), skip=[r"valid_ind_rolled"])
    sel = np.zeros(t, np.bool_)
    if use_tind:
        sel[0::2] = True
    else:
        sel[:] = True
    ours = model.apply({"params": params}, jnp.asarray(x), jnp.asarray(mask),
                       jnp.asarray(sel))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=2e-3,
                               atol=2e-3)


def test_image_propagation_parity(ref, rng):
    from propainter_tpu.models.propainter import image_propagation
    tm = ref.BidirectionalPropagation(3, learnable=False)
    b, t, h, w = 1, 5, 32, 48
    x = rng.uniform(-1, 1, (b, t, h, w, 3)).astype(np.float32)
    flows_f = (2 * rng.standard_normal((b, t - 1, h, w, 2))).astype(np.float32)
    flows_b = (2 * rng.standard_normal((b, t - 1, h, w, 2))).astype(np.float32)
    mask = (rng.uniform(size=(b, t, h, w, 1)) > 0.7).astype(np.float32)

    with torch.no_grad():
        _, _, out_t, masks_t = tm(
            _btchw(x), _btchw(flows_f), _btchw(flows_b), _btchw(mask),
            "nearest")

    prop, updated = image_propagation(
        jnp.asarray(x), jnp.asarray(flows_f), jnp.asarray(flows_b),
        jnp.asarray(mask), "nearest")
    np.testing.assert_allclose(np.asarray(prop), _from_btchw(out_t),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(updated), _from_btchw(masks_t),
                               rtol=1e-4, atol=1e-4)


def test_feature_propagation_parity(ref, rng):
    from propainter_tpu.models.propainter import FeaturePropagation
    tm = _randomize(ref.BidirectionalPropagation(128, learnable=True))
    tm.eval()
    b, t, h, w = 1, 4, 16, 24
    x = rng.standard_normal((b, t, h, w, 128)).astype(np.float32)
    flows_f = (2 * rng.standard_normal((b, t - 1, h, w, 2))).astype(np.float32)
    flows_b = (2 * rng.standard_normal((b, t - 1, h, w, 2))).astype(np.float32)
    mask = (rng.uniform(size=(b, t, h, w, 2)) > 0.6).astype(np.float32)

    with torch.no_grad():
        _, _, out_t, _ = tm(
            _btchw(x), _btchw(flows_f), _btchw(flows_b), _btchw(mask),
            "bilinear")

    model = FeaturePropagation(128)
    params = convert_state_dict(
        tm.state_dict(),
        rename=[(r"^(deform_align|backbone)\.(backward_1|forward_1)\.",
                 r"\2.\1.")])
    ours = model.apply({"params": params}, jnp.asarray(x),
                       jnp.asarray(flows_f), jnp.asarray(flows_b),
                       jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(ours), _from_btchw(out_t),
                               rtol=2e-3, atol=2e-3)


def test_full_generator_parity(ref, rng):
    from propainter_tpu.models.propainter import (
        InpaintGenerator, convert_inpaint_state_dict)
    torch.manual_seed(0)
    tm = ref.InpaintGenerator(init_weights=True)
    _randomize(tm)
    tm.eval()

    b, t, l_t, H, W = 1, 5, 4, 120, 216
    frames = rng.uniform(-1, 1, (b, t, H, W, 3)).astype(np.float32)
    flows_f = (2 * rng.standard_normal((b, l_t - 1, H, W, 2))).astype(np.float32)
    flows_b = (2 * rng.standard_normal((b, l_t - 1, H, W, 2))).astype(np.float32)
    masks_in = (rng.uniform(size=(b, t, H, W, 1)) > 0.85).astype(np.float32)
    masks_upd = masks_in * (rng.uniform(size=(b, t, H, W, 1)) > 0.3)
    masks_upd = masks_upd.astype(np.float32)

    with torch.no_grad():
        out_t = tm(_btchw(frames), (_btchw(flows_f), _btchw(flows_b)),
                   _btchw(masks_in), _btchw(masks_upd), l_t)

    model = InpaintGenerator()
    params = convert_inpaint_state_dict(tm.state_dict())
    init_params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(frames),
        (jnp.asarray(flows_f), jnp.asarray(flows_b)),
        jnp.asarray(masks_in), jnp.asarray(masks_upd), l_t)["params"]
    assert_tree_shapes_match(params, init_params)

    ours = model.apply(
        {"params": params}, jnp.asarray(frames),
        (jnp.asarray(flows_f), jnp.asarray(flows_b)),
        jnp.asarray(masks_in), jnp.asarray(masks_upd), l_t)
    np.testing.assert_allclose(np.asarray(ours), _from_btchw(out_t),
                               rtol=5e-3, atol=5e-3)


def test_ref_padding_with_frame_valid_is_exact(rng):
    """Padded reference frames (frame_valid=False) must not change valid
    outputs — the pipeline relies on this for fixed-shape windows."""
    import jax
    import jax.numpy as jnp
    from propainter_tpu.models.propainter import InpaintGenerator

    B, l_t, H, W = 1, 3, 32, 48
    n_ref, n_pad = 2, 2
    key = jax.random.PRNGKey(0)
    model = InpaintGenerator()

    def mk(shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32))

    frames = mk((B, l_t + n_ref, H, W, 3)) * 0.5
    flows = (mk((B, l_t - 1, H, W, 2)), mk((B, l_t - 1, H, W, 2)))
    masks = (mk((B, l_t + n_ref, H, W, 1)) > 0.3).astype(jnp.float32)
    params = model.init(key, frames, flows, masks, masks, l_t)["params"]

    out_ref = model.apply({"params": params}, frames, flows, masks, masks,
                          l_t)

    # pad 2 fake refs (copies of frame 0) and mask them invalid
    pad_sel = [0] * n_pad
    frames_p = jnp.concatenate([frames, frames[:, pad_sel]], axis=1)
    masks_p = jnp.concatenate([masks, masks[:, pad_sel]], axis=1)
    fv = jnp.asarray([True] * (l_t + n_ref) + [False] * n_pad)
    out_pad = model.apply({"params": params}, frames_p, flows, masks_p,
                          masks_p, l_t, frame_valid=fv)

    np.testing.assert_allclose(np.asarray(out_pad), np.asarray(out_ref),
                               rtol=2e-5, atol=2e-5)


def test_precomputed_ref_feat_is_exact(rng):
    """Hoisted reference-frame encoding (precomputed_ref_feat + local-only
    frame/mask inputs) must reproduce the full-window path exactly — the
    pipeline encodes the global stride frames once and reuses them in every
    sliding window."""
    import jax
    import jax.numpy as jnp
    from propainter_tpu.models.propainter import InpaintGenerator, Encoder

    B, l_t, H, W = 1, 3, 32, 48
    n_ref = 2
    key = jax.random.PRNGKey(0)
    model = InpaintGenerator()

    def mk(shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32))

    frames = mk((B, l_t + n_ref, H, W, 3)) * 0.5
    flows = (mk((B, l_t - 1, H, W, 2)), mk((B, l_t - 1, H, W, 2)))
    masks = (mk((B, l_t + n_ref, H, W, 1)) > 0.3).astype(jnp.float32)
    params = model.init(key, frames, flows, masks, masks, l_t)["params"]

    out_full = model.apply({"params": params}, frames, flows, masks, masks,
                           l_t)

    ref_in = jnp.concatenate(
        [frames[:, l_t:], masks[:, l_t:], masks[:, l_t:]], axis=-1)
    ref_feat = Encoder().apply(
        {"params": params["encoder"]},
        ref_in.reshape(B * n_ref, H, W, 5))
    ref_feat = ref_feat.reshape((B, n_ref) + ref_feat.shape[1:])

    out_hoisted = model.apply(
        {"params": params}, frames[:, :l_t], flows, masks[:, :l_t],
        masks[:, :l_t], l_t, precomputed_ref_feat=ref_feat)

    np.testing.assert_allclose(np.asarray(out_hoisted),
                               np.asarray(out_full), rtol=2e-5, atol=2e-5)
