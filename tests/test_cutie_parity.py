"""Cutie VOS model parity vs the reference's vendored torch implementation
(web-demos/hugging_face/tracker/model/*), module by module with random
weights converted through `convert_cutie_state_dict`."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from propainter_tpu.models.cutie import (
    CUTIE, CutieConfig, convert_cutie_state_dict, get_similarity,
    topk_softmax, readout, aggregate)
from propainter_tpu.convert import assert_tree_shapes_match
from tests.torch_ref import import_cutie_module


def _randomize(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            fan_in = int(np.prod(p.shape[1:])) if p.ndim > 1 else 1
            p.copy_(torch.randn(p.shape, generator=g) / max(fan_in, 1) ** 0.5)
        # randomize frozen-BN running stats too (zeros/ones would hide
        # conversion bugs)
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)
    return model


def _nhwc(t):
    return np.moveaxis(t.detach().numpy(), -3, -1)


@pytest.fixture(scope="module")
def ref_cfg():
    mod = import_cutie_module("tracker.config")
    from omegaconf import OmegaConf

    return OmegaConf.create(mod.CONFIG)


@pytest.fixture(scope="module")
def torch_cutie(ref_cfg):
    import_cutie_module("tracker.model.cutie")
    from tracker.model.cutie import CUTIE as TorchCUTIE

    torch.manual_seed(0)
    net = TorchCUTIE(ref_cfg)
    _randomize(net)
    net.eval()
    return net


@pytest.fixture(scope="module")
def jax_params(torch_cutie):
    return convert_cutie_state_dict(torch_cutie.state_dict())


@pytest.fixture(scope="module")
def model():
    return CUTIE(CutieConfig())


# H, W must be /16-friendly and small (resnet50 on 1 CPU core)
H, W = 48, 64
h, w = H // 16, W // 16
N = 2  # objects


def test_encode_image_parity(torch_cutie, jax_params, model, rng):
    img = rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32)
    with torch.no_grad():
        ms_t, pix_t = torch_cutie.encode_image(
            torch.from_numpy(np.moveaxis(img, -1, 1)))
    (f16, f8, f4), pix = model.apply({"params": jax_params},
                                     jnp.asarray(img), method="encode_image")
    np.testing.assert_allclose(np.asarray(f16), _nhwc(ms_t[0]), rtol=2e-3,
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(f8), _nhwc(ms_t[1]), rtol=2e-3,
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(f4), _nhwc(ms_t[2]), rtol=2e-3,
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(pix), _nhwc(pix_t), rtol=2e-3,
                               atol=2e-3)


def test_transform_key_parity(torch_cutie, jax_params, model, rng):
    f16 = rng.standard_normal((1, h, w, 1024)).astype(np.float32)
    with torch.no_grad():
        k_t, s_t, e_t = torch_cutie.transform_key(
            torch.from_numpy(np.moveaxis(f16, -1, 1)))
    k, s, e = model.apply({"params": jax_params}, jnp.asarray(f16),
                          method="transform_key")
    np.testing.assert_allclose(np.asarray(k), _nhwc(k_t), rtol=1e-3,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(s), _nhwc(s_t), rtol=1e-3,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(e), _nhwc(e_t), rtol=1e-3,
                               atol=1e-3)


def test_encode_mask_parity(torch_cutie, jax_params, model, rng):
    img = rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32)
    pix = rng.standard_normal((1, h, w, 256)).astype(np.float32)
    sensory = rng.standard_normal((1, N, h, w, 256)).astype(np.float32)
    masks = (rng.uniform(size=(1, N, H, W)) > 0.7).astype(np.float32)

    with torch.no_grad():
        # despite the `ms_features` annotation, InferenceCore passes the
        # PROJECTED pix_feat here (inference_core.py:102-109)
        v_t, sens_t, summ_t, _ = torch_cutie.encode_mask(
            torch.from_numpy(np.moveaxis(img, -1, 1)),
            torch.from_numpy(np.moveaxis(pix, -1, 1)),
            torch.from_numpy(np.moveaxis(sensory, -1, 2)),
            torch.from_numpy(masks), deep_update=True)
    v, sens, summ = model.apply(
        {"params": jax_params}, jnp.asarray(img), jnp.asarray(pix),
        jnp.asarray(sensory), jnp.asarray(masks), method="encode_mask")
    np.testing.assert_allclose(
        np.asarray(v), np.moveaxis(v_t.numpy(), 2, -1), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(sens), np.moveaxis(sens_t.numpy(), 2, -1), rtol=2e-3,
        atol=2e-3)
    np.testing.assert_allclose(np.asarray(summ), summ_t.numpy(), rtol=2e-3,
                               atol=2e-3)


def test_memory_math_parity(rng):
    mem_mod = import_cutie_module("tracker.model.utils.memory_utils")
    B, Ck, Nt, P = 1, 64, 37, h * w
    mk = rng.standard_normal((B, Ck, Nt)).astype(np.float32)
    ms = rng.uniform(1, 2, (B, 1, Nt)).astype(np.float32)
    qk = rng.standard_normal((B, Ck, P)).astype(np.float32)
    qe = rng.uniform(0, 1, (B, Ck, P)).astype(np.float32)
    mv = rng.standard_normal((B, N, 256, Nt)).astype(np.float32)

    with torch.no_grad():
        sim_t = mem_mod.get_similarity(torch.from_numpy(mk),
                                       torch.from_numpy(ms),
                                       torch.from_numpy(qk),
                                       torch.from_numpy(qe))
        aff_t = mem_mod.do_softmax(sim_t.clone(), top_k=13)
        # MemoryManager._readout for grouped values (memory_manager.py:78-88)
        mo = torch.from_numpy(mv).view(B, N * 256, Nt)
        out_t = (mo @ aff_t).view(B, N, 256, -1)

    sim = get_similarity(jnp.asarray(mk), jnp.asarray(ms), jnp.asarray(qk),
                         jnp.asarray(qe))
    np.testing.assert_allclose(np.asarray(sim), sim_t.numpy(), rtol=1e-3,
                               atol=1e-3)
    aff = topk_softmax(sim, 13)
    np.testing.assert_allclose(np.asarray(aff), aff_t.numpy(), rtol=1e-3,
                               atol=1e-4)
    out = readout(aff, jnp.asarray(mv))
    np.testing.assert_allclose(np.asarray(out), out_t.numpy(), rtol=1e-3,
                               atol=1e-4)


def test_aggregate_parity(rng):
    tu = import_cutie_module("tracker.utils.tensor_utils")
    prob = rng.uniform(0, 1, (1, 3, 8, 10)).astype(np.float32)
    with torch.no_grad():
        ref = tu.aggregate(torch.from_numpy(prob), dim=1)
    ours = aggregate(jnp.asarray(prob), axis=1)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-5,
                               atol=1e-5)


def test_read_and_segment_parity(torch_cutie, jax_params, model, rng):
    """read_memory-equivalent (pixel fusion + object transformer) and the
    mask decoder, end to end on one frame's worth of state."""
    pix = rng.standard_normal((1, h, w, 256)).astype(np.float32)
    visual = rng.standard_normal((1, N, h, w, 256)).astype(np.float32)
    sensory = rng.standard_normal((1, N, h, w, 256)).astype(np.float32)
    last_mask = (rng.uniform(size=(1, N, H, W)) > 0.7).astype(np.float32)
    obj_mem = rng.standard_normal((1, N, 1, 16, 257)).astype(np.float32)
    f16 = rng.standard_normal((1, h, w, 1024)).astype(np.float32)
    f8 = rng.standard_normal((1, h * 2, w * 2, 512)).astype(np.float32)
    f4 = rng.standard_normal((1, h * 4, w * 4, 256)).astype(np.float32)

    with torch.no_grad():
        pix_t = torch.from_numpy(np.moveaxis(pix, -1, 1))
        vis_t = torch.from_numpy(np.moveaxis(visual, -1, 2))
        sen_t = torch.from_numpy(np.moveaxis(sensory, -1, 2))
        lm_t = torch.from_numpy(last_mask)
        pr_t = torch_cutie.pixel_fusion(pix_t, vis_t, sen_t, lm_t)
        mem_readout_t, _ = torch_cutie.readout_query(
            pr_t, torch.from_numpy(obj_mem))
        ms_t = [torch.from_numpy(np.moveaxis(a, -1, 1))
                for a in (f16, f8, f4)]
        sens2_t, _, prob_t = torch_cutie.segment(
            ms_t, mem_readout_t, sen_t)

    mem_readout = model.apply(
        {"params": jax_params}, jnp.asarray(pix), jnp.asarray(visual),
        jnp.asarray(sensory), jnp.asarray(last_mask), jnp.asarray(obj_mem),
        method="read_first")
    np.testing.assert_allclose(
        np.asarray(mem_readout), np.moveaxis(mem_readout_t.numpy(), 2, -1),
        rtol=5e-3, atol=5e-3)

    sens2, prob = model.apply(
        {"params": jax_params}, jnp.asarray(f16), jnp.asarray(f8),
        jnp.asarray(f4), mem_readout, jnp.asarray(sensory),
        method="segment")
    np.testing.assert_allclose(
        np.asarray(sens2), np.moveaxis(sens2_t.numpy(), 2, -1), rtol=5e-3,
        atol=5e-3)
    np.testing.assert_allclose(np.asarray(prob), prob_t.numpy(), rtol=5e-3,
                               atol=5e-3)


def test_param_tree_matches(jax_params, model):
    """Every converted leaf must exist with the right shape in the flax
    init tree (and vice versa)."""
    variables = jax.eval_shape(lambda: model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, H, W, 3)), jnp.zeros((1, h, w, 256)),
        jnp.zeros((1, N, h, w, 256)), jnp.zeros((1, N, H, W)),
        method="init_all_params"))
    assert_tree_shapes_match(jax_params, variables["params"])


def test_inference_core_step_parity(torch_cutie, jax_params, ref_cfg, rng):
    """Full tracking-step parity: 28 frames through the reference
    InferenceCore vs our CutieCore — covers the memory write (permanent
    first frame), top-k reads, sensory stagger updates, memory frames at
    mem_every=5 (t=5,10,15,20,25) AND the first working-memory FIFO trim:
    after the t=25 write the non-permanent store holds 5 frames >
    (max_mem_frames-1)=4, so both sides evict the t=5 frame
    (memory_manager.py:38,230 + kv_memory_store.remove_old_memory) and
    frames 26-27 read from the trimmed memory."""
    import_cutie_module("tracker.inference.inference_core")
    from tracker.inference.inference_core import InferenceCore

    from propainter_tpu.demo.cutie_core import CutieCore, CutieCoreConfig

    # top_k=30 exceeds the 12 memory tokens of a 48x64 frame (3x4 key map
    # per memory frame) — the reference crashes likewise; use top_k=8 on
    # both sides for the tiny-shape parity run
    import copy

    cfg_mod = import_cutie_module("tracker.config")
    from omegaconf import OmegaConf

    small_cfg = copy.deepcopy(cfg_mod.CONFIG)
    small_cfg["top_k"] = 8
    ref_cfg = OmegaConf.create(small_cfg)

    T = 28
    frames = []
    for t in range(T):
        base = rng.uniform(0, 1, (H // 8, W // 8, 3)).astype(np.float32)
        img = np.kron(base, np.ones((8, 8, 1), np.float32))
        frames.append(np.clip(img + 0.02 * t, 0, 1))
    mask0 = np.zeros((N, H, W), np.float32)
    mask0[0, 8:24, 10:30] = 1
    mask0[1, 28:44, 34:54] = 1

    # the reference's top-k softmax exponentiates RAW similarities
    # (memory_utils.py:60 values.exp_()); with fan-in-scaled random weights
    # the anisotropic-L2 similarity is ~-1e4 and exp underflows to 0/0=NaN
    # in torch (ours subtracts the max and stays finite). Use smaller
    # weights so the reference stays in its numerically valid regime.
    from tracker.model.cutie import CUTIE as TorchCUTIE

    torch.manual_seed(1)
    net_small = TorchCUTIE(ref_cfg)
    _randomize(net_small, seed=7)
    with torch.no_grad():
        for pmod in (net_small.key_proj.d_proj,):
            pmod.weight.mul_(0.05)
            pmod.bias.mul_(0.05)
        for pmod in (net_small.key_proj.key_proj,):
            pmod.weight.mul_(0.3)
    net_small.eval()
    params_small = convert_cutie_state_dict(net_small.state_dict())

    core_t = InferenceCore(net_small, ref_cfg)
    core_j = CutieCore(params_small, config=CutieCoreConfig(top_k=8))

    for t in range(T):
        img_t = torch.from_numpy(np.moveaxis(frames[t], -1, 0))
        if t == 0:
            with torch.no_grad():
                prob_t = core_t.step(img_t, torch.from_numpy(mask0),
                                     objects=[1, 2], idx_mask=False)
            prob_j = core_j.step(frames[t], mask0)
        else:
            with torch.no_grad():
                prob_t = core_t.step(img_t)
            prob_j = core_j.step(frames[t])
        np.testing.assert_allclose(
            prob_j, prob_t.numpy(), rtol=5e-3, atol=5e-3,
            err_msg=f"frame {t}")

    # the trim actually fired: working memory holds the permanent first
    # frame + exactly (max_mem_frames-1) non-permanent frames on BOTH sides
    assert core_j.mem_key.shape[-1] == core_j.perm_tokens * 5, \
        "expected perm + 4 non-perm memory frames after the FIFO trim"
    ref_store = core_t.memory.work_mem
    bucket = next(iter(ref_store.buckets))
    assert ref_store.size(bucket) == core_j.mem_key.shape[-1]


def test_cutie_tracker_facade(jax_params, rng):
    """CutieTracker implements the BaseTracker track() API (id-label masks
    in/out) on top of CutieCore."""
    from propainter_tpu.demo.tracking import CutieTracker

    tracker = CutieTracker(jax_params, top_k=8)
    frames = [
        (rng.uniform(0, 255, (H, W, 3))).astype(np.uint8) for _ in range(3)]
    ann = np.zeros((H, W), np.uint8)
    ann[8:24, 10:30] = 3  # non-contiguous label ids must round-trip
    ann[28:44, 34:54] = 7

    m0, logit0, painted0 = tracker.track(frames[0], ann)
    assert set(np.unique(m0)) <= {0, 3, 7}
    assert painted0.shape == frames[0].shape
    for t in (1, 2):
        m, logit, painted = tracker.track(frames[t])
        assert m.shape == (H, W)
        assert logit.shape == (H, W)
        assert set(np.unique(m)) <= {0, 3, 7}
