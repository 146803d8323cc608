"""Released-checkpoint key-schema round-trips for every converter.

The released weights (reference weights/README.md: ProPainter.pth,
recurrent_flow_completion.pth, raft-things.pth) are torch.save()d
state_dicts of the reference model classes, so a state_dict synthesized
from those classes has the EXACT released key layout — including
raft-things.pth's `module.` DataParallel prefix
(model/modules/flow_comp_raft.py:18-20). Each test asserts the converter
(a) consumes EVERY checkpoint key (none silently dropped beyond the
documented skips) and (b) produces a tree that structurally equals the
flax init, both directions (assert_tree_shapes_match).

SAM (vit_b) and the discriminator already have this coverage in
test_sam_parity.py / test_discriminator_parity.py; this file closes the
remaining three (VERDICT r2 item 4).
"""

import argparse

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from propainter_tpu.convert import assert_tree_shapes_match
from tests.torch_ref import import_reference_module


def _count_expected_leaves(sd, skipped_patterns=()):
    """Checkpoint tensors that must land in the flax tree: everything except
    torch bookkeeping (num_batches_tracked) and documented torch-side
    duplicates."""
    import re

    res = [re.compile(p) for p in skipped_patterns]
    n = 0
    for k in sd:
        kk = k[len("module."):] if k.startswith("module.") else k
        if kk.endswith("num_batches_tracked"):
            continue
        if any(r.search(kk) for r in res):
            continue
        n += 1
    return n


def _count_leaves(tree):
    return len(jax.tree.leaves(tree))


def test_raft_things_schema():
    """raft-things.pth: DataParallel-prefixed RAFT state dict maps fully."""
    from propainter_tpu.models.raft import RAFT, convert_raft_state_dict

    raft_mod = import_reference_module("RAFT.raft")
    args = argparse.Namespace(small=False, mixed_precision=False,
                              alternate_corr=False)
    torch.manual_seed(0)
    net = raft_mod.RAFT(args)
    # the released file carries the nn.DataParallel wrapper prefix
    sd = {f"module.{k}": v for k, v in net.state_dict().items()}
    assert all(k.startswith("module.") for k in sd)
    # spot-check well-known released keys
    for key in [
        "module.fnet.conv1.weight",
        "module.fnet.layer1.0.conv1.weight",
        "module.cnet.norm1.running_mean",
        "module.cnet.layer3.0.conv1.weight",
        "module.update_block.encoder.convc1.weight",
        "module.update_block.gru.convz1.weight",
        "module.update_block.flow_head.conv2.bias",
        "module.update_block.mask.2.weight",
    ]:
        assert key in sd, key

    params = convert_raft_state_dict(sd)
    ref = jax.eval_shape(lambda: RAFT().init(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)),
        jnp.zeros((1, 128, 128, 3)), iters=1))["params"]
    assert_tree_shapes_match(params, ref)
    # every checkpoint tensor mapped (norm3.* are torch-side duplicates of
    # downsample.1.*, models/raft.py convert_raft_state_dict)
    assert _count_leaves(params) == _count_expected_leaves(
        sd, skipped_patterns=[r"\.norm3\."])


def test_recurrent_flow_completion_schema():
    from propainter_tpu.models.flow_completion import (
        RecurrentFlowCompleteNet, convert_flowcomp_state_dict)

    mod = import_reference_module("model.recurrent_flow_completion")
    torch.manual_seed(0)
    net = mod.RecurrentFlowCompleteNet()
    sd = net.state_dict()
    for key in [
        "downsample.0.weight",
        "encoder1.0.conv1.0.weight",
        "mid_dilation.0.weight",
        "feat_prop_module.deform_align.backward_.weight",
        "feat_prop_module.deform_align.forward_.conv_offset.0.weight",
        "feat_prop_module.backbone.backward_.0.weight",
        "feat_prop_module.fusion.weight",
        "decoder1.0.weight",
        "upsample.2.conv.weight",
        "edgeDetector.projection.0.weight",
    ]:
        assert key in sd, key

    params = convert_flowcomp_state_dict(sd)
    # train=True so the init owns the edge-detector branch too (eval skips
    # it; the checkpoint ships its weights)
    ref = jax.eval_shape(lambda: RecurrentFlowCompleteNet().init(
        jax.random.PRNGKey(0), jnp.zeros((1, 2, 64, 64, 2)),
        jnp.zeros((1, 2, 64, 64, 1)), train=True))["params"]
    assert_tree_shapes_match(params, ref)
    assert _count_leaves(params) == _count_expected_leaves(sd)


def test_propainter_schema():
    from propainter_tpu.models.propainter import (
        InpaintGenerator, convert_inpaint_state_dict)

    mod = import_reference_module("model.propainter")
    torch.manual_seed(0)
    net = mod.InpaintGenerator(init_weights=False)
    sd = net.state_dict()
    for key in [
        "encoder.layers.0.weight",
        "encoder.layers.10.weight",
        "decoder.0.conv.weight",
        "sc.embedding.weight",
        "sc.bias_conv.weight",
        "transformers.transformer.0.attention.valid_ind_rolled",
        "feat_prop_module.deform_align.backward_1.weight",
        "feat_prop_module.deform_align.forward_1.conv_offset.0.weight",
        "feat_prop_module.backbone.backward_1.0.weight",
        "feat_prop_module.fuse.0.weight",
        "transformers.transformer.0.attention.key.weight",
        "transformers.transformer.0.mlp.fc1.0.weight",
        "transformers.transformer.7.mlp.fc2.1.weight",
        "transformers.transformer.0.norm1.weight",
    ]:
        assert key in sd, key

    params = convert_inpaint_state_dict(sd)
    ref = jax.eval_shape(lambda: InpaintGenerator().init(
        jax.random.PRNGKey(0), jnp.zeros((1, 3, 64, 96, 3)),
        (jnp.zeros((1, 1, 64, 96, 2)), jnp.zeros((1, 1, 64, 96, 2))),
        jnp.zeros((1, 3, 64, 96, 1)), jnp.zeros((1, 3, 64, 96, 1)),
        2))["params"]
    assert_tree_shapes_match(params, ref)
    # valid_ind_rolled is a registered buffer of precomputed indices, not a
    # weight (sparse_transformer.py), dropped by design
    assert _count_leaves(params) == _count_expected_leaves(
        sd, skipped_patterns=[r"valid_ind_rolled"])


def test_cutie_base_mega_schema():
    """cutie-base-mega.pth: the released checkpoint is the state_dict of the
    demo's CUTIE(config) (tracker/base_tracker.py:27-28 torch.load +
    load_weights -> load_state_dict), so a state dict synthesized from the
    vendored torch model under the demo config has the exact released key
    layout. Every tensor must map (in_proj_weight/bias split 1 -> 3 q/k/v
    leaves; pixel_mean/std + positional-encoding buffers + aux_computer are
    documented non-param skips)."""
    from propainter_tpu.models.cutie import (
        CUTIE, CutieConfig, convert_cutie_state_dict)
    from tests.torch_ref import import_cutie_module

    cfg_mod = import_cutie_module("tracker.config")
    import_cutie_module("tracker.model.cutie")
    from omegaconf import OmegaConf  # fake, installed by import_cutie_module
    from tracker.model.cutie import CUTIE as TorchCUTIE

    torch.manual_seed(0)
    net = TorchCUTIE(OmegaConf.create(cfg_mod.CONFIG))
    sd = net.state_dict()

    # spot-check well-known released keys across every submodule family
    for key in [
        "pixel_encoder.conv1.weight",
        "pixel_encoder.layer3.5.bn2.running_var",
        "pix_feat_proj.weight",
        "key_proj.key_proj.weight",
        "mask_encoder.conv1.weight",
        "mask_encoder.fuser.block2.conv2.weight",
        "mask_decoder.sensory_update.transform.weight",
        "mask_decoder.up_16_8.out_conv.conv1.weight",
        "mask_decoder.up_16_8.out_conv.downsample.weight",
        "pixel_fuser.sensory_compress.weight",
        "object_transformer.blocks.0.self_attn.self_attn.in_proj_weight",
        "object_transformer.blocks.0.read_from_pixel.cross_attn.in_proj_weight",
        "object_transformer.query_init.weight",
        "object_summarizer.feature_pred.0.weight",
    ]:
        assert key in sd, key
    # the multi-object released file has the 5-channel mask conv1
    # (tracker/model/cutie.py:202-216 converts 4 -> 5; base-mega ships 5)
    assert sd["mask_encoder.conv1.weight"].shape[1] == 5

    params = convert_cutie_state_dict(sd)
    model = CUTIE(CutieConfig())
    H, W = 32, 32
    ref = jax.eval_shape(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)),
        jnp.zeros((1, H // 16, W // 16, 256)),
        jnp.zeros((1, 1, H // 16, W // 16, 256)),
        jnp.zeros((1, 1, H, W)),
        method="init_all_params"))["params"]
    assert_tree_shapes_match(params, ref)

    # no checkpoint tensor silently dropped: each in_proj_{weight,bias}
    # becomes 3 leaves; documented skips are non-parameters
    import re

    skips = [re.compile(p) for p in
             (r"pixel_mean", r"pixel_std", r"aux_computer",
              r"\.inv_freq$", r"cached_penc",
              r"num_batches_tracked")]
    expected = 0
    for k in sd:
        if any(r.search(k) for r in skips):
            continue
        expected += 3 if k.endswith((".in_proj_weight", ".in_proj_bias")) else 1
    assert _count_leaves(params) == expected
