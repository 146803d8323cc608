"""RAFT parity: randomly-initialized torch reference vs converted JAX model."""

import argparse

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from propainter_tpu.models.raft import RAFT, convert_raft_state_dict
from propainter_tpu.convert import assert_tree_shapes_match
from tests.torch_ref import import_reference_module, to_nchw, to_nhwc


@pytest.fixture(scope="module")
def torch_raft():
    raft_mod = import_reference_module("RAFT.raft")
    args = argparse.Namespace(small=False, mixed_precision=False,
                              alternate_corr=False)
    torch.manual_seed(0)
    model = raft_mod.RAFT(args)
    model.eval()
    return model


def test_raft_forward_parity(torch_raft, rng):
    # H/8, W/8 must stay >= 2 at the coarsest corr level (as in real use:
    # eval is 432x240); tiny sizes degenerate to 1x1 maps and NaN in both
    # frameworks.
    B, H, W = 1, 128, 160
    img1 = rng.uniform(-1, 1, (B, 3, H, W)).astype(np.float32)
    img2 = rng.uniform(-1, 1, (B, 3, H, W)).astype(np.float32)
    iters = 4

    with torch.no_grad():
        flow_low_t, flow_up_t = torch_raft(
            torch.from_numpy(img1), torch.from_numpy(img2),
            iters=iters, test_mode=True)

    model = RAFT()
    x1 = jnp.asarray(np.moveaxis(img1, 1, -1))
    x2 = jnp.asarray(np.moveaxis(img2, 1, -1))
    init_params = model.init(jax.random.PRNGKey(0), x1, x2, iters=1)["params"]
    params = convert_raft_state_dict(torch_raft.state_dict())
    assert_tree_shapes_match(params, init_params)

    flow_low, flow_up = model.apply({"params": params}, x1, x2, iters=iters)

    np.testing.assert_allclose(
        np.asarray(flow_low), to_nhwc(flow_low_t), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(flow_up), to_nhwc(flow_up_t), rtol=1e-3, atol=1e-3)
