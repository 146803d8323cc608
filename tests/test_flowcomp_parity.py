"""Flow-completion net parity: torch reference (random weights) vs JAX."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from propainter_tpu.models.flow_completion import (
    RecurrentFlowCompleteNet,
    convert_flowcomp_state_dict,
    forward_bidirect_flow,
    combine_flow,
)
from propainter_tpu.convert import assert_tree_shapes_match
from tests.torch_ref import import_reference_module


def _randomize(model, seed=0):
    """Give every parameter a non-degenerate random value (the reference
    zero-inits conv_offset, which would undertest the deform path)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            # ~1/sqrt(fan_in)-scaled noise keeps activations O(1) through the
            # deep net so absolute tolerances are meaningful
            fan_in = int(np.prod(p.shape[1:])) if p.ndim > 1 else 1
            p.copy_(torch.randn(p.shape, generator=g) / max(fan_in, 1) ** 0.5)
    return model


@pytest.fixture(scope="module")
def torch_model():
    mod = import_reference_module("model.recurrent_flow_completion")
    torch.manual_seed(0)
    model = mod.RecurrentFlowCompleteNet()
    _randomize(model)
    model.eval()
    return model


def _to_torch_btchw(x):
    return torch.from_numpy(np.moveaxis(x, -1, 2).copy())


def _from_torch_btchw(t):
    return np.moveaxis(t.detach().numpy(), 2, -1)


def test_forward_parity(torch_model, rng):
    B, T, H, W = 1, 5, 64, 64
    flows = (2.0 * rng.standard_normal((B, T, H, W, 2))).astype(np.float32)
    masks = (rng.uniform(size=(B, T, H, W, 1)) > 0.7).astype(np.float32)

    with torch.no_grad():
        flow_t, edge_t = torch_model(_to_torch_btchw(flows), _to_torch_btchw(masks))
    assert edge_t is None

    model = RecurrentFlowCompleteNet()
    params = convert_flowcomp_state_dict(torch_model.state_dict())
    init_params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(flows), jnp.asarray(masks),
        train=True)["params"]
    assert_tree_shapes_match(params, init_params)

    flow, edge = model.apply(
        {"params": params}, jnp.asarray(flows), jnp.asarray(masks))
    assert edge is None
    np.testing.assert_allclose(
        np.asarray(flow), _from_torch_btchw(flow_t), rtol=2e-3, atol=2e-3)


def test_bidirect_and_combine_parity(torch_model, rng):
    B, T, H, W = 1, 5, 32, 48
    flows_f = (2.0 * rng.standard_normal((B, T - 1, H, W, 2))).astype(np.float32)
    flows_b = (2.0 * rng.standard_normal((B, T - 1, H, W, 2))).astype(np.float32)
    masks = (rng.uniform(size=(B, T, H, W, 1)) > 0.7).astype(np.float32)

    with torch.no_grad():
        pred_t, _ = torch_model.forward_bidirect_flow(
            [_to_torch_btchw(flows_f), _to_torch_btchw(flows_b)],
            _to_torch_btchw(masks))
        comb_t = torch_model.combine_flow(
            [_to_torch_btchw(flows_f), _to_torch_btchw(flows_b)],
            pred_t, _to_torch_btchw(masks))

    model = RecurrentFlowCompleteNet()
    params = convert_flowcomp_state_dict(torch_model.state_dict())

    def apply_fn(mf, mk, train):
        return model.apply({"params": params}, mf, mk, train)

    pred, _ = forward_bidirect_flow(
        apply_fn, (jnp.asarray(flows_f), jnp.asarray(flows_b)),
        jnp.asarray(masks))
    comb = combine_flow(
        (jnp.asarray(flows_f), jnp.asarray(flows_b)), pred, jnp.asarray(masks))

    for ours, theirs in zip(comb, comb_t):
        np.testing.assert_allclose(
            np.asarray(ours), _from_torch_btchw(theirs), rtol=2e-3, atol=2e-3)
