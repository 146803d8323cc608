"""Pallas sparse-window-attention kernel vs the dense XLA dual-branch path.

Runs the kernel in interpreter mode on CPU (same code path the TPU compiles)
and checks the full SparseWindowAttention module output matches the XLA
implementation for dirty AND clean windows, with temporal dilation masks.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from propainter_tpu.models.propainter import SparseWindowAttention


@pytest.mark.parametrize("all_clean", [False, True])
def test_pallas_matches_xla(rng, all_clean):
    B, T, l_t = 1, 4, 2
    Hg, Wg, C = 10, 18, 64  # token grid: 2x2 windows of (5, 9)
    x = jnp.asarray(rng.standard_normal((B, T, Hg, Wg, C)).astype(np.float32))
    if all_clean:
        mask = jnp.zeros((B, l_t, Hg, Wg, 1), jnp.float32)
    else:
        m = np.zeros((B, l_t, Hg, Wg, 1), np.float32)
        m[:, :, 1:4, 2:7] = 1.0  # dirties window (0, 0) only
        mask = jnp.asarray(m)
    fsel = jnp.asarray([True, False, True, True])

    xla_mod = SparseWindowAttention(C, 4, (5, 9), (4, 4), "xla")
    params = xla_mod.init(jax.random.PRNGKey(0), x, mask, fsel)["params"]
    out_xla = xla_mod.apply({"params": params}, x, mask, fsel)

    pl_mod = SparseWindowAttention(C, 4, (5, 9), (4, 4), "pallas")
    out_pl = pl_mod.apply({"params": params}, x, mask, fsel)

    np.testing.assert_allclose(
        np.asarray(out_pl), np.asarray(out_xla), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("with_dyn_valid", [False, True])
def test_flash_matches_xla(rng, with_dyn_valid):
    """Branch-A fused (flash) attention == dense XLA formulation.

    The flash path (ops/flash_attention.py) replaces only the branch-A
    logits/softmax/AV chain; preprocessing and branch B are shared, so any
    mismatch isolates to the kernel."""
    B, T, l_t = 1, 6, 3
    Hg, Wg, C = 10, 18, 64
    x = jnp.asarray(rng.standard_normal((B, T, Hg, Wg, C)).astype(np.float32))
    m = np.zeros((B, l_t, Hg, Wg, 1), np.float32)
    m[:, :, 1:4, 2:7] = 1.0
    mask = jnp.asarray(m)
    static_sel = np.array([True, False, True, True, False, True])
    dyn_valid = (jnp.asarray([True] * 4 + [False] * 2)
                 if with_dyn_valid else None)

    xla_mod = SparseWindowAttention(C, 4, (5, 9), (4, 4), "xla")
    params = xla_mod.init(
        jax.random.PRNGKey(0), x, mask, (static_sel, dyn_valid))["params"]
    out_xla = xla_mod.apply({"params": params}, x, mask,
                            (static_sel, dyn_valid))

    fl_mod = SparseWindowAttention(C, 4, (5, 9), (4, 4), "flash")
    out_fl = fl_mod.apply({"params": params}, x, mask,
                          (static_sel, dyn_valid))

    np.testing.assert_allclose(
        np.asarray(out_fl), np.asarray(out_xla), rtol=2e-4, atol=2e-4)


def test_flash_batched_windows(rng):
    """flash kernel with a window-batch (B>1) — the multi-chip / wb>1 path
    (bias must be expanded per problem; regression for the Mosaic blockspec
    constraint on trailing block dims)."""
    from propainter_tpu.ops.flash_attention import flash_window_attention

    B, G, Tq, Tk, ch = 3, 4, 90, 150, 64
    q = jnp.asarray(rng.standard_normal((B, G, Tq, ch)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, G, Tk, ch)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, G, Tk, ch)), jnp.float32)
    bias = jnp.asarray(
        np.where(rng.uniform(size=(B, Tk)) > 0.2, 0.0, -1e9), jnp.float32)
    out = flash_window_attention(q, k, v, bias, 0.125)

    s = jnp.einsum("bgqc,bgkc->bgqk", q, k) * 0.125 + bias[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1)
    ref = jnp.einsum("bgqk,bgkc->bgqc", p, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
