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
