"""Golden-output e2e regression: catches pipeline drift in ~a minute.

The full torch-parity suite (test_pipeline_parity.py) proves correctness but
takes >1 h; this fixture freezes one tiny deterministic run — seeded weights,
seeded inputs, 6 frames @ 144x160, all four stages + compositing — as a
committed uint8 artifact. Any orchestration change that shifts output beyond
float-drift noise fails here in seconds.

Regenerate intentionally with:
    REGEN_GOLDEN=1 python -m pytest tests/test_golden_e2e.py -q
and commit the refreshed tests/golden/pipeline_golden.npz alongside the
change that justified it.
"""

import os
import pathlib

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from propainter_tpu.models.raft import RAFT
from propainter_tpu.models.flow_completion import RecurrentFlowCompleteNet
from propainter_tpu.models.propainter import InpaintGenerator
from propainter_tpu.pipeline import ProPainterPipeline, PipelineConfig

GOLDEN = pathlib.Path(__file__).parent / "golden" / "pipeline_golden.npz"
T, H, W = 6, 144, 160


def _seeded_params(tree, seed):
    """Deterministic random fill from shapes alone — independent of flax
    initializer implementations, stable across library versions as long as
    the param tree structure is stable."""
    leaves, treedef = jax.tree_util.tree_flatten_with_path(tree)
    vals = []
    for i, (path, s) in enumerate(leaves):
        k = jax.random.fold_in(jax.random.PRNGKey(seed), i)
        if not jnp.issubdtype(s.dtype, jnp.floating):
            vals.append(jnp.zeros(s.shape, s.dtype))
        elif str(path[-1]) == "['var']":
            vals.append(jax.random.uniform(k, s.shape, s.dtype, 0.5, 1.5))
        else:
            vals.append(0.02 * jax.random.normal(k, s.shape, s.dtype))
    return jax.tree_util.tree_unflatten(treedef, [v for v in vals])


def _run_pipeline():
    key = jax.random.PRNGKey(0)
    raft = _seeded_params(jax.eval_shape(lambda: RAFT().init(
        key, jnp.zeros((1, H, W, 3)), jnp.zeros((1, H, W, 3)),
        iters=1))["params"], seed=1)
    fc = _seeded_params(jax.eval_shape(lambda: RecurrentFlowCompleteNet().init(
        key, jnp.zeros((1, 2, H, W, 2)),
        jnp.zeros((1, 2, H, W, 1))))["params"], seed=2)
    gen = _seeded_params(jax.eval_shape(lambda: InpaintGenerator().init(
        key, jnp.zeros((1, 3, H, W, 3)),
        (jnp.zeros((1, 1, H, W, 2)), jnp.zeros((1, 1, H, W, 2))),
        jnp.zeros((1, 3, H, W, 1)), jnp.zeros((1, 3, H, W, 1)),
        2))["params"], seed=3)
    pipe = ProPainterPipeline(
        raft, fc, gen,
        PipelineConfig(ref_stride=3, neighbor_length=4, raft_iter=3))

    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (H // 8, W // 8, 3), np.uint8)
    frames = np.stack([
        np.roll(np.kron(base, np.ones((8, 8, 1), np.uint8)), 3 * t, axis=1)
        for t in range(T)])
    mask = np.zeros((T, H, W), np.uint8)
    for t in range(T):
        mask[t, 50:90, 40 + 4 * t : 100 + 4 * t] = 1
    out = np.stack(pipe.inpaint_video(frames, mask, mask))
    return frames, mask, out


def test_golden_pipeline_output():
    frames, mask, out = _run_pipeline()
    if os.environ.get("REGEN_GOLDEN") == "1" or not GOLDEN.exists():
        GOLDEN.parent.mkdir(exist_ok=True)
        np.savez_compressed(GOLDEN, out=out)
        if os.environ.get("REGEN_GOLDEN") != "1":
            pytest.fail(
                f"golden file was missing — wrote {GOLDEN}; verify and "
                "commit it (this failure is intentional)")
    golden = np.load(GOLDEN)["out"]
    assert golden.shape == out.shape == (T, H, W, 3)
    # sanity on the run itself, independent of the golden
    assert np.isfinite(out.astype(np.float32)).all()
    np.testing.assert_array_equal(out[0, :40, :30], frames[0, :40, :30])
    # 2 uint8 LSB: float drift across XLA fusion choices; anything larger is
    # an orchestration change and must be justified + regenerated
    diff = np.abs(out.astype(int) - golden.astype(int))
    assert diff.max() <= 2, (
        f"pipeline output drifted from golden: max|diff|={diff.max()} "
        f"at {np.unravel_index(diff.argmax(), diff.shape)}")
