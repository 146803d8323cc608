"""On-chip golden regression gate.

Runs the committed golden fixture (tests/golden/pipeline_golden.npz — a
tiny deterministic 6-frame run, seeded weights + inputs) through the
DEFAULT TPU pipeline (bf16 precision, flash attention, opt2 pallas deform,
packed warp, occupancy bucketing) on the live backend and asserts a pinned
tolerance against the CPU-fp32 golden.

This is the only check that exercises COMPILED pallas kernels and the bf16
numerics paths — the CPU suite runs interpret-mode kernels in fp32, so a
compiled-kernel or bf16 regression is invisible to it. Run near round end
with nothing else on the chip:

    cd /root/repo && python tools/tpu_golden_check.py            # bf16 (default path)
    cd /root/repo && python tools/tpu_golden_check.py --fp32     # fp32 TPU path too

Tolerances (uint8 LSB on the final composited frames) were pinned from the
first passing run (see PERF.md round-5 notes) with ~2x headroom:
  * bf16 path:  max|diff| <= 24, mean|diff| <= 1.0
  * fp32 path:  max|diff| <= 12, mean|diff| <= 0.5
The golden itself allows 2 LSB of XLA-fusion float drift on CPU
(tests/test_golden_e2e.py); the TPU numbers add bf16 rounding through the
generator + the packed-warp 1-ulp corner flips + default (bf16) TPU matmul
precision in nominally-fp32 stages.
"""

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--fp32", action="store_true",
                   help="also check the fp32 TPU pipeline path")
    p.add_argument("--max_lsb", type=float, default=24.0)
    p.add_argument("--mean_lsb", type=float, default=1.0)
    p.add_argument("--max_lsb_fp32", type=float, default=12.0)
    p.add_argument("--mean_lsb_fp32", type=float, default=0.5)
    args = p.parse_args()

    from propainter_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}",
          flush=True)

    from tests.test_golden_e2e import GOLDEN, T, H, W, _seeded_params

    golden = np.load(GOLDEN)["out"]
    assert golden.shape == (T, H, W, 3), golden.shape

    import jax.numpy as jnp

    from propainter_tpu.models.raft import RAFT
    from propainter_tpu.models.flow_completion import RecurrentFlowCompleteNet
    from propainter_tpu.models.propainter import InpaintGenerator
    from propainter_tpu.pipeline import ProPainterPipeline, PipelineConfig

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

    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (H // 8, W // 8, 3), np.uint8)
    frames = np.stack([
        np.roll(np.kron(base, np.ones((8, 8, 1), np.uint8)), 3 * t, axis=1)
        for t in range(T)])
    mask = np.zeros((T, H, W), np.uint8)
    for t in range(T):
        mask[t, 50:90, 40 + 4 * t : 100 + 4 * t] = 1

    failures = []
    runs = [("bf16", args.max_lsb, args.mean_lsb)]
    if args.fp32:
        runs.append(("fp32", args.max_lsb_fp32, args.mean_lsb_fp32))
    for precision, max_tol, mean_tol in runs:
        # golden-test knobs (ref_stride 3, neighbor 4, raft_iter 3) +
        # the production defaults for everything else (flash attention,
        # opt2 deform, packed warp, occupancy bucketing all default-on)
        pipe = ProPainterPipeline(
            raft, fc, gen,
            PipelineConfig(ref_stride=3, neighbor_length=4, raft_iter=3,
                           precision=precision))
        t0 = time.time()
        out = np.stack(pipe.inpaint_video(frames, mask, mask))
        dt = time.time() - t0
        diff = np.abs(out.astype(np.int32) - golden.astype(np.int32))
        stats = (f"{precision}: max|diff|={diff.max()} LSB, "
                 f"mean|diff|={diff.mean():.4f} LSB, "
                 f">8 LSB at {(diff > 8).mean():.2e} of pixels, {dt:.1f}s")
        print(stats, flush=True)
        if diff.max() > max_tol or diff.mean() > mean_tol:
            failures.append(
                f"{stats}  EXCEEDS pinned tolerance "
                f"(max {max_tol}, mean {mean_tol})")
        # outside the mask the composite equals the input exactly in every
        # precision (uint8 passthrough)
        np.testing.assert_array_equal(out[0, :40, :30], frames[0, :40, :30])

    if failures:
        print("TPU GOLDEN CHECK FAILED:\n" + "\n".join(failures))
        sys.exit(1)
    print("TPU GOLDEN CHECK OK")


if __name__ == "__main__":
    main()
