"""Benchmark: end-to-end video inpainting throughput on one TPU chip.

Measures the headline metric from BASELINE.json — inpainted frames/sec/chip
at 432x240 on an 80-frame video with the reference's default settings
(ref_stride=10, neighbor_length=10, subvideo_length=80, raft_iter=20,
mask_dilation-style square mask). Weights are random (throughput does not
depend on weight values).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec", "vs_baseline": N}

vs_baseline uses BASELINE_FPS = 10.0 frames/sec — an A100-class estimate for
the reference at 432x240, derived in BASELINE.md from measured per-frame
FLOPs (515 GFLOP/frame via tools/flops_baseline.py), the realized-MFU class
of this bandwidth-bound workload, and the ~0.1 s/frame latency class the
reference's eval harness reports on datacenter GPUs. Accurate to ~2x;
revise when a measured A100 number is available.
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


BASELINE_FPS = 10.0
T, H, W = 80, 240, 432

# Transient axon-backend init failures (another client holding the chip, a
# tunnel hiccup) killed round 2's bench artifact — and the tunnel can also
# HANG in jax.devices() indefinitely during an outage. Each attempt runs in
# a FRESH subprocess (jax caches a failed backend init for the life of the
# process, so in-process retry cannot recover) with a hard per-attempt
# timeout (a fresh full-pipeline compile is ~10-20 min; cached ~2 min).
RETRY_ATTEMPTS = 4
RETRY_BACKOFF_S = 90.0
ATTEMPT_TIMEOUT_S = 2100.0


def build_pipeline(precision: str):
    import jax
    import jax.numpy as jnp
    from propainter_tpu.models.raft import RAFT
    from propainter_tpu.models.flow_completion import RecurrentFlowCompleteNet
    from propainter_tpu.models.propainter import InpaintGenerator
    from propainter_tpu.pipeline import ProPainterPipeline, PipelineConfig

    key = jax.random.PRNGKey(0)

    def shapes_to_random(tree):
        """Random small weights — NOT zeros: with zero weights every conv
        outputs its (zero) bias and XLA constant-folds whole networks,
        benchmarking an empty graph. Variance-like params (FrozenBatchNorm
        'var') must stay positive or rsqrt(var+eps) turns the whole RAFT
        output NaN."""
        paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(tree)
        keys = jax.random.split(jax.random.PRNGKey(42), len(paths_leaves))
        vals = []
        for k, (path, s) in zip(keys, paths_leaves):
            if not jnp.issubdtype(s.dtype, jnp.floating):
                vals.append(jnp.zeros(s.shape, s.dtype))
            elif str(path[-1]) == "['var']":
                vals.append(jax.random.uniform(k, s.shape, s.dtype, 0.5, 1.5))
            else:
                vals.append(jax.random.normal(k, s.shape, s.dtype) * 0.02)
        return jax.tree.unflatten(treedef, vals)

    # eval_shape: abstract init — no compile, no device work
    raft_params = shapes_to_random(jax.eval_shape(
        lambda: RAFT().init(key, jnp.zeros((1, H, W, 3)),
                            jnp.zeros((1, H, W, 3)), iters=1))["params"])
    flowcomp_params = shapes_to_random(jax.eval_shape(
        lambda: RecurrentFlowCompleteNet().init(
            key, jnp.zeros((1, 2, H, W, 2)),
            jnp.zeros((1, 2, H, W, 1))))["params"])
    inpaint_params = shapes_to_random(jax.eval_shape(
        lambda: InpaintGenerator().init(
            key, jnp.zeros((1, 3, H, W, 3)),
            (jnp.zeros((1, 1, H, W, 2)), jnp.zeros((1, 1, H, W, 2))),
            jnp.zeros((1, 3, H, W, 1)), jnp.zeros((1, 3, H, W, 1)),
            2))["params"])
    return ProPainterPipeline(
        raft_params, flowcomp_params, inpaint_params,
        PipelineConfig(precision=precision))


def make_inputs():
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (T, H, W, 3), dtype=np.uint8)
    mask = np.zeros((T, H, W), np.uint8)
    # moving square (mask_square.png-style video completion)
    for t in range(T):
        y = 60 + (t * 2) % 80
        x = 120 + (t * 3) % 160
        mask[t, y : y + 60, x : x + 80] = 1
    return frames, mask


def main():
    import jax
    import jax.numpy as jnp

    from propainter_tpu.utils.jax_cache import enable_persistent_cache

    # sitecustomize imports jax before this file runs, so the env var set
    # at module level is too late for THIS process (it still propagates to
    # --inner subprocesses); set the config directly as well.
    enable_persistent_cache()

    # bf16 = the TPU-native equivalent of the reference's --fp16 switch
    # (inference_propainter.py:333-337); RAFT stays fp32 either way.
    pipe = build_pipeline("bf16")
    frames_np, mask_np = make_inputs()

    # device-resident inputs/outputs: on production hardware host<->device
    # is PCIe (negligible for 130 MB); the axon dev tunnel runs D2H at
    # ~11 MB/s, which would measure the harness, not the framework. The
    # metric is the full 4-stage pipeline, compositing included, on device.
    frames = jnp.asarray(frames_np[None].astype(np.float32) / 255 * 2 - 1)
    masks = jnp.asarray(mask_np[None, ..., None].astype(np.float32))
    # original frames pre-uploaded once: stage 4 composites against them on
    # device; re-uploading per pass would measure the dev tunnel's H2D
    ori_dev = jnp.asarray(frames_np).astype(jnp.float32)

    def run():
        gt = pipe.compute_flows(frames)
        pred = pipe.complete_flows(gt, masks)
        upd_frames, upd_masks = pipe.propagate_images(frames, pred, masks)
        out = pipe.generate(upd_frames, pred, masks, upd_masks, ori_dev)
        # hard sync: on the axon tunnel, block_until_ready returns before
        # device completion — only a host readback truly synchronizes.
        # Fetch one pixel (needs the whole output buffer materialized).
        np.asarray(out[0, 0, 0])
        return out

    run()  # warmup: compiles every stage executable (persistent-cached)

    # the tunnel adds high run-to-run variance (identical executables
    # measured 5.4-11s); report the best of 3 measured passes
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)

    fps = T / best
    print(json.dumps({
        "metric": "inpaint_fps_432x240_80f",
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


def supervise():
    """Run main() in fresh subprocesses with retry/backoff; forward the
    inner run's JSON line (and only it) to stdout for the driver."""
    import subprocess

    last_tail = ""
    for attempt in range(1, RETRY_ATTEMPTS + 1):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--inner"],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
                timeout=ATTEMPT_TIMEOUT_S)
            out, rc = proc.stdout, proc.returncode
        except subprocess.TimeoutExpired as e:
            out = ((e.stdout or b"").decode("utf-8", "replace")
                   if isinstance(e.stdout, bytes) else (e.stdout or ""))
            rc = "timeout"
        json_line = None
        for line in out.splitlines():
            line = line.strip()
            if line.startswith("{") and '"metric"' in line:
                json_line = line
        if rc == 0 and json_line is not None:
            print(json_line)
            return 0
        last_tail = out[-2000:]
        print(f"bench attempt {attempt}/{RETRY_ATTEMPTS} failed "
              f"(rc={rc}); tail:\n{last_tail}", file=sys.stderr)
        if attempt < RETRY_ATTEMPTS:
            time.sleep(RETRY_BACKOFF_S)
    print(f"bench failed after {RETRY_ATTEMPTS} attempts", file=sys.stderr)
    return 1


if __name__ == "__main__":
    if "--inner" in sys.argv:
        main()
    else:
        sys.exit(supervise())
