"""A/B: RAFT iterative refinement in fp32 (reference protocol) vs bf16.

The refine loop is ~60% MXU-utilized fp32 conv work (PERF.md r2 split);
bf16 halves the HBM traffic of every conv/GRU tensor and runs the MXU in
its native input dtype. The reference keeps RAFT fp32 even in fp16 mode
(inference_propainter.py:311) because CUDA fp16 has a 5-bit exponent and
RAFT's correlation values overflow it; bf16 keeps fp32's 8-bit exponent,
so the only question is mantissa drift over 20 GRU iterations — measured
here as the final flow_up deviation on the same random-weight draw.

Timing at the bench all-pairs batch (T=80 -> 158 pairs, 30x54 grid).
Run from the repo root with nothing else on the chip:
    python tools/raft_bf16_ab.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from propainter_tpu.utils.jax_cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np


def fence(x):
    np.asarray(jax.tree.leaves(x)[0].ravel()[0])


def main():
    from bench import build_pipeline, T, H, W

    pipe = build_pipeline("bf16")
    rp = pipe.raft_params
    rng = np.random.default_rng(0)
    # structured scene: translating noise (2 px/frame) so flows/corr are
    # scene-like rather than white noise
    base = rng.standard_normal((H, W + 2 * T, 3)).astype(np.float32)
    frames = jnp.asarray(np.stack([base[:, 2 * t: 2 * t + W] * 127
                                   for t in range(T)]))

    cast_bf = lambda t: jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                                     if a.dtype == jnp.float32 else a, t)

    enc = jax.jit(lambda p, x: pipe.raft.apply({"params": p}, x,
                                               method="encode"))
    enc16 = jax.jit(lambda p, x: pipe.raft.apply(
        {"params": p}, x, compute_dtype=jnp.bfloat16, method="encode"))

    def time_it(name, f, *args, n=3, inner=4):
        out = f(*args)
        fence(out)
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            for _ in range(inner):
                out = f(*args)
            fence(out)
            best = min(best, (time.perf_counter() - t0) / inner)
        print(f"{name}: {best * 1e3:7.1f} ms", flush=True)
        return out

    fmap, net, inp = time_it("encode(80) fp32", enc, rp, frames)
    enc16_out = time_it("encode(80) bf16", enc16, cast_bf(rp), frames)

    def mkpairs(fmap, net, inp):
        def pairs(x):
            x = x.reshape((1, T) + x.shape[1:])
            return (x[:, :-1].reshape((T - 1,) + x.shape[2:]),
                    x[:, 1:].reshape((T - 1,) + x.shape[2:]))
        fm1, fm2 = pairs(fmap)
        nt1, _ = pairs(net)
        in1, _ = pairs(inp)
        return (jnp.concatenate([fm1, fm2]), jnp.concatenate([fm2, fm1]),
                jnp.concatenate([nt1, nt1]), jnp.concatenate([in1, in1]))

    fmap1, fmap2, net_b, inp_b = jax.jit(mkpairs)(fmap, net, inp)
    print(f"pair batch: {fmap1.shape}", flush=True)

    def refine(p, f1, f2, n, i):
        return pipe.raft.apply({"params": p}, f1, f2, n, i, 20,
                               method="refine")

    fmap1_e, fmap2_e, net_e, inp_e = jax.jit(mkpairs)(*enc16_out)

    outs = {}
    for mode in ("fp32", "bf16", "bf16+enc"):
        if mode == "bf16":
            args = (cast_bf(rp), cast_bf(fmap1), cast_bf(fmap2),
                    cast_bf(net_b), cast_bf(inp_b))
        elif mode == "bf16+enc":
            # features straight from the bf16 encoders (already bf16)
            args = (cast_bf(rp), fmap1_e, fmap2_e, net_e, inp_e)
        else:
            args = (rp, fmap1, fmap2, net_b, inp_b)
        f = jax.jit(refine)
        out = f(*args)
        fence(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(4):
                out = f(*args)
            fence(out)
            best = min(best, (time.perf_counter() - t0) / 4)
        outs[mode] = jax.tree.map(lambda a: np.asarray(a, np.float32), out)
        print(f"refine(20) {mode}: {best * 1e3:7.1f} ms", flush=True)

    fu32 = outs["fp32"][1]
    mag = np.abs(fu32).mean()
    for mode in ("bf16", "bf16+enc"):
        drift = np.abs(fu32 - outs[mode][1])
        print(f"[{mode}] flow_up |mean| {mag:.3f} px; drift mean "
              f"{drift.mean():.4f} max {drift.max():.3f} px", flush=True)


if __name__ == "__main__":
    main()
