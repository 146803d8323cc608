"""Scan-amortized per-component timing of the stage-4 generator window.

The standalone component numbers in tools/stage4_breakdown.py each carry
the ~3 ms axon dispatch floor, so they sum to far more than the fused
full-generator time. Here every component runs inside a 16-iteration
`lax.scan` over device-generated varying inputs (so XLA cannot hoist the
body), one fence at the end: per-iteration time = fused per-window cost
of that component, directly comparable to stage-4's 1.107 s / 16 windows.

Shapes mirror the bench default (80f 432x240, l_t=11, T=19, bf16,
flash attention, occupancy bucketing with an 8-window bucket).

Run from the repo root with NOTHING else on the chip:
    python tools/stage4_scan_breakdown.py
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

from propainter_tpu.models.propainter import (
    Encoder, FeaturePropagation, SoftComp, SoftSplit,
    TemporalSparseTransformerBlock, _Deconv, conv2d, leaky_relu)
import flax.linen as nn

N = 16          # window count at the bench shape
L_T, T = 11, 19
H, W = 240, 432
h, w = 60, 108
FH, FW = 20, 36
C, HID = 128, 512
DT = jnp.bfloat16


def fence(x):
    np.asarray(jax.tree.leaves(x)[0].ravel()[0])


def rnd_params(params, key):
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(key, len(leaves))
    return jax.tree.unflatten(treedef, [
        (0.02 * jax.random.normal(k, l.shape, DT)
         if jnp.issubdtype(l.dtype, jnp.floating) else l)
        for k, l in zip(keys, leaves)])


def timed_scan(name, apply_fn, params, xs_spec, n_meas=4):
    """xs_spec: dict name -> (shape, dtype). Inputs are generated on device
    with a per-iteration random axis so the scan body cannot be hoisted."""

    @jax.jit
    def make_inputs(key):
        out = {}
        for i, (k, (shape, dt)) in enumerate(sorted(xs_spec.items())):
            kk = jax.random.fold_in(key, i)
            if jnp.issubdtype(dt, jnp.floating):
                out[k] = jax.random.normal(kk, (N,) + shape, dt)
            else:
                out[k] = (jax.random.uniform(kk, (N,) + shape) > 0.7)
        return out

    xs = make_inputs(jax.random.PRNGKey(0))
    fence(xs)

    @jax.jit
    def run(params, xs):
        def body(carry, x):
            y = apply_fn(params, x)
            leaf = jax.tree.leaves(y)[0]
            return carry + leaf.ravel()[:1].astype(jnp.float32), None
        acc, _ = jax.lax.scan(body, jnp.zeros((1,), jnp.float32), xs)
        return acc

    fence(run(params, xs))  # compile
    best = float("inf")
    for _ in range(n_meas):
        t0 = time.perf_counter()
        fence(run(params, xs))
        best = min(best, time.perf_counter() - t0)
    per = best / N * 1e3
    print(f"{name:42s} {per:7.2f} ms/window   ({best*1e3:7.1f} ms /16)",
          flush=True)
    return per


class _DecoderTail(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = leaky_relu(_Deconv(128, name="decoder_0")(x), 0.2)
        x = leaky_relu(conv2d(64, 3, 1, 1, name="decoder_2")(x), 0.2)
        x = leaky_relu(_Deconv(64, name="decoder_4")(x), 0.2)
        return jnp.tanh(conv2d(3, 3, 1, 1, name="decoder_6")(x))


def main():
    key = jax.random.PRNGKey(1)
    total = 0.0

    # encoder on the 5 NEW frames per window (encoder overlap carry)
    enc = Encoder()
    p = rnd_params(jax.eval_shape(
        lambda: enc.init(key, jnp.zeros((5, H, W, 5)))), key)
    total += timed_scan(
        "encoder (5 new frames)",
        lambda pp, x: enc.apply(pp, x["a"]), p,
        {"a": ((5, H, W, 5), DT)})

    # feature propagation over the 11 local frames
    fp = FeaturePropagation(C)
    p = rnd_params(jax.eval_shape(lambda: fp.init(
        key, jnp.zeros((1, L_T, h, w, C)), jnp.zeros((1, L_T - 1, h, w, 2)),
        jnp.zeros((1, L_T - 1, h, w, 2)), jnp.zeros((1, L_T, h, w, 2)))), key)
    total += timed_scan(
        "feature propagation (11 local)",
        lambda pp, x: fp.apply(pp, x["a"], x["f"], x["g"], x["m"]), p,
        {"a": ((1, L_T, h, w, C), DT), "f": ((1, L_T - 1, h, w, 2), DT),
         "g": ((1, L_T - 1, h, w, 2), DT), "m": ((1, L_T, h, w, 2), DT)})

    # soft split of the 11 local frames
    ss = SoftSplit(HID)
    p = rnd_params(jax.eval_shape(lambda: ss.init(
        key, jnp.zeros((L_T, h, w, C)), 1, (h, w))), key)
    total += timed_scan(
        "soft split (11 local)",
        lambda pp, x: ss.apply(pp, x["a"], 1, (h, w)), p,
        {"a": ((L_T, h, w, C), DT)})

    # 8 transformer blocks (flash attention, 8-window branch-A bucket)
    blk = TemporalSparseTransformerBlock(
        HID, 4, (5, 9), (4, 4), 8, "flash")
    mw_idx = jnp.broadcast_to(jnp.arange(8, dtype=jnp.int32), (1, 8))
    mw_valid = jnp.ones((1, 8), bool)

    def blk_apply(pp, x):
        return blk.apply(pp, x["a"], (h, w), x["m"].astype(DT), 2,
                         None, (mw_idx, mw_valid), L_T)

    p = rnd_params(jax.eval_shape(lambda: blk.init(
        key, jnp.zeros((1, T, FH, FW, HID)), (h, w),
        jnp.zeros((1, L_T, FH, FW, 1)), 2, None, (mw_idx, mw_valid),
        L_T)), key)
    total += timed_scan(
        "8x transformer block (flash, bucket=8)", blk_apply, p,
        {"a": ((1, T, FH, FW, HID), DT), "m": ((1, L_T, FH, FW, 1), bool)})

    # soft comp of the 11 local frames
    sc = SoftComp(C)
    p = rnd_params(jax.eval_shape(lambda: sc.init(
        key, jnp.zeros((1, L_T * FH * FW, HID)), L_T, (h, w))), key)
    total += timed_scan(
        "soft comp (11 local)",
        lambda pp, x: sc.apply(pp, x["a"], L_T, (h, w)), p,
        {"a": ((1, L_T * FH * FW, HID), DT)})

    # decoder tail on the 11 local frames
    dec = _DecoderTail()
    p = rnd_params(jax.eval_shape(lambda: dec.init(
        key, jnp.zeros((L_T, h, w, C)))), key)
    total += timed_scan(
        "decoder (11 local)",
        lambda pp, x: dec.apply(pp, x["a"]), p,
        {"a": ((L_T, h, w, C), DT)})

    print("-" * 78)
    print(f"{'sum of scanned parts':42s} {total:7.2f} ms/window "
          f"(stage-4 actual ~69 ms incl. compositing/gathers)", flush=True)


if __name__ == "__main__":
    main()
