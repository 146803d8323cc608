"""Per-HLO-op profile of the stage-4 hot components (featprop + blocks).

Runs the 16-iteration scanned component (same harness as
tools/stage4_scan_breakdown.py), captures a jax.profiler trace of ONE scan
execution, and aggregates device-side op durations from the trace's
"XLA Ops" thread — divided by 16 to give per-window per-op cost. This is
ground truth for where featprop's ~32 ms and the blocks' ~23 ms go.

Run from the repo root with NOTHING else on the chip:
    python tools/profile_stage4.py [featprop|blocks|ffn|deform]
"""

import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from propainter_tpu.utils.jax_cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

import flax.linen as nn

from propainter_tpu.models.propainter import (
    FeaturePropagation, FusionFeedForward, TemporalSparseTransformerBlock)

N = 16
L_T, T = 11, 19
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


def scanned(apply_fn, params, xs_spec):
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

    return run, xs


def profile(run, params, xs, tag):
    fence(run(params, xs))  # compile + warm
    trace_dir = f"/tmp/prof_{tag}"
    jax.profiler.start_trace(trace_dir)
    fence(run(params, xs))
    jax.profiler.stop_trace()
    return trace_dir


def report(trace_dir, top=40):
    paths = sorted(glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")))
    with gzip.open(paths[-1]) as f:
        d = json.load(f)
    ev = d["traceEvents"]
    # find the device pid and its "XLA Ops" tid
    dev_pids = {e["pid"] for e in ev if e.get("ph") == "M"
                and e.get("name") == "process_name"
                and "TPU" in e["args"].get("name", "")}
    ops_tids = {(e["pid"], e["tid"]) for e in ev if e.get("ph") == "M"
                and e.get("name") == "thread_name"
                and e["args"].get("name") == "XLA Ops"
                and e["pid"] in dev_pids}
    agg = collections.Counter()
    cnt = collections.Counter()
    total = 0.0
    for e in ev:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in ops_tids:
            continue
        # collapse fusion numbering: foo_fusion.123 -> foo_fusion
        name = re.sub(r"[.\d]+$", "", e["name"])
        agg[name] += e["dur"]
        cnt[name] += 1
        total += e["dur"]
    print(f"  total device op time: {total/1e3:.2f} ms "
          f"({total/1e3/N:.3f} ms/window)")
    for n, v in agg.most_common(top):
        print(f"  {v/1e3:8.3f} ms  {v/1e3/N:7.3f} ms/win  x{cnt[n]:<5d} {n}",
              flush=True)


def featprop_case():
    key = jax.random.PRNGKey(1)
    fp = FeaturePropagation(C)
    p = rnd_params(jax.eval_shape(lambda: fp.init(
        key, jnp.zeros((1, L_T, h, w, C)), jnp.zeros((1, L_T - 1, h, w, 2)),
        jnp.zeros((1, L_T - 1, h, w, 2)), jnp.zeros((1, L_T, h, w, 2)))), key)
    run, xs = scanned(
        lambda pp, x: fp.apply(pp, x["a"], x["f"], x["g"], x["m"]), p,
        {"a": ((1, L_T, h, w, C), DT), "f": ((1, L_T - 1, h, w, 2), DT),
         "g": ((1, L_T - 1, h, w, 2), DT), "m": ((1, L_T, h, w, 2), DT)})
    return run, p, xs


def blocks_case():
    key = jax.random.PRNGKey(1)
    blk = TemporalSparseTransformerBlock(HID, 4, (5, 9), (4, 4), 8, "flash")
    mw_idx = jnp.broadcast_to(jnp.arange(8, dtype=jnp.int32), (1, 8))
    mw_valid = jnp.ones((1, 8), bool)

    def blk_apply(pp, x):
        return blk.apply(pp, x["a"], (h, w), x["m"].astype(DT), 2,
                         None, (mw_idx, mw_valid), L_T)

    p = rnd_params(jax.eval_shape(lambda: blk.init(
        key, jnp.zeros((1, T, FH, FW, HID)), (h, w),
        jnp.zeros((1, L_T, FH, FW, 1)), 2, None, (mw_idx, mw_valid),
        L_T)), key)
    run, xs = scanned(
        blk_apply, p,
        {"a": ((1, T, FH, FW, HID), DT), "m": ((1, L_T, FH, FW, 1), bool)})
    return run, p, xs


def ffn_case():
    key = jax.random.PRNGKey(1)
    ffn = FusionFeedForward(HID)
    p = rnd_params(jax.eval_shape(lambda: ffn.init(
        key, jnp.zeros((1, T * FH * FW, HID)), (h, w))), key)
    run, xs = scanned(
        lambda pp, x: ffn.apply(pp, x["a"], (h, w)), p,
        {"a": ((1, T * FH * FW, HID), DT)})
    return run, p, xs


def deform_case():
    from propainter_tpu.ops.deform import modulated_deform_conv2d_mxu
    key = jax.random.PRNGKey(1)
    kernel = 0.02 * jax.random.normal(key, (3, 3, C, C), DT)
    bias = jnp.zeros((C,), DT)

    def apply_fn(pp, x):
        off = 3.0 * jnp.tanh(x["o"]) + x["fl"][..., None, None, :]
        return modulated_deform_conv2d_mxu(
            x["x"], off, jax.nn.sigmoid(x["m"]), pp["k"], pp["b"],
            row_chunk=8)

    p = {"k": kernel, "b": bias}
    run, xs = scanned(
        apply_fn, p,
        {"x": ((1, h, w, C), DT), "o": ((1, h, w, 16, 9, 2), DT),
         "m": ((1, h, w, 16, 9), DT), "fl": ((1, h, w, 2), DT)})
    return run, p, xs


def decoder_case():
    """Generator decoder tail on the 11 local frames (60x108 -> 240x432)."""
    from propainter_tpu.models.propainter import _Deconv, conv2d, leaky_relu

    class _DecoderTail(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = leaky_relu(_Deconv(128, name="decoder_0")(x), 0.2)
            x = leaky_relu(conv2d(64, 3, 1, 1, name="decoder_2")(x), 0.2)
            x = leaky_relu(_Deconv(64, name="decoder_4")(x), 0.2)
            return jnp.tanh(conv2d(3, 3, 1, 1, name="decoder_6")(x))

    key = jax.random.PRNGKey(1)
    dec = _DecoderTail()
    p = rnd_params(jax.eval_shape(lambda: dec.init(
        key, jnp.zeros((L_T, h, w, C)))), key)
    run, xs = scanned(
        lambda pp, x: dec.apply(pp, x["a"]), p,
        {"a": ((L_T, h, w, C), DT)})
    return run, p, xs


def flowprop_case():
    """Flow-completion bidirectional propagation (2 x 79-step scan)."""
    from propainter_tpu.models.flow_completion import (
        BidirectionalPropagation3D)

    key = jax.random.PRNGKey(1)
    prop = BidirectionalPropagation3D(128)
    m = jax.random.normal(key, (2, 79, 30, 54, 128), DT)
    p = rnd_params(jax.eval_shape(
        lambda: prop.init(key, m.astype(jnp.float32))), key)

    @jax.jit
    def run(pp, a):
        return prop.apply(pp, a).ravel()[:1]

    # one call, not a 16-iter scan: read the TOTAL, ignore the /16 column
    return run, p, m


def fcdec_case():
    """Flow-completion decoder chain (158 frames, 30x54 -> 240x432)."""
    from propainter_tpu.models.flow_completion import _Deconv as FCDeconv
    from propainter_tpu.models.layers import conv2d as c2d, leaky_relu as lr

    class _FCDecoder(nn.Module):
        @nn.compact
        def __call__(self, prop, e1):
            d2 = lr(c2d(128, 3, 1, 1, name="decoder2_0")(prop), 0.2)
            d2 = lr(FCDeconv(64, name="decoder2_2")(d2), 0.2) + e1
            d1 = lr(c2d(64, 3, 1, 1, name="decoder1_0")(d2), 0.2)
            d1 = lr(FCDeconv(32, name="decoder1_2")(d1), 0.2)
            u = lr(c2d(32, 3, 1, 1, name="upsample_0")(d1), 0.2)
            return FCDeconv(2, name="upsample_2")(u)

    key = jax.random.PRNGKey(1)
    dec = _FCDecoder()
    prop = jax.random.normal(key, (158, 30, 54, 128), DT)
    e1 = jax.random.normal(key, (158, 60, 108, 64), DT)
    p = rnd_params(jax.eval_shape(lambda: dec.init(
        key, prop.astype(jnp.float32), e1.astype(jnp.float32))), key)

    @jax.jit
    def run(pp, a):
        return dec.apply(pp, a[0], a[1]).ravel()[:1]

    return run, p, (prop, e1)


def raft_case():
    """bf16 refine(20) at the bench all-pairs batch (158 pairs, 30x54)."""
    from bench import build_pipeline, T as TT, H as HH, W as WW

    pipe = build_pipeline("bf16")
    bf = lambda t: jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, t)
    rp = bf(pipe.raft_params)
    key = jax.random.PRNGKey(0)
    frames = 127.0 * jax.random.normal(key, (TT, HH, WW, 3), jnp.float32)
    fmap, net, inp = jax.jit(
        lambda p, x: pipe.raft.apply({"params": p}, x,
                                     compute_dtype=jnp.bfloat16,
                                     method="encode"))(rp, frames)

    def mkpairs(fmap, net, inp):
        def pairs(x):
            a = jnp.concatenate([x[:-1], x[1:]], axis=0)
            b = jnp.concatenate([x[1:], x[:-1]], axis=0)
            return a, b
        f1, f2 = pairs(fmap)
        n, _ = pairs(net)
        i, _ = pairs(inp)
        return f1, f2, n, i

    f1, f2, n, i = jax.jit(mkpairs)(fmap, net, inp)

    @jax.jit
    def run(p, a):
        f1, f2, n, i = a
        _, fu = pipe.raft.apply({"params": p}, f1, f2, n, i, 20,
                                method="refine")
        return fu.ravel()[:1]

    # one call, not a 16-iter scan: read the TOTAL, ignore the /16 column
    return run, rp, (f1, f2, n, i)


CASES = {"featprop": featprop_case, "blocks": blocks_case,
         "ffn": ffn_case, "deform": deform_case, "decoder": decoder_case,
         "flowprop": flowprop_case, "fcdec": fcdec_case, "raft": raft_case}


def main():
    which = sys.argv[1:] or ["featprop", "blocks"]
    for tag in which:
        print(f"== {tag} (16-iter scan, per-window = /16)", flush=True)
        run, p, xs = CASES[tag]()
        report(profile(run, p, xs, tag))


if __name__ == "__main__":
    main()
