"""Per-section timing of flow completion at the bench shape.

Times three standalone proxies (random params, bf16 like the bench
pipeline) on the chip:
  * encoder+mid: downsample conv3d + P3D blocks + dilated mid layers
  * prop: BidirectionalPropagation3D (the 2x79-step sequential scan)
  * decoder: per-frame decoder conv stack + upsamples + projection
Standalone numbers include one ~3 ms dispatch floor each (PERF.md); the
fused full-net time is what the pipeline pays.

Run from the repo root with nothing else on the chip:
    python tools/flowcomp_breakdown.py
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
import flax.linen as nn

from propainter_tpu.models.flow_completion import (
    BidirectionalPropagation3D, Conv3d, P3DBlock, RecurrentFlowCompleteNet,
    _Deconv)
from propainter_tpu.models.layers import conv2d, leaky_relu

B, T, H, W = 2, 79, 240, 432
DT = jnp.bfloat16


def fence(x):
    np.asarray(jax.tree.leaves(x)[0].ravel()[0])


def timed(name, fn, *args, n=5):
    jitted = jax.jit(fn)
    fence(jitted(*args))  # compile
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fence(jitted(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best * 1e3:.1f} ms", flush=True)
    return best


class _EncMid(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = Conv3d(32, (1, 5, 5), (1, 2, 2), (0, 2, 2), replicate_pad=True,
                   name="downsample_0")(x)
        x = leaky_relu(x, 0.2)
        e1 = leaky_relu(P3DBlock(32, 1, name="encoder1_0")(x), 0.2)
        e1 = leaky_relu(P3DBlock(64, 2, name="encoder1_2")(e1), 0.2)
        e2 = leaky_relu(P3DBlock(64, 1, name="encoder2_0")(e1), 0.2)
        e2 = leaky_relu(P3DBlock(128, 2, name="encoder2_2")(e2), 0.2)
        m = leaky_relu(Conv3d(128, (1, 3, 3), (1, 1, 1), (0, 3, 3),
                              dilation=(1, 3, 3), name="mid_dilation_0")(e2),
                       0.2)
        m = leaky_relu(Conv3d(128, (1, 3, 3), (1, 1, 1), (0, 2, 2),
                              dilation=(1, 2, 2), name="mid_dilation_2")(m),
                       0.2)
        m = leaky_relu(Conv3d(128, (1, 3, 3), (1, 1, 1), (0, 1, 1),
                              name="mid_dilation_4")(m), 0.2)
        return m, e1


class _Decoder(nn.Module):
    @nn.compact
    def __call__(self, prop, e1):
        d2 = leaky_relu(conv2d(128, 3, 1, 1, name="decoder2_0")(prop), 0.2)
        d2 = leaky_relu(_Deconv(64, name="decoder2_2")(d2), 0.2)
        d2 = d2 + e1
        d1 = leaky_relu(conv2d(64, 3, 1, 1, name="decoder1_0")(d2), 0.2)
        d1 = leaky_relu(_Deconv(32, name="decoder1_2")(d1), 0.2)
        u = leaky_relu(conv2d(32, 3, 1, 1, name="upsample_0")(d1), 0.2)
        return _Deconv(2, name="upsample_2")(u)


def rnd(params, key):
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(key, len(leaves))
    return jax.tree.unflatten(treedef, [
        (0.02 * jax.random.normal(k, l.shape, DT)
         if jnp.issubdtype(l.dtype, jnp.floating) else l)
        for k, l in zip(keys, leaves)])


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, T, H, W, 3), DT)

    encmid = _EncMid()
    p_enc = rnd(jax.eval_shape(lambda: encmid.init(key, x))["params"], key)
    timed("encoder+mid (B=2,T=79, 240x432->30x54)",
          lambda p, a: encmid.apply({"params": p}, a), p_enc, x)

    m = jax.random.normal(key, (B, T, 30, 54, 128), DT)
    prop = BidirectionalPropagation3D(128)
    # init with fp32 input: fp32 init params + bf16 input would give the
    # scan a bf16 carry-in but fp32 carry-out (the bench path uses bf16
    # params everywhere, so this only bites the init here)
    p_prop = rnd(jax.eval_shape(
        lambda: prop.init(key, m.astype(jnp.float32)))["params"], key)
    timed("bidirectional prop (2x79-step scan at 30x54x128)",
          lambda p, a: prop.apply({"params": p}, a), p_prop, m)

    pr = jax.random.normal(key, (B * T, 30, 54, 128), DT)
    e1 = jax.random.normal(key, (B * T, 60, 108, 64), DT)
    dec = _Decoder()
    p_dec = rnd(jax.eval_shape(lambda: dec.init(key, pr, e1))["params"], key)
    timed("decoder (158 frames, 30x54->240x432)",
          lambda p, a, b: dec.apply({"params": p}, a, b), p_dec, pr, e1)

    net = RecurrentFlowCompleteNet()
    flows = jax.random.normal(key, (B, T, H, W, 2), DT)
    masks = (jax.random.uniform(key, (B, T, H, W, 1)) > 0.8).astype(DT)
    p_net = rnd(jax.eval_shape(
        lambda: net.init(key, flows.astype(jnp.float32),
                         masks.astype(jnp.float32)))["params"], key)
    timed("full net", lambda p, a, b: net.apply({"params": p}, a, b)[0],
          p_net, flows, masks)


if __name__ == "__main__":
    main()
