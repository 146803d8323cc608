"""Piecewise timing of the two remaining conv-stack fixed costs:

  * the stage-4 generator Encoder (19.3 ms per window at T=19 — 16
    windows ~= 310 ms of the e2e budget), layer by layer, to see whether
    the group-conv fusion stages or the full-res head dominate;
  * the RAFT feature/context encoders (61.5 ms per 80-frame encode vs a
    ~12 ms bf16 roofline estimate), stage by stage.

Run from the repo root with nothing else using the TPU:
    python tools/encoder_breakdown.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from propainter_tpu.utils.jax_cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from propainter_tpu.models.propainter import Encoder
from propainter_tpu.models.raft import BasicEncoder


def fence(x):
    np.asarray(jax.tree.leaves(x)[0].ravel()[0])


def timeit(name, fn, *args, n=10):
    out = fn(*args)
    fence(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        fence(out)
        best = min(best, (time.perf_counter() - t0) / n * 1e3)
    print(f"{name:54s} {best:8.2f} ms", flush=True)
    return best


def rand_params(params, rng):
    return jax.tree.map(
        lambda a: jnp.asarray(
            rng.standard_normal(a.shape) * 0.05, a.dtype), params)


def main():
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    # ---- generator encoder at the window shape (T=19 frames, 5 ch input)
    T = 19
    x = jnp.asarray(rng.standard_normal((T, 240, 432, 5)), dt)
    enc = Encoder()
    params = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 240, 432, 5), dt))
    params = jax.device_put(rand_params(params, rng))
    f = jax.jit(lambda p, v: enc.apply(p, v))
    timeit("generator Encoder full (19,240,432,5)", f, params, x)

    # per-layer: rebuild each layer standalone at its input shape
    from propainter_tpu.models.layers import conv2d, leaky_relu
    import flax.linen as nn

    class _L(nn.Module):
        feat: int
        stride: int

        @nn.compact
        def __call__(self, v):
            return leaky_relu(
                conv2d(self.feat, 3, self.stride, 1, name="c")(v), 0.2)

    shapes = [
        ("layers_0 5->64 s2 @240x432", (T, 240, 432, 5), 64, 2),
        ("layers_2 64->64 s1 @120x216", (T, 120, 216, 64), 64, 1),
        ("layers_4 64->128 s2 @120x216", (T, 120, 216, 64), 128, 2),
        ("layers_6 128->256 s1 @60x108", (T, 60, 108, 128), 256, 1),
        ("layers_8 256->384 s1 @60x108", (T, 60, 108, 256), 384, 1),
        ("layers_10 g2 640->512 @60x108", None, None, None),
        ("layers_12 g4 640->384 @60x108", None, None, None),
        ("layers_14 g8 640->256 @60x108", None, None, None),
        ("layers_16 384->128 s1 @60x108", (T, 60, 108, 384), 128, 1),
    ]
    for name, shp, feat, stride in shapes:
        if shp is None:
            continue
        m = _L(feat, stride)
        p0 = m.init(jax.random.PRNGKey(0), jnp.zeros((1,) + shp[1:], dt))
        p0 = jax.device_put(rand_params(p0, rng))
        v = jnp.asarray(rng.standard_normal(shp), dt)
        g = jax.jit(lambda pp, vv, m=m: m.apply(pp, vv))
        timeit(name, g, p0, v)

    # group-fusion stages measured together: full minus the dense layers
    # is the grouped share; also time one grouped stage explicitly
    from propainter_tpu.models.propainter import SplitGroupConv2d

    class _G(nn.Module):
        feat: int
        g: int

        @nn.compact
        def __call__(self, x0, out):
            cx = x0.shape[-1]
            co = out.shape[-1]
            g = self.g
            parts = [
                jnp.concatenate(
                    [x0[..., j * (cx // g):(j + 1) * (cx // g)],
                     out[..., j * (co // g):(j + 1) * (co // g)]], axis=-1)
                for j in range(g)
            ]
            return leaky_relu(
                SplitGroupConv2d(self.feat, name="l")(parts), 0.2)

    x0 = jnp.asarray(rng.standard_normal((T, 60, 108, 256)), dt)
    for feat, g, cin in ((512, 2, 384), (384, 4, 512), (256, 8, 384)):
        out_prev = jnp.asarray(
            rng.standard_normal((T, 60, 108, cin)), dt)
        m = _G(feat, g)
        p0 = m.init(jax.random.PRNGKey(0),
                    jnp.zeros((1,) + x0.shape[1:], dt),
                    jnp.zeros((1,) + out_prev.shape[1:], dt))
        p0 = jax.device_put(rand_params(p0, rng))
        gf = jax.jit(lambda pp, a, b, m=m: m.apply(pp, a, b))
        timeit(f"group stage g={g} ({cin}+256)->{feat}", gf, p0, x0,
               out_prev)

    # ---- RAFT encoders at the 80-unique-frame shape
    print("---- RAFT encoders (80 frames, 240x432)", flush=True)
    xr = jnp.asarray(rng.standard_normal((80, 240, 432, 3)), jnp.bfloat16)
    for name, norm, odim in (("fnet (instance, 256)", "instance", 256),
                             ("cnet (batch, 256)", "batch", 256)):
        m = BasicEncoder(output_dim=odim, norm_fn=norm)
        p0 = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 240, 432, 3),
                                                     jnp.bfloat16))
        p0 = jax.device_put(rand_params(p0, rng))
        gf = jax.jit(lambda pp, vv, m=m: m.apply(pp, vv))
        timeit(name, gf, p0, xr)


if __name__ == "__main__":
    main()
