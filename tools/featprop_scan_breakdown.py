"""Within-scan featprop step breakdown: time scan bodies of increasing
scope at the generator window shape (1,60,108,128), 22 steps/window.

Standalone sub-op timings hit the ~3 ms dispatch floor (PERF.md); this
measures each sub-graph AS a lax.scan body so the in-scan fused cost is
what's compared:
  warp        — packed fb-check + feature warp
  offsets     — the 4-conv offset/mask stack
  deform      — DeformableAlignment's deform conv alone (fixed offsets)
  backbone    — the 2-conv residual backbone
  full        — the real _FeatPropStep

Run from the repo root with nothing else using the TPU:
    python tools/featprop_scan_breakdown.py
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

from propainter_tpu.models.propainter import (
    _FeatPropStep, DeformableAlignment, conv2d, leaky_relu)
from propainter_tpu.ops.warp import flow_warp_packed
from propainter_tpu.ops.deform import split_offset_mask_channels
from propainter_tpu.ops.deform_pallas import modulated_deform_conv2d_opt2

B, H, W, C = 1, 60, 108, 128
N = 22
DT = jnp.bfloat16


def fence(x):
    np.asarray(jax.tree.leaves(x)[0].ravel()[0])


def timeit(name, fn, *args, n=6):
    out = fn(*args)
    fence(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        fence(out)
        best = min(best, (time.perf_counter() - t0) / n / N * 1e3)
    print(f"{name:28s} {best:7.3f} ms/step", flush=True)


class _Offsets(nn.Module):
    @nn.compact
    def __call__(self, carry, xs):
        cond = jnp.concatenate([xs["cond"], carry], axis=-1)  # (..., 261)
        o = leaky_relu(conv2d(C, 3, 1, 1, name="conv_offset_0")(cond), 0.1)
        o = leaky_relu(conv2d(C, 3, 1, 1, name="conv_offset_2")(o), 0.1)
        o = leaky_relu(conv2d(C, 3, 1, 1, name="conv_offset_4")(o), 0.1)
        raw = conv2d(27 * 16, 3, 1, 1, name="conv_offset_6")(o)
        return raw[..., :C], raw


class _Backbone(nn.Module):
    @nn.compact
    def __call__(self, carry, xs):
        feat = jnp.concatenate([xs["feat"], carry, xs["mask"]], axis=-1)
        y = leaky_relu(conv2d(C, 3, 1, 1, name="backbone_0")(feat), 0.2)
        y = conv2d(C, 3, 1, 1, name="backbone_2")(y)
        return carry + y, y


class _DeformOnly(nn.Module):
    @nn.compact
    def __call__(self, carry, xs):
        offset, mask = split_offset_mask_channels(xs["raw"], 16, 3.0,
                                                  flow=xs["flow"])
        kernel = self.param("kernel", nn.initializers.he_normal(),
                            (3, 3, C, C))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        out = modulated_deform_conv2d_opt2(carry, offset, mask, kernel,
                                           bias, 8)
        return out, out


class _WarpOnly(nn.Module):
    @nn.compact
    def __call__(self, carry, xs):
        bundle = jnp.concatenate([xs["flow"], carry], axis=-1)
        warped, _ = flow_warp_packed(bundle, None, xs["flow2"])
        return warped[..., 2:], warped[..., :2]


class _Full(nn.Module):
    @nn.compact
    def __call__(self, carry, xs):
        (i, fp), out = _FeatPropStep(C, "packed", name="step")(
            (jnp.int32(1), carry),
            (xs["feat"], xs["mask"], xs["flow"], xs["flow2"]))
        return fp, out


def scan_mod(mod_cls, carry_shape, xs_spec, key):
    mod = nn.scan(mod_cls, variable_broadcast="params",
                  split_rngs={"params": False}, in_axes=0, out_axes=0)()
    rng = np.random.default_rng(0)
    xs = {k: jnp.asarray(rng.standard_normal((N, B, H, W, ch)), DT)
          for k, ch in xs_spec.items()}
    carry = jnp.asarray(rng.standard_normal((B, H, W) + carry_shape), DT)
    params = mod.init(key, carry, xs)
    leaves, treedef = jax.tree.flatten(params)
    params = jax.tree.unflatten(treedef, [
        0.02 * jax.random.normal(jax.random.fold_in(key, i), l.shape, DT)
        for i, l in enumerate(leaves)])
    f = jax.jit(lambda p, c, xs: mod.apply(p, c, xs))
    return f, params, carry, xs


def main():
    key = jax.random.PRNGKey(0)

    f, p, c, xs = scan_mod(_WarpOnly, (C,), {"flow": 2, "flow2": 2}, key)
    timeit("warp (packed, fused grid)", f, p, c, xs)

    f, p, c, xs = scan_mod(_Offsets, (C,), {"cond": 133}, key)
    timeit("offset stack (4 convs)", f, p, c, xs)

    f, p, c, xs = scan_mod(_DeformOnly, (C,), {"raw": 27 * 16, "flow": 2},
                           key)
    timeit("deform conv (opt2)", f, p, c, xs)

    f, p, c, xs = scan_mod(_Backbone, (C,), {"feat": C, "mask": 5}, key)
    timeit("backbone (2 convs)", f, p, c, xs)

    f, p, c, xs = scan_mod(_Full, (C,),
                           {"feat": C, "mask": 2, "flow": 2, "flow2": 2},
                           key)
    timeit("FULL step", f, p, c, xs)


if __name__ == "__main__":
    main()
