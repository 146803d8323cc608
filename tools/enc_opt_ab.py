"""A/B two encoder-path optimizations found by tools/encoder_breakdown.py:

  1. generator Encoder group-fusion stages: 'split' (g per-group dense
     convs) vs 'dense' (ONE block-diagonal-masked dense conv at full MXU
     lane width) — numerically equal up to fp32 accumulation order.
  2. RAFT fnet InstanceNorm: 'two_pass' (torch-faithful mean then
     E[(x-mean)^2], 3 fp32 traversals) vs 'one_pass' (E[x^2]-mean^2,
     one fewer traversal).

Run from the repo root with nothing else using the TPU:
    python tools/enc_opt_ab.py
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

import propainter_tpu.models.raft as raft_mod
from propainter_tpu.models.layers import InstanceNorm
from propainter_tpu.models.propainter import Encoder


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
    return out


def rand_params(params, rng):
    return jax.tree.map(
        lambda a: jnp.asarray(
            rng.standard_normal(a.shape) * 0.05, a.dtype), params)


def main():
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    # ---- 1) generator encoder: split vs dense-masked group conv
    T = 19
    x = jnp.asarray(rng.standard_normal((T, 240, 432, 5)), dt)
    enc_s = Encoder(group_conv_impl="split")
    enc_d = Encoder(group_conv_impl="dense")
    params = enc_s.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 240, 432, 5), dt))
    params = jax.device_put(rand_params(params, rng))
    f_s = jax.jit(lambda p, v: enc_s.apply(p, v))
    f_d = jax.jit(lambda p, v: enc_d.apply(p, v))
    a = timeit("generator Encoder group_conv=split", f_s, params, x)
    b = timeit("generator Encoder group_conv=dense", f_d, params, x)
    da = np.asarray(a, np.float32)
    db = np.asarray(b, np.float32)
    print(f"  max|dense-split| {np.abs(da - db).max():.3e} "
          f"(|out| mean {np.abs(da).mean():.3f})", flush=True)

    # ---- 2) RAFT fnet: instance norm pass count
    xr = jnp.asarray(rng.standard_normal((80, 240, 432, 3)), dt)
    orig_norm = raft_mod._norm

    def make_fnet(impl):
        def norm(norm_fn, features, name):
            if norm_fn == "instance":
                return InstanceNorm(impl=impl, name=name)
            return orig_norm(norm_fn, features, name)

        raft_mod._norm = norm
        try:
            m = raft_mod.BasicEncoder(output_dim=256, norm_fn="instance")
            p0 = m.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 240, 432, 3), dt))
        finally:
            raft_mod._norm = orig_norm
        raft_mod._norm = norm  # keep patched for apply-time trace
        f = jax.jit(lambda pp, vv, m=m: m.apply(pp, vv))
        return f, p0

    f2, p0 = make_fnet("two_pass")
    p0 = jax.device_put(rand_params(p0, rng))
    a = timeit("fnet instance norm two_pass", f2, p0, xr)
    f1, _ = make_fnet("one_pass")
    b = timeit("fnet instance norm one_pass", f1, p0, xr)
    raft_mod._norm = orig_norm
    da = np.asarray(a, np.float32)
    db = np.asarray(b, np.float32)
    print(f"  max|one-two| {np.abs(da - db).max():.3e} "
          f"(|out| mean {np.abs(da).mean():.3f})", flush=True)


if __name__ == "__main__":
    main()
