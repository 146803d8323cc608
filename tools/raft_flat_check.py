"""TPU check: RAFT refine with corr_layout='flat' (+ fused convc1) vs
'batched' — same params, same inputs; flows must agree to bf16-class
tolerance. Run from the repo root with nothing else using the TPU:

    python tools/raft_flat_check.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from propainter_tpu.utils.jax_cache import enable_persistent_cache

enable_persistent_cache()
import jax.numpy as jnp


def main():
    from propainter_tpu.models.raft import RAFT

    B, H, W = 4, 64, 96
    rng = np.random.default_rng(0)
    img1 = jnp.asarray(rng.uniform(-1, 1, (B, H, W, 3)), jnp.float32)
    img2 = jnp.asarray(rng.uniform(-1, 1, (B, H, W, 3)), jnp.float32)

    params = RAFT(corr_layout="batched").init(
        jax.random.PRNGKey(0), img1, img2, iters=1)["params"]

    flows = {}
    for layout in ("batched", "flat"):
        model = RAFT(corr_layout=layout)
        _, up = jax.jit(
            lambda p, a, b: model.apply({"params": p}, a, b, 12)
        )(params, img1, img2)
        flows[layout] = np.asarray(up)

    d = np.abs(flows["flat"] - flows["batched"])
    scale = np.abs(flows["batched"]).max()
    print(f"flow scale={scale:.3f}  max|diff|={d.max():.4f}  "
          f"mean|diff|={d.mean():.5f}")
    assert np.isfinite(flows["flat"]).all()
    assert d.max() < max(0.05, 0.02 * scale), d.max()
    print("OK: flat(+moenc) refine matches batched refine")


if __name__ == "__main__":
    main()
