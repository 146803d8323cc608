"""Device mesh and sharding helpers.

The reference's only parallelism is single-node DDP over NCCL
(train.py:41-45, core/trainer.py:105-116). The TPU-native design scales via
`jax.sharding.Mesh` + sharding annotations compiled by XLA into ICI
collectives:

  * training: data parallelism — batch sharded over the 'data' axis, params
    replicated, gradient psum inserted by XLA (the pjit analogue of DDP);
  * inference: videos / sliding windows are embarrassingly parallel across
    chips (batch axis), with chunk-overlap halos handled on the host side by
    the chunk scheduler (pipeline.py) exactly as the reference trims overlaps.

All helpers work identically on a virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=N) for testing.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_names=("data",)) -> Mesh:
    """1-D mesh over the first n devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(np.array(devices).reshape(shape), axis_names)


def shard_batch(tree, mesh: Mesh, axis: str = "data"):
    """Place every array in `tree` with its leading dim sharded over `axis`."""
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def replicate(tree, mesh: Mesh):
    """Replicate every array in `tree` across the mesh."""
    def put(x):
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(put, tree)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
