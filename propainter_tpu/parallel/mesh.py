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

import os

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids: str | None = None,
) -> bool:
    """Multi-host bootstrap: `jax.distributed.initialize` when configured.

    TPU-native analogue of the reference's DDP env discovery
    (/root/reference/core/dist.py:5-47 sniffs OMPI/PMI rank/size + master
    IP; /root/reference/train.py:41-45 calls init_process_group(nccl)).
    Here a pod-slice / multi-slice run sets either the explicit flags or
    the standard env vars (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID, or a TPU pod's automatic discovery) and every process
    sees the GLOBAL device list through `jax.devices()`; single-process
    runs (the v5e-8 single-host target, and this dev harness) skip
    initialization entirely and behave exactly as before.

    Returns True iff `jax.distributed.initialize` was called.
    """
    env = os.environ
    configured = (
        coordinator_address is not None
        or "JAX_COORDINATOR_ADDRESS" in env
        or "COORDINATOR_ADDRESS" in env
    )
    if not configured:
        return False
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = [
            int(x) for x in str(local_device_ids).split(",") if x != ""]
    jax.distributed.initialize(**kwargs)
    return True


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
