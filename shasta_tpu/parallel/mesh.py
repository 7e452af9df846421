"""Device-mesh + sharding helpers (the NCCL/DDP replacement).

The reference's only parallelism is single-node data parallelism over NCCL
(tools/nusc_shasta/train.py:92-156, det3d/core/utils/dist_utils.py:8-55).
TPU-native equivalent: a 1-D ``jax.sharding.Mesh`` over the 'data' axis;
batches are sharded along it, parameters replicated, and XLA inserts the
gradient all-reduce (psum) over ICI automatically when the jitted train
step computes replicated grads from sharded batches.

Multi-host: call :func:`init_distributed` per host (the
``jax.distributed.initialize`` analogue of train.py's env:// rendezvous),
then build the mesh over ``jax.devices()`` — DCN-spanning axes should come
first in the mesh order.
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: str | None = None, num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Multi-host rendezvous (replaces torch.distributed env:// init)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator, num_processes, process_id)


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(axis))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict[str, Any], mesh: Mesh, axis: str = "data") -> dict[str, Any]:
    """Device-put every array in the batch sharded on its leading axis."""
    sh = batch_sharding(mesh, axis)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}
