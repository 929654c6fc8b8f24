"""Device mesh + sharding helpers for SPMD training over ICI.

The reference's only parallelism is data-parallel DDP over NCCL
(/root/reference/train.py:49-51, 110-122; meldataset.py:103-131
DistributedSampler). The TPU-native equivalent (SURVEY.md §2.4): one
`jax.sharding.Mesh` with a `data` axis, batches sharded over it, parameters
replicated, and the gradient all-reduce inserted by the SPMD partitioner
inside the jitted train step — collectives ride ICI, no hand-written
communication. Multi-host extends the same mesh over DCN via
`jax.distributed.initialize` (call `maybe_init_distributed` first on each
host).

A second (currently size-1) `model` axis is kept in the mesh layout so
tensor-parallel shardings of the wide projections (20000-way speaker head,
codebook search) can be enabled without re-plumbing callers.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def maybe_init_distributed() -> None:
    """Initialize multi-host JAX if launched under a multi-process runtime.
    Safe no-op in single-process settings."""
    import os

    if "JAX_COORDINATOR_ADDRESS" in os.environ or "MEGASCALE_COORDINATOR_ADDRESS" in os.environ:
        jax.distributed.initialize()


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[Any]] = None,
) -> Mesh:
    """(data, model) mesh; defaults to all devices on the data axis."""
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place every array in `batch` with its leading dim sharded over data."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Replicate a pytree (params / optimizer state) across the mesh."""
    s = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)
