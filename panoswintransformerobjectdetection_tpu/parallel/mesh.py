"""Mesh + sharding helpers.

The detection workloads are data-parallel (per-device whole images — what
the reference's DDP does, SURVEY.md 2.10); the mesh is 1-D over all chips.
Window attention already partitions the sequence (SURVEY.md 5.7), so no
tensor/sequence axis is needed for parity; helpers still accept extra axes
for model-parallel experiments.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None,
              axis_names: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def data_sharding(mesh: Mesh, ndim: int = 1, axis: str = "data") -> NamedSharding:
    """Shard dim 0 over the data axis; replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of host arrays with dim-0 batch sharding.

    Single-host: a plain device_put with NamedSharding.  Multi-host: each
    process holds only its LOCAL shard (dim 0 = global_batch / n_processes,
    fed by its DetDataLoader shard), and the pieces are assembled into one
    global array (`make_array_from_process_local_data` — the jax.distributed
    analogue of DistributedGroupSampler + DDP local batches,
    `mmdet/datasets/builder.py:75`)."""
    multihost = jax.process_count() > 1

    def put(x):
        sharding = data_sharding(mesh, np.ndim(x))
        if multihost:
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x))
        return jax.device_put(x, sharding)
    return jax.tree_util.tree_map(put, batch)
