"""Device-mesh utilities for batch-sharded (data-parallel) inference.

The reference's only device parallelism is single-host DataParallel
(``models/models_abc.py:78,235``). The TPU-native design shards the
batch axis of every engine forward over a 1-D mesh of all local
devices; XLA inserts any collectives, and ICI carries them. Multi-host
(DCN) extends the same mesh without code changes.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


@functools.lru_cache(maxsize=8)
def get_data_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over the first ``n_devices`` local devices, axis "data"."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding that splits axis 0 (batch) across the mesh."""
    return NamedSharding(mesh, PartitionSpec("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding that replicates a value on every device."""
    return NamedSharding(mesh, PartitionSpec())


def pad_to_multiple(batch: np.ndarray, multiple: int) -> tuple[np.ndarray, int]:
    """Pad axis 0 so its length divides ``multiple``; return (padded, n_valid)."""
    n = batch.shape[0]
    remainder = n % multiple
    if remainder == 0:
        return batch, n
    pad = multiple - remainder
    pad_block = np.repeat(batch[-1:], pad, axis=0)
    return np.concatenate([batch, pad_block], axis=0), n


def shard_batch(batch: np.ndarray, mesh: Mesh | None = None):
    """Async host→HBM transfer with the batch axis sharded over the mesh.

    The transfer is asynchronous (``jax.device_put`` returns
    immediately), so enqueuing batch N+1 overlaps the device computing
    batch N — the double-buffering the reference approximates with
    DataLoader worker processes.
    """
    if mesh is None:
        mesh = get_data_mesh()
    return jax.device_put(batch, batch_sharding(mesh))


def shard_model_variables(variables, mesh: Mesh | None = None):
    """Replicate model weights onto every mesh device."""
    if mesh is None:
        mesh = get_data_mesh()
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), variables)
