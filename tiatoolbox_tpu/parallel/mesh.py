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


# -- multi-host (DCN) -----------------------------------------------------------
#
# Data-parallel inference scales past one host without new collectives:
# weights are replicated, the batch axis is sharded, and each process
# feeds only its addressable shards. The mesh is laid out DCN-outer /
# ICI-inner so any collective XLA does insert (e.g. a global metric
# reduction) runs its fast inner steps over ICI and crosses DCN once.


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialise JAX's distributed runtime for a multi-host slice.

    Call once per process before any backend use. A no-op (returns
    False) when single-process: TPU pod runtimes auto-discover their
    topology, so all arguments may be None there.
    """
    if (
        coordinator_address is None
        and num_processes is None
        and process_id is None
    ):
        # Decide from the environment WITHOUT touching the jax backend
        # (jax.process_count() would initialise it, after which
        # jax.distributed.initialize() refuses to run).
        import os

        workers = os.environ.get("TPU_WORKER_HOSTNAMES", "")
        pod_env = any(
            os.environ.get(key)
            for key in (
                "COORDINATOR_ADDRESS",
                "JAX_COORDINATOR_ADDRESS",
                "MEGASCALE_COORDINATOR_ADDRESS",
            )
        ) or len([h for h in workers.split(",") if h.strip()]) > 1
        if not pod_env:
            return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def get_hybrid_data_mesh(n_devices: int | None = None) -> Mesh:
    """1-D "data" mesh ordered DCN-outer (host-major), ICI-inner.

    On a single host this equals :func:`get_data_mesh`. On a multi-host
    slice, devices are grouped so each process's addressable devices
    are contiguous along the batch axis — per-host batch shards stay
    host-local (no DCN traffic on the data path) and any inserted
    collective reduces over ICI first.
    """
    if jax.process_count() <= 1:
        return get_data_mesh(n_devices)
    if n_devices is not None:
        # Truncating a multi-host mesh would drop some processes'
        # devices — their local shards would have no home and
        # make_array_from_process_local_data diverges across hosts.
        msg = "n_devices cannot be used with a multi-host mesh."
        raise ValueError(msg)
    from jax.experimental import mesh_utils

    per_host = len(jax.local_devices())
    hosts = jax.process_count()
    hybrid = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=(1, per_host),
        dcn_mesh_shape=(hosts, 1),
    )
    return Mesh(hybrid.reshape(-1), axis_names=("data",))


def shard_batch_multihost(local_batch: np.ndarray, mesh: Mesh | None = None):
    """Global sharded array from this process's LOCAL batch slice.

    Each host reads/stages only its own patches (batch axis length =
    global_batch / process_count); the returned global array addresses
    every host's shards. Single-process, this equals
    :func:`shard_batch`.
    """
    if mesh is None:
        mesh = get_hybrid_data_mesh()
    if jax.process_count() <= 1:
        return shard_batch(local_batch, mesh)
    return jax.make_array_from_process_local_data(
        batch_sharding(mesh), np.ascontiguousarray(local_batch)
    )
