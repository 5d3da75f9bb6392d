"""Device-mesh sharding and host→HBM streaming.

This is the TPU-native replacement for the reference's DataParallel /
DataLoader plumbing (``models/models_abc.py:47-85``, survey §2.11):
batch-axis data parallelism over the ICI mesh via ``jax.sharding``,
fed by a threaded double-buffered host loader.
"""

from tiatoolbox_tpu.parallel.mesh import (  # noqa: F401
    get_data_mesh,
    get_hybrid_data_mesh,
    initialize_multihost,
    pad_to_multiple,
    shard_batch,
    shard_batch_multihost,
)
from tiatoolbox_tpu.parallel.pipeline import BatchLoader  # noqa: F401
