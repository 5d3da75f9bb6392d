"""Datasets feeding the engines (host plane)."""

from tiatoolbox_tpu.models.dataset.dataset_abc import (  # noqa: F401
    PatchDataset,
    PatchDatasetABC,
    WSIPatchDataset,
)
from tiatoolbox_tpu.models.dataset.classification import (  # noqa: F401
    predefined_preproc_func,
)
