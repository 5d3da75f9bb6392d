"""Model zoo: flax architectures, datasets, and inference engines."""

from tiatoolbox_tpu.models.models_abc import ModelABC  # noqa: F401
