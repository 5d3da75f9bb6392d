"""WSI I/O core: metadata, readers, and the tiling contract."""

from tiatoolbox_tpu.wsicore.wsimeta import WSIMeta  # noqa: F401
