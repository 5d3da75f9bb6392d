"""Post-processing definitions (reference ``utils/postproc_defs.py:11-138``)."""

from __future__ import annotations

import numpy as np


class MultichannelToRGB:
    """Map multichannel (e.g. fluorescence) images to RGB via channel colors.

    Args:
        colors: Per-channel RGB(A) colors in [0, 1]; defaults to a
            rotating palette when None.
        channel_names: Optional channel labels.
    """

    def __init__(self, colors=None, channel_names=None) -> None:
        self.colors = np.asarray(colors, dtype=np.float32) if colors is not None else None
        self.channel_names = channel_names
        self.enhance = 1.0
        self._active: np.ndarray | None = None

    def _default_colors(self, n_channels: int) -> np.ndarray:
        from tiatoolbox_tpu.utils.visualization import random_colors

        return random_colors(n_channels).astype(np.float32)

    def set_active_channels(self, active) -> None:
        """Restrict conversion to a subset of channel indices."""
        self._active = np.asarray(active, dtype=int) if active is not None else None

    def __call__(self, image: np.ndarray) -> np.ndarray:
        """[H, W, C] multichannel → [H, W, 3] uint8 RGB composite."""
        image = np.asarray(image)
        if image.ndim == 2:
            image = image[:, :, None]
        n_channels = image.shape[-1]
        if n_channels == 3 and self.colors is None:
            return image.astype(np.uint8)
        colors = (
            self.colors if self.colors is not None else self._default_colors(n_channels)
        )
        colors = colors[:, :3]
        channels = np.arange(n_channels)
        if self._active is not None:
            channels = self._active
        img_float = image.astype(np.float32)
        if img_float.max() > 0:
            img_float = img_float / img_float.max()
        rgb = np.tensordot(
            img_float[..., channels], colors[channels], axes=([-1], [0])
        )
        rgb = np.clip(rgb * 255.0 * self.enhance, 0, 255)
        return rgb.astype(np.uint8)
