"""Post-processing definitions (reference ``utils/postproc_defs.py:11-138``)."""

from __future__ import annotations

import colorsys
import warnings

import numpy as np


class MultichannelToRGB:
    """Map multichannel (e.g. fluorescence) images to RGB via channel colors.

    Matches the reference semantics (``postproc_defs.py:11-138``):
    ``color_dict`` maps channel names to RGB tuples in [0, 1]; setting
    it populates ``colors``/``channels``. Images with fewer than 5
    channels are passed through (assumed RGB(A)).

    Args:
        color_dict: Channel-name → RGB mapping. Auto-generated HSV
            palette when None.
    """

    def __init__(
        self,
        color_dict: dict[str, tuple[float, float, float]] | None = None,
    ) -> None:
        self.colors: np.ndarray | None = None
        self.is_validated: bool = False
        self.channels: list[int] | None = None
        self.enhance: float = 1.0
        self.color_dict = color_dict

    def validate(self, n: int) -> None:
        """Check color count vs channel count (n or n+1 with background)."""
        if self.colors is None:
            msg = "Colors must be initialized before validation."
            raise ValueError(msg)
        n_colors = len(self.colors)
        if self.channels is None:
            self.channels = list(range(n_colors))
        if n_colors == n:
            self.is_validated = True
            return
        if n_colors - 1 == n:
            self.colors = self.colors[:n]
            self.channels = [c for c in self.channels if c < n]
            self.is_validated = True
            msg = (
                "Number of channels in image is one less than colors in color "
                "dict. Assuming last channel is background autofluorescence "
                "and ignoring it."
            )
            warnings.warn(msg, stacklevel=2)
            return
        msg = f"Number of colors: {n_colors} does not match channels in image: {n}."
        raise ValueError(msg)

    def generate_colors(self, n_channels: int) -> np.ndarray:
        """Auto-generate evenly spaced HSV colors for n channels."""
        self.color_dict = {
            f"channel_{i}": colorsys.hsv_to_rgb(i / n_channels, 1, 1)
            for i in range(n_channels)
        }
        return np.array(list(self.color_dict.values()), dtype=np.float32)

    def set_active_channels(self, active: list[int] | None) -> None:
        """Restrict conversion to a subset of channel indices."""
        self.channels = list(active) if active is not None else None

    def __call__(self, image: np.ndarray) -> np.ndarray:
        """[H, W, N] multichannel → [H, W, 3] uint8 RGB composite."""
        n = image.shape[2]
        if n < 5:  # assume already rgb(a)
            return image
        colors = self.colors
        if colors is None:
            colors = self.generate_colors(n)
        if not self.is_validated:
            self.validate(n)
        if image.dtype == np.uint16:
            image = (image / 256).astype(np.uint8)
        rgb_image = (
            np.einsum(
                "hwn,nc->hwc",
                image[:, :, self.channels],
                colors[self.channels, :],
                optimize=True,
            )
            * self.enhance
        )
        return np.clip(rgb_image, 0, 255).astype(np.uint8)

    def __setattr__(self, name: str, value) -> None:
        if name == "color_dict" and value is not None:
            self.colors = np.array(list(value.values()), dtype=np.float32)
            if getattr(self, "channels", None) is None:
                self.channels = list(range(len(value)))
        super().__setattr__(name, value)
