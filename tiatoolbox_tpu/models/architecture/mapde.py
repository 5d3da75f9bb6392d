"""Flax MapDe detection model (reference ``models/architecture/mapde.py``).

MicroNet trunk with ReLU output heads, followed by a fixed distance-
disk convolution producing per-class centroid-peak maps. Peak local-max
post-processing yields detections.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tiatoolbox_tpu.models.architecture.micronet import MicroNet, _MicroNetNet
from tiatoolbox_tpu.models.architecture.utils import peak_detection_map_overlap


def _dist_filter_11() -> np.ndarray:
    """The fixed 11x11 distance-cone filter.

    Closed form ``max(0, 1 - dist/5)`` on an 11x11 grid — reproduces
    the reference's hard-coded table (``mapde.py:94-219``) exactly.
    """
    yy, xx = np.mgrid[-5:6, -5:6]
    r = np.hypot(yy, xx)
    return np.maximum(1 - r / 5.0, 0).astype(np.float32)


class _MapDeNet(nn.Module):
    num_input_channels: int = 3
    num_classes: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        trunk = _MicroNetNet(
            num_input_channels=self.num_input_channels,
            num_output_channels=self.num_classes * 2,
            out_activation="relu",
            name="trunk",
        )
        logits, _, _, _ = trunk(x)
        filt = jnp.asarray(_dist_filter_11())  # [11, 11]
        # kernel HWIO: same disk for every (in=2C, out=C) pair
        kernel = jnp.broadcast_to(
            filt[:, :, None, None],
            (11, 11, self.num_classes * 2, self.num_classes),
        )
        out = jax.lax.conv_general_dilated(
            logits,
            kernel,
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return nn.relu(out)


class MapDe(MicroNet):
    """Deconvolving CNN cell detector (Raza et al. 2019).

    Args:
        num_input_channels: Input channels.
        num_classes: Number of cell classes.
        min_distance / threshold_abs: Peak detection parameters.
    """

    def __init__(
        self,
        num_input_channels: int = 3,
        min_distance: int = 4,
        threshold_abs: float = 250,
        num_classes: int = 1,
        tile_shape=(2048, 2048),
        class_dict: dict | None = None,
        **kwargs,
    ) -> None:
        from tiatoolbox_tpu.models.models_abc import ModelABC

        module = _MapDeNet(
            num_input_channels=num_input_channels, num_classes=num_classes
        )
        ModelABC.__init__(self, module, **kwargs)
        self.in_ch = num_input_channels
        self.tasks = ["nuclei_detection"]
        self.min_distance = min_distance
        self.threshold_abs = threshold_abs
        self.num_classes = num_classes
        self.tile_shape = tile_shape
        self.class_dict = class_dict
        self._jitted_infer = None

    @staticmethod
    def preproc(image: np.ndarray) -> np.ndarray:
        """MapDe uses raw [0, 255] floats (scaling inside the trunk)."""
        return image

    @staticmethod
    def infer_batch(model: "MapDe", batch_data, device: str | None = None):  # noqa: ARG004
        batch = jnp.asarray(batch_data).astype(model.compute_dtype)
        if model._jitted_infer is None:
            module = model.module

            def _run(variables, x):
                return module.apply(variables, x).astype(jnp.float32)

            model._jitted_infer = model.bind_jit(_run)
        return np.asarray(model._jitted_infer(batch))

    def postproc(
        self,
        block: np.ndarray,
        min_distance: int | None = None,
        threshold_abs: float | None = None,
        **_kwargs,
    ) -> np.ndarray:
        """Peak map: 1.0 at detected centroid peaks (HWC in/out)."""
        block = np.asarray(block)
        min_distance = self.min_distance if min_distance is None else min_distance
        threshold_abs = self.threshold_abs if threshold_abs is None else threshold_abs
        out = np.zeros_like(block, dtype=np.float32)
        for c in range(block.shape[-1]):
            coords = peak_detection_map_overlap(
                block[..., c], min_distance=min_distance, threshold_abs=threshold_abs
            )
            if len(coords):
                out[coords[:, 0], coords[:, 1], c] = 1.0
        return out
