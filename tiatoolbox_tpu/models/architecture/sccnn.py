"""Flax SCCNN (reference ``models/architecture/sccnn.py:25-429``).

Spatially-constrained CNN for nucleus detection: a small valid-conv
stack predicts (row, col, confidence) via sigmoids; layer S2 renders a
radial probability bump at the predicted location over the output
window. Peak local-max post-processing yields detections.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tiatoolbox_tpu.models.architecture.utils import peak_detection_map_overlap
from tiatoolbox_tpu.models.models_abc import ModelABC


class _SCCNNNet(nn.Module):
    num_input_channels: int = 3
    out_height: int = 13
    out_width: int = 13
    radius: int = 12

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        def conv(features, k, name):
            return nn.Conv(
                features, (k, k), padding="VALID", use_bias=True, name=name
            )

        h = nn.relu(conv(30, 2, "l1")(x))
        h = nn.max_pool(h, (2, 2), strides=(2, 2))
        h = nn.relu(conv(60, 2, "l2")(h))
        h = nn.max_pool(h, (2, 2), strides=(2, 2))
        h = nn.relu(conv(90, 3, "l3")(h))
        h = nn.relu(conv(1024, 5, "l4")(h))
        h = nn.relu(conv(512, 1, "l5")(h))
        sc = jax.nn.sigmoid(conv(3, 1, "sc")(h))
        s0 = sc[..., 0:1] * (self.out_height - 1)
        s1 = sc[..., 1:2] * (self.out_width - 1)
        s2 = sc[..., 2:3]

        yv, xv = jnp.meshgrid(
            jnp.arange(self.out_height, dtype=jnp.float32),
            jnp.arange(self.out_width, dtype=jnp.float32),
            indexing="ij",
        )
        # s* are [N, h', w', 1]; broadcast the map over each prediction cell
        # (reference operates on 1x1 spatial predictions: h'=w'=1)
        xvr = (yv[None, :, :] - s0[..., 0]) ** 2
        yvc = (xv[None, :, :] - s1[..., 0]) ** 2
        out_map = xvr + yvc
        threshold = (out_map < self.radius).astype(jnp.float32)
        denominator = 1 + out_map / 2
        sc2 = s2[..., 0] / denominator
        return (sc2 * threshold)[..., None]


class SCCNN(ModelABC):
    """Spatially-constrained CNN nucleus detector.

    Args:
        num_input_channels: Input channels.
        patch_output_shape: (height, width) of the rendered output map.
        radius: Squared-distance threshold of the probability bump.
        min_distance / threshold_abs: Peak detection parameters.
    """

    def __init__(
        self,
        num_input_channels: int = 3,
        patch_output_shape=(13, 13),
        radius: int = 12,
        min_distance: int = 6,
        threshold_abs: float = 0.20,
        tile_shape=(2048, 2048),
        class_dict: dict | None = None,
        **kwargs,
    ) -> None:
        module = _SCCNNNet(
            num_input_channels=num_input_channels,
            out_height=int(patch_output_shape[0]),
            out_width=int(patch_output_shape[1]),
            radius=radius,
        )
        super().__init__(module, **kwargs)
        self.in_ch = num_input_channels
        self.tasks = ["nuclei_detection"]
        self.min_distance = min_distance
        self.threshold_abs = threshold_abs
        self.tile_shape = tile_shape
        self.class_dict = class_dict
        self._jitted_infer = None

    def init(self, rng_key=None, input_shape=(1, 31, 31, 3)) -> None:
        super().init(rng_key, input_shape)

    @staticmethod
    def preproc(image: np.ndarray) -> np.ndarray:
        return (image / 255.0).astype(np.float32)

    @staticmethod
    def infer_batch(model: "SCCNN", batch_data, device: str | None = None):  # noqa: ARG004
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
