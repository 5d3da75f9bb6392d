"""Flax KongNet (reference ``models/architecture/kongnet.py:508-944``).

Multi-head detection/segmentation: a shared EfficientNet encoder feeds
``num_heads`` independent U-Net decoders with SCSE attention, each with
a 1x1 segmentation head; outputs concatenate on channels. Inference
selects ``target_channels`` and applies sigmoid; postproc is peak
local-max + NMS.

Note: the reference encoder is timm EfficientNetV2-L; this build uses
the in-package EfficientNet family (``variant`` arg; weight conversion
therefore targets matching checkpoints, not the timm release).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tiatoolbox_tpu.models.architecture.efficientnet import EfficientNetEncoder
from tiatoolbox_tpu.models.architecture.utils import (
    nms_on_detection_maps,
    peak_detection_map_overlap,
)
from tiatoolbox_tpu.models.models_abc import ModelABC

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class SCSEAttention(nn.Module):
    """Concurrent spatial + channel squeeze-excite."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ch = x.shape[-1]
        # channel SE
        cse = jnp.mean(x, axis=(1, 2), keepdims=True)
        cse = nn.Dense(max(ch // 16, 1), name="fc1")(cse)
        cse = nn.relu(cse)
        cse = nn.Dense(ch, name="fc2")(cse)
        cse = x * nn.sigmoid(cse)
        # spatial SE
        sse = nn.Conv(1, (1, 1), name="spatial")(x)
        sse = x * nn.sigmoid(sse)
        return cse + sse


class _DecoderBlock(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray | None) -> jnp.ndarray:
        from tiatoolbox_tpu.models.architecture.efficientnet import _BN

        n, h, w, c = x.shape
        x = jax.image.resize(x, (n, h * 2, w * 2, c), method="nearest")
        if skip is not None:
            x = jnp.concatenate([x, skip], axis=-1)
        for i in range(2):
            x = nn.Conv(
                self.out_ch, (3, 3), padding="SAME", use_bias=False, name=f"conv{i}"
            )(x)
            x = _BN(name=f"bn{i}")(x)
            x = nn.relu(x)
        return SCSEAttention(name="scse")(x)


class _KongNetDecoder(nn.Module):
    decoder_channels: tuple = (256, 128, 64, 32, 16)

    @nn.compact
    def __call__(self, feats: list[jnp.ndarray]) -> jnp.ndarray:
        # feats strides [2, 4, 8, 16, 32]; centre block on the deepest
        from tiatoolbox_tpu.models.architecture.efficientnet import _BN

        h = feats[-1]
        h = nn.Conv(h.shape[-1], (3, 3), padding="SAME", use_bias=False, name="center")(h)
        h = _BN(name="center_bn")(h)
        h = nn.relu(h)
        skips = [feats[3], feats[2], feats[1], feats[0], None]
        for i, out_ch in enumerate(self.decoder_channels):
            h = _DecoderBlock(out_ch, name=f"block{i}")(h, skips[i])
        return h


class _KongNetNet(nn.Module):
    num_heads: int = 3
    num_channels_per_head: tuple = (3, 3, 3)
    variant: str = "efficientnet_b4"
    wide_decoder: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        feats = EfficientNetEncoder(variant=self.variant, name="encoder")(x)
        decoder_channels = (
            (512, 256, 128, 64, 32) if self.wide_decoder else (256, 128, 64, 32, 16)
        )
        outs = []
        for i in range(self.num_heads):
            decoded = _KongNetDecoder(
                decoder_channels=decoder_channels, name=f"decoder{i}"
            )(feats)
            outs.append(
                nn.Conv(
                    self.num_channels_per_head[i], (1, 1), name=f"head{i}"
                )(decoded)
            )
        return jnp.concatenate(outs, axis=-1)


class KongNet(ModelABC):
    """Multi-head nuclei detection/classification model.

    Args:
        num_heads: Number of decoder heads.
        num_channels_per_head: Output channels per head.
        target_channels: Channel indices selected at inference.
        min_distance / threshold_abs: Peak-detection parameters.
        wide_decoder: Use the wider decoder channel plan.
    """

    def __init__(
        self,
        num_heads: int,
        num_channels_per_head: list[int],
        target_channels: list[int],
        min_distance: int,
        threshold_abs: float,
        tile_shape=(2048, 2048),
        variant: str = "efficientnet_b4",
        *,
        wide_decoder: bool = False,
        class_dict: dict | None = None,
        **kwargs,
    ) -> None:
        if len(num_channels_per_head) != num_heads:
            msg = (
                f"Number of decoders {len(num_channels_per_head)} must match "
                f"number of heads {num_heads}."
            )
            raise ValueError(msg)
        module = _KongNetNet(
            num_heads=num_heads,
            num_channels_per_head=tuple(num_channels_per_head),
            variant=variant,
            wide_decoder=wide_decoder,
        )
        super().__init__(module, **kwargs)
        self.min_distance = min_distance
        self.threshold_abs = threshold_abs
        self.target_channels = list(target_channels)
        self.class_dict = class_dict
        self.tile_shape = tile_shape
        self.tasks = ["nuclei_detection"]
        self._jitted_infer = None

    def init(self, rng_key=None, input_shape=(1, 64, 64, 3)) -> None:
        super().init(rng_key, input_shape)

    @staticmethod
    def preproc(image: np.ndarray) -> np.ndarray:
        """ImageNet normalization."""
        return ((image / 255.0 - _IMAGENET_MEAN) / _IMAGENET_STD).astype(np.float32)

    @staticmethod
    def infer_batch(model: "KongNet", batch_data, device: str | None = None):  # noqa: ARG004
        batch = jnp.asarray(batch_data).astype(model.compute_dtype)
        if model._jitted_infer is None:
            module = model.module
            target = tuple(model.target_channels)

            @jax.jit
            def _run(variables, x):
                logits = module.apply(variables, x)
                sel = logits[..., jnp.array(target)]
                return jax.nn.sigmoid(sel.astype(jnp.float32))

            model._jitted_infer = _run
        return np.asarray(model._jitted_infer(model.variables, batch))

    def postproc(
        self,
        block: np.ndarray,
        min_distance: int | None = None,
        threshold_abs: float | None = None,
        **_kwargs,
    ) -> np.ndarray:
        """Peak map with per-channel local maxima + NMS."""
        block = np.asarray(block)
        min_distance = self.min_distance if min_distance is None else min_distance
        threshold_abs = self.threshold_abs if threshold_abs is None else threshold_abs
        out = np.zeros_like(block, dtype=np.float32)
        for c in range(block.shape[-1]):
            coords = peak_detection_map_overlap(
                block[..., c], min_distance=min_distance, threshold_abs=threshold_abs
            )
            if len(coords):
                scores = block[coords[:, 0], coords[:, 1], c]
                keep = nms_on_detection_maps(coords, scores, radius=min_distance)
                kept = coords[keep]
                out[kept[:, 0], kept[:, 1], c] = 1.0
        return out
