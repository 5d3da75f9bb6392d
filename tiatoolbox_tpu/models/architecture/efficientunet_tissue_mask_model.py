"""Flax EfficientNet-B0 U-Net tissue-mask model.

Reference: ``models/architecture/efficientunet_tissue_mask_model.py``
(:746-934): EfficientNet-B0 encoder, UNet decoder, sigmoid output with
0.95 threshold postprocessing.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tiatoolbox_tpu.models.architecture.efficientnet import EfficientNetEncoder
from tiatoolbox_tpu.models.models_abc import ModelABC


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
        return x


class _EfficientUNet(nn.Module):
    num_output_channels: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        feats = EfficientNetEncoder(variant="efficientnet_b0", name="encoder")(x)
        # feats: strides [2, 4, 8, 16, 32]
        h = feats[-1]
        decoder_channels = (256, 128, 64, 32)
        skips = [feats[3], feats[2], feats[1], feats[0]]
        for i, out_ch in enumerate(decoder_channels):
            h = _DecoderBlock(out_ch, name=f"dec{i}")(h, skips[i])
        # final 2x up to full resolution
        h = _DecoderBlock(16, name="dec_final")(h, None)
        return nn.Conv(self.num_output_channels, (1, 1), name="head")(h)


class EfficientUNetTissueMaskModel(ModelABC):
    """Tissue-mask segmentation: EfficientNet-B0 U-Net, sigmoid ≥ 0.95.

    Args:
        num_output_channels: Output channels (1 = binary mask).
        threshold: Probability threshold for the mask (reference 0.95).
    """

    def __init__(
        self,
        num_output_channels: int = 1,
        threshold: float = 0.95,
        **kwargs,
    ) -> None:
        module = _EfficientUNet(num_output_channels=num_output_channels)
        super().__init__(module, **kwargs)
        self.threshold = threshold
        self._jitted_infer = None

    def init(self, rng_key=None, input_shape=(1, 64, 64, 3)) -> None:
        super().init(rng_key, input_shape)

    @staticmethod
    def preproc(image: np.ndarray) -> np.ndarray:
        return (image.astype(np.float32)) / 255.0

    def postproc(self, image: np.ndarray) -> np.ndarray:
        """Binary mask: probability >= threshold."""
        probs = np.asarray(image)
        if probs.shape[-1] == 1:
            probs = probs[..., 0]
        return (probs >= self.threshold).astype(np.uint8)

    @staticmethod
    def infer_batch(
        model: "EfficientUNetTissueMaskModel", batch_data, device: str | None = None  # noqa: ARG004
    ):
        batch = jnp.asarray(batch_data).astype(model.compute_dtype)
        if model._jitted_infer is None:
            module = model.module

            @jax.jit
            def _run(variables, x):
                logits = module.apply(variables, x)
                return jax.nn.sigmoid(logits.astype(jnp.float32))

            model._jitted_infer = _run
        return np.asarray(model._jitted_infer(model.variables, batch))
