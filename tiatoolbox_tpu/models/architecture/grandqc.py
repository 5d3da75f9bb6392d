"""Flax GrandQC tissue-detection / artifact-QC model.

Reference: ``models/architecture/grandqc.py:441-638`` — UNet++ decoder
over an EfficientNet-B0 encoder, softmax head. Used for tissue
detection quality control (Weng et al., Nat. Comms 2024).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tiatoolbox_tpu.models.architecture.efficientnet import EfficientNetEncoder
from tiatoolbox_tpu.models.models_abc import ModelABC


class _ConvBNReLU(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from tiatoolbox_tpu.models.architecture.efficientnet import _BN

        x = nn.Conv(self.out_ch, (3, 3), padding="SAME", use_bias=False)(x)
        x = _BN()(x)
        return nn.relu(x)


class _UnetPlusPlusDecoder(nn.Module):
    """Dense-skip UNet++ decoder over 5 encoder stages."""

    decoder_channels: tuple = (256, 128, 64, 32, 16)

    @nn.compact
    def __call__(self, feats: list[jnp.ndarray]) -> jnp.ndarray:
        # feats: [s2, s4, s8, s16, s32] (shallow → deep)
        def up2(x):
            n, h, w, c = x.shape
            return jax.image.resize(x, (n, h * 2, w * 2, c), method="nearest")

        # X[i][j] grid per UNet++: i = depth level, j = dense step.
        x = {(i, 0): feats[i] for i in range(5)}
        for j in range(1, 5):
            for i in range(5 - j):
                ups = up2(x[(i + 1, j - 1)])
                skips = [x[(i, k)] for k in range(j)]
                cat = jnp.concatenate([ups, *skips], axis=-1)
                out_ch = self.decoder_channels[4 - (i + j)] if (i + j) < 5 else 16
                x[(i, j)] = _ConvBNReLU(out_ch, name=f"x_{i}_{j}")(cat)
        # final up to full resolution
        final = up2(x[(0, 4)])
        return _ConvBNReLU(self.decoder_channels[-1], name="final")(final)


class _GrandQCNet(nn.Module):
    num_output_channels: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        feats = EfficientNetEncoder(variant="efficientnet_b0", name="encoder")(x)
        decoded = _UnetPlusPlusDecoder(name="decoder")(feats)
        return nn.Conv(
            self.num_output_channels, (3, 3), padding="SAME", name="seg_head"
        )(decoded)


_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class GrandQCModel(ModelABC):
    """GrandQC tissue-detection model (UNet++ on EfficientNet-B0).

    Args:
        num_output_channels: Output classes (2: tissue/background).
        class_dict: Optional class-name mapping.
    """

    def __init__(
        self, num_output_channels: int = 2, class_dict: dict | None = None, **kwargs
    ) -> None:
        module = _GrandQCNet(num_output_channels=num_output_channels)
        super().__init__(module, **kwargs)
        self.num_output_channels = num_output_channels
        self.class_dict = class_dict
        self.name = "unetplusplus-efficientnetb0"
        self._jitted_infer = None

    def init(self, rng_key=None, input_shape=(1, 64, 64, 3)) -> None:
        super().init(rng_key, input_shape)

    @staticmethod
    def preproc(image: np.ndarray) -> np.ndarray:
        """ImageNet normalization (reference uses JPEG+imagenet norm)."""
        img = image.astype(np.float32) / 255.0
        return (img - _IMAGENET_MEAN) / _IMAGENET_STD

    @staticmethod
    def postproc(image: np.ndarray) -> np.ndarray:
        """Tissue mask via argmin over channel probabilities."""
        return np.argmin(image, axis=-1)

    @staticmethod
    def infer_batch(model: "GrandQCModel", batch_data, device: str | None = None):  # noqa: ARG004
        batch = jnp.asarray(batch_data).astype(model.compute_dtype)
        if model._jitted_infer is None:
            module = model.module

            @jax.jit
            def _run(variables, x):
                logits = module.apply(variables, x)
                return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

            model._jitted_infer = _run
        return np.asarray(model._jitted_infer(model.variables, batch))
