"""Flax GrandQC tissue-detection / artifact-QC model.

Reference: ``models/architecture/grandqc.py:441-638`` — UNet++ decoder
over a timm-style EfficientNet-B0 encoder, softmax head. Used for
tissue detection quality control (Weng et al., Nat. Comms 2024).

Topology matched exactly so converted reference checkpoints reproduce
the torch forward:

- Encoder: timm-native EfficientNet-B0 (reference
  ``timm_efficientnet.py:313-474``): symmetric k//2 conv padding and
  BN eps 1e-5 (unlike the official-efficientnet variant's TF-SAME +
  1e-3); per-stage features [32@s2, 24@s4, 40@s8, 112@s16, 320@s32].
- Decoder: UNet++ dense grid (reference ``grandqc.py:292-432``) —
  blocks ``x_{depth}_{layer}``, each = nearest 2x upsample, concat
  dense skips, two [3x3 conv(no bias) + BN(eps 1e-5) + ReLU]
  (``DecoderBlock`` :138-236). decoder_channels (256,128,64,32,16).
- Head: single 3x3 conv with bias (``utils.py:246-300``).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tiatoolbox_tpu.models.architecture.efficientnet import _BN, EfficientNetEncoder
from tiatoolbox_tpu.models.models_abc import ModelABC


def _up2(x: jnp.ndarray) -> jnp.ndarray:
    """Exact 2x nearest upsample (torch ``interpolate(mode="nearest")``)."""
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class _DecoderBlock(nn.Module):
    """Upsample + dense-skip concat + two (conv-BN-ReLU), BN eps 1e-5."""

    out_ch: int

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, skips: list[jnp.ndarray] | None
    ) -> jnp.ndarray:
        x = _up2(x)
        if skips:
            x = jnp.concatenate([x, *skips], axis=-1)
        for i in range(2):
            x = nn.Conv(
                self.out_ch, (3, 3), padding="SAME", use_bias=False, name=f"conv{i}"
            )(x)
            x = _BN(epsilon=1e-5, name=f"bn{i}")(x)
            x = nn.relu(x)
        return x


class _UnetPlusPlusDecoder(nn.Module):
    """Dense-skip UNet++ decoder, reference ``grandqc.py:416-432`` wiring.

    ``feats`` shallow→deep [s2, s4, s8, s16, s32]; internally reversed
    so index 0 is the encoder head, matching the reference's
    ``x_{depth}_{layer}`` grid (depth = distance from the head).
    """

    decoder_channels: tuple = (256, 128, 64, 32, 16)

    @nn.compact
    def __call__(self, feats: list[jnp.ndarray]) -> jnp.ndarray:
        features = feats[::-1]  # [320, 112, 40, 24, 32]
        out_channels = self.decoder_channels
        # skip_channels per layer follow the reversed encoder channels.
        dense: dict = {}
        n = len(features) - 1  # grid depth (4)
        for layer in range(n):
            for d in range(n - layer):
                if layer == 0:
                    dense[(d, d)] = _DecoderBlock(
                        out_channels[0] if d == 0 else features[d + 1].shape[-1],
                        name=f"x_{d}_{d}",
                    )(features[d], [features[d + 1]])
                else:
                    li = d + layer
                    skips = [dense[(i, li)] for i in range(d + 1, li + 1)]
                    skips.append(features[li + 1])
                    dense[(d, li)] = _DecoderBlock(
                        out_channels[layer]
                        if d == 0
                        else features[li + 1].shape[-1],
                        name=f"x_{d}_{li}",
                    )(dense[(d, li - 1)], skips)
        return _DecoderBlock(out_channels[-1], name=f"x_0_{n}")(
            dense[(0, n - 1)], None
        )


class _GrandQCNet(nn.Module):
    num_output_channels: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        feats = EfficientNetEncoder(
            variant="efficientnet_b0",
            conv_padding="symmetric",
            bn_eps=1e-5,
            name="encoder",
        )(x)
        decoded = _UnetPlusPlusDecoder(name="decoder")(feats)
        return nn.Conv(
            self.num_output_channels, (3, 3), padding="SAME", name="head"
        )(decoded)


_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406])
_IMAGENET_STD = np.array([0.229, 0.224, 0.225])


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
        """JPEG-80 roundtrip + ImageNet normalization (reference :540-571)."""
        import cv2

        encode_param = [int(cv2.IMWRITE_JPEG_QUALITY), 80]
        _, compressed = cv2.imencode(".jpg", image, encode_param)
        image = np.asarray(cv2.imdecode(compressed, 1))
        return ((image / 255.0 - _IMAGENET_MEAN) / _IMAGENET_STD).astype(np.float32)

    @staticmethod
    def postproc(image: np.ndarray) -> np.ndarray:
        """Tissue mask via argmin over channel probabilities."""
        return np.argmin(image, axis=-1)

    @staticmethod
    def infer_batch(model: "GrandQCModel", batch_data, device: str | None = None):  # noqa: ARG004
        batch = jnp.asarray(batch_data).astype(model.compute_dtype)
        if model._jitted_infer is None:
            module = model.module

            def _run(variables, x):
                logits = module.apply(variables, x)
                return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

            model._jitted_infer = model.bind_jit(_run)
        return np.asarray(model._jitted_infer(batch))
