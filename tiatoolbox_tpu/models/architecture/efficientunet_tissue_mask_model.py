"""Flax EfficientNet-B0 U-Net tissue-mask model.

Reference: ``models/architecture/efficientunet_tissue_mask_model.py``
(Conv2dStaticSamePadding :64, MBConvBlock :194, EfficientNetEncoder
:351, UnetDecoder :621, SegmentationHead :694, model :746-934).

Topology matched exactly so converted reference checkpoints reproduce
the torch forward:

- Encoder: EfficientNet-B0 MBConv trunk (``efficientnet.py`` here);
  the reference's ``Conv2dStaticSamePadding`` computes the identical
  asymmetric padding to XLA's ``SAME`` (pad_total = (ceil(in/s)-1)*s +
  k_eff - in, low = total//2), so plain ``padding="SAME"`` convs map
  one-to-one. Per-stage features at strides 2/4/8/16/32 with channels
  32/24/40/112/320 (reference ``forward`` :426-476 capture points).
- Decoder: five blocks (in, skip, out) = (320,112,256), (256,40,128),
  (128,24,64), (64,32,32), (32,0,16); each = nearest 2x upsample,
  concat skip, two [3x3 conv(no bias) + BN(eps 1e-5) + ReLU]
  (reference ``UnetDecoder`` :650-666, ``Conv2dReLU`` :502-530).
- Head: single 3x3 conv with bias (reference :713-743).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tiatoolbox_tpu.models.architecture.efficientnet import _BN, EfficientNetEncoder
from tiatoolbox_tpu.models.models_abc import ModelABC

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406])
IMAGENET_STD = np.array([0.229, 0.224, 0.225])


def _upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    """Exact 2x nearest upsample (torch ``interpolate(mode="nearest")``)."""
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class _DecoderBlock(nn.Module):
    """Upsample + skip-concat + two (conv-BN-ReLU) blocks, BN eps 1e-5."""

    out_ch: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray | None) -> jnp.ndarray:
        x = _upsample2x_nearest(x)
        if skip is not None:
            x = jnp.concatenate([x, skip], axis=-1)
        for i in range(2):
            x = nn.Conv(
                self.out_ch, (3, 3), padding="SAME", use_bias=False, name=f"conv{i}"
            )(x)
            x = _BN(epsilon=1e-5, name=f"bn{i}")(x)
            x = nn.relu(x)
        return x


class _EfficientUNet(nn.Module):
    num_output_channels: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        feats = EfficientNetEncoder(variant="efficientnet_b0", name="encoder")(x)
        # feats channels [32, 24, 40, 112, 320] at strides [2, 4, 8, 16, 32]
        h = feats[4]
        decoder_channels = (256, 128, 64, 32, 16)
        skips = [feats[3], feats[2], feats[1], feats[0], None]
        for i, out_ch in enumerate(decoder_channels):
            h = _DecoderBlock(out_ch, name=f"dec{i}")(h, skips[i])
        return nn.Conv(
            self.num_output_channels, (3, 3), padding="SAME", name="head"
        )(h)


class EfficientUNetTissueMaskModel(ModelABC):
    """Tissue-mask segmentation: EfficientNet-B0 U-Net, sigmoid >= 0.95.

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
        """ImageNet normalization (reference :831-853)."""
        return ((image / 255.0 - IMAGENET_MEAN) / IMAGENET_STD).astype(np.float32)

    def postproc(self, image: np.ndarray) -> np.ndarray:
        """Threshold + morphological close/open (reference :855-888)."""
        import cv2

        probs = np.asarray(image)
        binary = (probs[..., 0] >= self.threshold).astype(np.uint8)
        kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (31, 31))

        def clean(mask_2d: np.ndarray) -> np.ndarray:
            mask_2d = cv2.morphologyEx(mask_2d, cv2.MORPH_CLOSE, kernel)
            return cv2.morphologyEx(mask_2d, cv2.MORPH_OPEN, kernel)

        if binary.ndim == 3:  # batched (N, H, W)
            return np.stack([clean(m) for m in binary])
        return clean(binary)

    @staticmethod
    def infer_batch(
        model: "EfficientUNetTissueMaskModel", batch_data, device: str | None = None  # noqa: ARG004
    ):
        batch = jnp.asarray(batch_data).astype(model.compute_dtype)
        if model._jitted_infer is None:
            module = model.module

            def _run(variables, x):
                logits = module.apply(variables, x)
                return jax.nn.sigmoid(logits.astype(jnp.float32))

            model._jitted_infer = model.bind_jit(_run)
        return np.asarray(model._jitted_infer(batch))
