"""Flax KongNet (reference ``models/architecture/kongnet.py:508-944``).

Multi-head detection/segmentation: a shared EfficientNetV2-L encoder
feeds ``num_heads`` independent U-Net decoders with SCSE attention,
each with a 1x1 segmentation head; outputs concatenate on channels.
Inference selects ``target_channels`` and applies sigmoid; postproc is
peak local-max + NMS.

Topology matched exactly so converted reference checkpoints reproduce
the torch forward:

- Encoder: timm ``tf_efficientnetv2_l`` (reference
  ``TimmEncoderFixed`` :106-223) — TF-SAME padding, BN eps 1e-3, SiLU
  (``EfficientNetV2Encoder`` here); features [32,64,96,224,640] at
  strides [2,4,8,16,32].
- Decoder (``KongNetDecoder`` :418-505): center SCSE on the deepest
  feature, then five ``DecoderBlock``s (:279-372) = SubPixelUpsample
  (1x1 conv to C*4 + BN + SiLU, pixel-shuffle 2x, 3x3 conv + BN +
  SiLU) -> concat skip -> SCSE (only when a skip exists) -> two
  [3x3 conv + BN + SiLU] -> SCSE. Conv blocks are torchvision
  ``Conv2dNormActivation`` (conv no-bias + BN eps 1e-5 + SiLU).
- SCSE (reference ``utils.py:353-383``): channel SE via two 1x1 convs
  on the pooled map (reduction 16, ReLU, sigmoid) plus spatial SE via
  a 1x1 conv; ``x*cSE + x*sSE``.
- Heads: 1x1 conv with bias per head (``SegmentationHead``).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tiatoolbox_tpu.models.architecture.efficientnet import (
    _BN,
    EfficientNetEncoder,
    EfficientNetV2Encoder,
)
from tiatoolbox_tpu.models.architecture.utils import (
    nms_on_detection_maps,
    peak_detection_map_overlap,
)
from tiatoolbox_tpu.models.models_abc import ModelABC

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406])
_IMAGENET_STD = np.array([0.229, 0.224, 0.225])


class SCSEAttention(nn.Module):
    """Concurrent spatial + channel squeeze-excite (reduction 16)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ch = x.shape[-1]
        cse = jnp.mean(x, axis=(1, 2), keepdims=True)
        cse = nn.Conv(max(ch // 16, 1), (1, 1), name="cse_reduce")(cse)
        cse = nn.relu(cse)
        cse = nn.Conv(ch, (1, 1), name="cse_expand")(cse)
        sse = nn.Conv(1, (1, 1), name="sse")(x)
        return x * nn.sigmoid(cse) + x * nn.sigmoid(sse)


def _pixel_shuffle2(x: jnp.ndarray) -> jnp.ndarray:
    """torch ``PixelShuffle(2)`` in NHWC: channel c*4+i*2+j -> (2h+i, 2w+j)."""
    n, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(n, h, w, c, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(n, h * 2, w * 2, c)


class _ConvBnSiLU(nn.Module):
    """torchvision Conv2dNormActivation: conv(no bias) + BN(1e-5) + SiLU."""

    out_ch: int
    kernel: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(
            self.out_ch,
            (self.kernel, self.kernel),
            padding="SAME",
            use_bias=False,
            name="conv",
        )(x)
        x = _BN(epsilon=1e-5, name="bn")(x)
        return nn.silu(x)


class _DecoderBlock(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray | None) -> jnp.ndarray:
        in_ch = x.shape[-1]
        # SubPixelUpsample(in, in): 1x1 -> in*4, shuffle, 3x3 -> in
        x = _ConvBnSiLU(in_ch * 4, kernel=1, name="up_conv1")(x)
        x = _pixel_shuffle2(x)
        x = _ConvBnSiLU(in_ch, kernel=3, name="up_conv2")(x)
        if skip is not None:
            x = jnp.concatenate([x, skip], axis=-1)
            x = SCSEAttention(name="att1")(x)
        x = _ConvBnSiLU(self.out_ch, kernel=3, name="conv1")(x)
        x = _ConvBnSiLU(self.out_ch, kernel=3, name="conv2")(x)
        return SCSEAttention(name="att2")(x)


class _KongNetDecoder(nn.Module):
    decoder_channels: tuple = (256, 128, 64, 32, 16)

    @nn.compact
    def __call__(self, feats: list[jnp.ndarray]) -> jnp.ndarray:
        # feats strides [2, 4, 8, 16, 32]; centre SCSE on the deepest
        h = SCSEAttention(name="center")(feats[-1])
        skips = [feats[3], feats[2], feats[1], feats[0], None]
        for i, out_ch in enumerate(self.decoder_channels):
            h = _DecoderBlock(out_ch, name=f"block{i}")(h, skips[i])
        return h


class _KongNetNet(nn.Module):
    num_heads: int = 3
    num_channels_per_head: tuple = (3, 3, 3)
    variant: str = "efficientnetv2_l"
    wide_decoder: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.variant.startswith("efficientnetv2"):
            feats = EfficientNetV2Encoder(variant=self.variant, name="encoder")(x)
        else:  # v1 family fallback (non-reference checkpoints)
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
        variant: Encoder variant (reference: EfficientNetV2-L).
    """

    def __init__(
        self,
        num_heads: int,
        num_channels_per_head: list[int],
        target_channels: list[int],
        min_distance: int,
        threshold_abs: float,
        tile_shape=(2048, 2048),
        variant: str = "efficientnetv2_l",
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
        """ImageNet normalization (reference ``kongnet.py:768-792``)."""
        return ((image / 255.0 - _IMAGENET_MEAN) / _IMAGENET_STD).astype(np.float32)

    @staticmethod
    def infer_batch(model: "KongNet", batch_data, device: str | None = None):  # noqa: ARG004
        batch = jnp.asarray(batch_data).astype(model.compute_dtype)
        if model._jitted_infer is None:
            module = model.module
            target = tuple(model.target_channels)

            def _run(variables, x):
                logits = module.apply(variables, x)
                sel = logits[..., jnp.array(target)]
                return jax.nn.sigmoid(sel.astype(jnp.float32))

            model._jitted_infer = model.bind_jit(_run)
        return np.asarray(model._jitted_infer(batch))

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
