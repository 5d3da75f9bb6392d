"""Flax U-Net variants (reference ``models/architecture/unet.py:24-476``).

Encoder options: "resnet50" (Bottleneck ResNet returning per-stage
features; conv1 has bias when input channels != 3, matching the
reference quirk) or "unet" (double-conv + avg-pool blocks). Decoder:
1x1 conv on the deepest feature, nearest-2x upsample, add/concat skip,
conv blocks (pre-activation for the resnet encoder), 1x1 classifier.

``infer_batch`` fuses forward → softmax → 2x bilinear upsample →
centre crop into one device program.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tiatoolbox_tpu.models.architecture.resnet import Bottleneck, _BN, conv1x1
from tiatoolbox_tpu.models.architecture.utils import (
    argmax_last_axis,
    centre_crop,
    upsample2x,
)
from tiatoolbox_tpu.models.models_abc import ModelABC


class ResNetEncoder(nn.Module):
    """Bottleneck ResNet encoder returning per-downsample features."""

    layers: tuple = (3, 4, 6, 3)
    num_input_channels: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        # reference quirk: replacement conv1 (in_ch != 3) keeps bias
        x = nn.Conv(
            64,
            (7, 7),
            strides=(2, 2),
            padding=[(3, 3), (3, 3)],
            use_bias=self.num_input_channels != 3,
            name="conv1",
        )(x)
        x = _BN(name="bn1")(x)
        x0 = x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        feats = [x0]
        in_features = 64
        for stage, n_blocks in enumerate(self.layers):
            planes = 64 * (2**stage)
            out_features = planes * 4
            for b in range(n_blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                needs_ds = b == 0 and (stride != 1 or in_features != out_features)
                x = Bottleneck(
                    planes,
                    out_features,
                    stride=stride,
                    downsample=needs_ds,
                    name=f"layer{stage + 1}_{b}",
                )(x)
                in_features = out_features
            feats.append(x)
        return feats


class UnetEncoder(nn.Module):
    """Basic double-conv U-Net encoder returning per-level features."""

    num_input_channels: int = 3
    layer_output_channels: tuple = (64, 128, 256, 512, 1024)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        feats = []
        for level, out_ch in enumerate(self.layer_output_channels):
            for i in range(2):
                x = nn.Conv(
                    out_ch,
                    (3, 3),
                    padding=[(1, 1), (1, 1)],
                    use_bias=False,
                    name=f"block{level}_conv{i}",
                )(x)
                x = _BN(name=f"block{level}_bn{i}")(x)
                x = nn.relu(x)
            feats.append(x)
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        return feats


class _DecoderBlock(nn.Module):
    """Conv block of the decoder; pre-activation style for resnet encoder."""

    kernels: tuple
    out_ch: int
    pre_activation: bool

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, ksize in enumerate(self.kernels):
            pad = int((ksize - 1) // 2)
            if self.pre_activation:
                x = _BN(name=f"bn{i}")(x)
                x = nn.relu(x)
                x = nn.Conv(
                    self.out_ch,
                    (ksize, ksize),
                    padding=[(pad, pad), (pad, pad)],
                    use_bias=False,
                    name=f"conv{i}",
                )(x)
            else:
                x = nn.Conv(
                    self.out_ch,
                    (ksize, ksize),
                    padding=[(pad, pad), (pad, pad)],
                    use_bias=False,
                    name=f"conv{i}",
                )(x)
                x = _BN(name=f"bn{i}")(x)
                x = nn.relu(x)
        return x


class _UNet(nn.Module):
    """Full U-Net graph."""

    num_input_channels: int = 2
    num_output_channels: int = 2
    encoder: str = "resnet50"
    encoder_levels: tuple = (64, 128, 256, 512, 1024)
    decoder_block: tuple = (3, 3)
    skip_type: str = "add"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x / 255.0
        if self.encoder == "resnet50":
            feats = ResNetEncoder(
                num_input_channels=self.num_input_channels, name="backbone"
            )(x)
            pre_activation = True
        else:
            feats = UnetEncoder(
                num_input_channels=self.num_input_channels,
                layer_output_channels=tuple(self.encoder_levels),
                name="backbone",
            )(x)
            pre_activation = False

        down_ch = [f.shape[-1] for f in feats][::-1]
        x = conv1x1(down_ch[1], name="conv1x1")(feats[-1])
        skips = feats[:-1]
        for idx in range(1, len(skips) + 1):
            y = skips[-idx]
            x = upsample2x(x)
            if self.skip_type == "add":
                x = x + y
            else:
                x = jnp.concatenate([x, y], axis=-1)
            next_ch = down_ch[idx + 1] if idx + 1 < len(down_ch) else down_ch[idx]
            x = _DecoderBlock(
                tuple(self.decoder_block),
                next_ch,
                pre_activation,
                name=f"up{idx - 1}",
            )(x)
        return nn.Conv(self.num_output_channels, (1, 1), use_bias=True, name="clf")(x)


class UNetModel(ModelABC):
    """Generic U-Net semantic segmentation model.

    Args:
        num_input_channels: Input channels.
        num_output_channels: Output classes.
        encoder: "resnet50" or "unet".
        encoder_levels: Channels per level (unet encoder).
        decoder_block: Kernel sizes per decoder block.
        skip_type: "add" or "concat".
    """

    def __init__(
        self,
        num_input_channels: int = 2,
        num_output_channels: int = 2,
        encoder: str = "resnet50",
        encoder_levels=None,
        decoder_block=None,
        skip_type: str = "add",
        **kwargs,
    ) -> None:
        if encoder.lower() not in ("resnet50", "unet"):
            msg = f"Unknown encoder `{encoder}`"
            raise ValueError(msg)
        if skip_type.lower() not in ("add", "concat"):
            msg = f"Unknown type of skip connection: `{skip_type}`"
            raise ValueError(msg)
        module = _UNet(
            num_input_channels=num_input_channels,
            num_output_channels=num_output_channels,
            encoder=encoder.lower(),
            encoder_levels=tuple(encoder_levels or (64, 128, 256, 512, 1024)),
            decoder_block=tuple(decoder_block or (3, 3)),
            skip_type=skip_type.lower(),
        )
        super().__init__(module, **kwargs)
        self.num_input_channels = num_input_channels
        self.num_output_channels = num_output_channels

    def init(self, rng_key=None, input_shape=None) -> None:
        if input_shape is None:
            input_shape = (1, 64, 64, self.num_input_channels)
        super().init(rng_key, input_shape)

    @staticmethod
    def postproc(image: np.ndarray) -> np.ndarray:
        return argmax_last_axis(image=image)

    @staticmethod
    def infer_batch(model: "UNetModel", batch_data, device: str | None = None):  # noqa: ARG004
        """uint8 NHWC → probabilities at half-input resolution, cropped.

        Mirrors reference ``unet.py:421-469``: softmax → 2x bilinear
        upsample → centre crop to half the input size — all fused into
        the jitted program.
        """
        return np.asarray(
            UNetModel.infer_batch_device(model, batch_data, device)
        )

    @staticmethod
    def infer_batch_device(
        model: "UNetModel", batch_data, device: str | None = None  # noqa: ARG004
    ):
        """As :meth:`infer_batch` but returns the UNFETCHED device array
        (engines stitch on device / control the fetch dtype)."""
        batch = jnp.asarray(batch_data).astype(model.compute_dtype)
        if model._jitted_infer is None:
            module = model.module

            def _run(variables, x):
                logits = module.apply(variables, x)
                probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
                n, h, w, c = probs.shape
                probs = jax.image.resize(
                    probs, (n, h * 2, w * 2, c), method="bilinear"
                )
                crop = (x.shape[1] // 2, x.shape[2] // 2)
                return centre_crop(
                    probs,
                    (probs.shape[1] - crop[0], probs.shape[2] - crop[1]),
                )

            model._jitted_infer = model.bind_jit(_run)
        return model._jitted_infer(batch)

    _jitted_infer = None
