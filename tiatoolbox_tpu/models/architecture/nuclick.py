"""Flax NuClick (reference ``models/architecture/nuclick.py:348-689``).

Interactive nucleus segmentation: RGB patch + inclusion/exclusion click
maps (5 input channels) → single-channel mask. U-Net-like trunk with
multiscale dilated conv blocks and conv1+conv2 residual blocks.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from scipy import ndimage

from tiatoolbox_tpu import logger
from tiatoolbox_tpu.models.models_abc import ModelABC


class _BN(nn.Module):
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(features)).value
        var = self.variable("batch_stats", "var", lambda: jnp.ones(features)).value
        mul = scale / jnp.sqrt(var + self.epsilon)
        add = bias - mean * mul
        return x * jnp.asarray(mul, x.dtype) + jnp.asarray(add, x.dtype)


class ConvBnRelu(nn.Module):
    """Conv + optional inference-BN + optional ReLU (SAME padding)."""

    out_ch: int
    kernel: int = 3
    dilation: int = 1
    activation: str | None = "relu"
    use_bias: bool = False
    do_batchnorm: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(
            self.out_ch,
            (self.kernel, self.kernel),
            padding="SAME",
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=self.use_bias,
            name="conv",
        )(x)
        if self.do_batchnorm:
            x = _BN(name="bn")(x)
        if self.activation == "relu":
            x = nn.relu(x)
        return x


class MultiscaleConvBlock(nn.Module):
    """Four parallel dilated convs concatenated on channels."""

    out_ch: int
    kernel_sizes: tuple
    dilation_rates: tuple

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        branches = [
            ConvBnRelu(
                self.out_ch,
                kernel=self.kernel_sizes[i],
                dilation=self.dilation_rates[i],
                name=f"b{i}",
            )(x)
            for i in range(4)
        ]
        return jnp.concatenate(branches, axis=-1)


class ResidualConv(nn.Module):
    """conv-bn, conv-bn, add(first, second), relu."""

    out_ch: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        conv1 = ConvBnRelu(self.out_ch, activation=None, name="c1")(x)
        conv2 = ConvBnRelu(self.out_ch, activation=None, name="c2")(conv1)
        return nn.relu(conv1 + conv2)


class _NuClickNet(nn.Module):
    num_input_channels: int = 5
    num_output_channels: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        def res_seq(x, chs, name):
            for i, ch in enumerate(chs):
                x = ResidualConv(ch, name=f"{name}_{i}")(x)
            return x

        def pool(x):
            return nn.max_pool(x, (2, 2), strides=(2, 2))

        def up(x, ch, name):
            return nn.ConvTranspose(
                ch, (2, 2), strides=(2, 2), padding="VALID", name=name
            )(x)

        conv1 = ConvBnRelu(64, kernel=7, name="cb1_0")(x)
        conv1 = ConvBnRelu(32, kernel=5, name="cb1_1")(conv1)
        conv1 = ConvBnRelu(32, kernel=3, name="cb1_2")(conv1)
        pool1 = pool(conv1)

        conv2 = res_seq(pool1, [64, 64], "rb1")
        pool2 = pool(conv2)

        conv3 = ResidualConv(128, name="rb2")(pool2)
        conv3 = MultiscaleConvBlock(32, (3, 3, 5, 5), (1, 3, 3, 6), name="ms1")(conv3)
        conv3 = ResidualConv(128, name="rb3")(conv3)
        pool3 = pool(conv3)

        conv4 = res_seq(pool3, [256, 256, 256], "rb4")
        pool4 = pool(conv4)

        conv5 = res_seq(pool4, [512, 512, 512], "rb5")
        pool5 = pool(conv5)

        conv51 = res_seq(pool5, [1024, 1024], "rb6")

        up61 = jnp.concatenate([up(conv51, 512, "ct1"), conv5], axis=-1)
        conv61 = res_seq(up61, [512, 256], "rb7")

        up6 = jnp.concatenate([up(conv61, 256, "ct2"), conv4], axis=-1)
        conv6 = ResidualConv(256, name="rb8")(up6)
        conv6 = MultiscaleConvBlock(64, (3, 3, 5, 5), (1, 3, 2, 3), name="ms2")(conv6)
        conv6 = ResidualConv(256, name="rb9")(conv6)

        up7 = jnp.concatenate([up(conv6, 128, "ct3"), conv3], axis=-1)
        conv7 = res_seq(up7, [128, 128], "rb10")

        up8 = jnp.concatenate([up(conv7, 64, "ct4"), conv2], axis=-1)
        conv8 = ResidualConv(64, name="rb11")(up8)
        conv8 = MultiscaleConvBlock(16, (3, 3, 5, 7), (1, 3, 2, 6), name="ms3")(conv8)
        conv8 = ResidualConv(64, name="rb12")(conv8)

        up9 = jnp.concatenate([up(conv8, 32, "ct5"), conv1], axis=-1)
        conv9 = ConvBnRelu(64, name="cb2_0")(up9)
        conv9 = ConvBnRelu(32, name="cb2_1")(conv9)
        conv9 = ConvBnRelu(32, name="cb2_2")(conv9)

        return ConvBnRelu(
            self.num_output_channels,
            kernel=1,
            activation=None,
            use_bias=True,
            do_batchnorm=False,
            name="cb3",
        )(conv9)


class NuClick(ModelABC):
    """Interactive nucleus segmentation (5-channel click-guided input)."""

    def __init__(
        self, num_input_channels: int = 5, num_output_channels: int = 1, **kwargs
    ) -> None:
        module = _NuClickNet(
            num_input_channels=num_input_channels,
            num_output_channels=num_output_channels,
        )
        super().__init__(module, **kwargs)
        self.net_name = "NuClick"
        self.n_channels = num_input_channels
        self.n_classes = num_output_channels
        self._jitted_infer = None

    def init(self, rng_key=None, input_shape=None) -> None:
        if input_shape is None:
            input_shape = (1, 128, 128, self.n_channels)
        super().init(rng_key, input_shape)

    @staticmethod
    def infer_batch(model: "NuClick", batch_data, device: str | None = None):  # noqa: ARG004
        """float NHWC (5ch) batch → sigmoid mask probabilities [N, H, W]."""
        batch = jnp.asarray(batch_data).astype(model.compute_dtype)
        if model._jitted_infer is None:
            module = model.module

            def _run(variables, x):
                logits = module.apply(variables, x)
                return jax.nn.sigmoid(logits.astype(jnp.float32))[..., 0]

            model._jitted_infer = model.bind_jit(_run)
        return np.asarray(model._jitted_infer(batch))

    @staticmethod
    def postproc(
        preds: np.ndarray,
        thresh: float = 0.33,
        min_size: int = 10,
        min_hole_size: int = 30,
        nuc_points: np.ndarray = None,
        *,
        do_reconstruction: bool = False,
    ) -> np.ndarray:
        """Threshold + small-object/hole removal (+ click reconstruction)."""
        from tiatoolbox_tpu.models.architecture.hovernet import (
            _remove_small_objects,
        )

        preds = np.asarray(preds)
        masks = preds > thresh
        out = np.zeros_like(masks, dtype=bool)
        for i in range(len(masks)):
            labelled = ndimage.label(masks[i])[0]
            labelled = _remove_small_objects(labelled, min_size=min_size)
            mask = labelled > 0
            # fill small holes
            holes = ndimage.label(~mask)[0]
            counts = np.bincount(holes.ravel())
            small_holes = (counts < min_hole_size)
            small_holes[0] = False
            # only interior holes (not touching border)
            border_labels = np.unique(
                np.concatenate(
                    [holes[0], holes[-1], holes[:, 0], holes[:, -1]]
                )
            )
            small_holes[border_labels] = False
            mask = mask | small_holes[holes]
            if do_reconstruction and nuc_points is not None:
                marker = nuc_points[i] > 0
                if np.any(mask[marker]):
                    # geodesic reconstruction: keep components touching a click
                    comp = ndimage.label(mask)[0]
                    keep = np.unique(comp[marker])
                    keep = keep[keep > 0]
                    mask = np.isin(comp, keep)
                else:
                    logger.warning(
                        "No nuclei found at the click point; returning raw mask.",
                    )
            out[i] = mask
        return out
