"""Flax ResNet family, torchvision-topology-compatible.

NHWC layout throughout (TPU-native; channels in the 128-lane minor
dimension). Block structure, strides, and BN placement match
torchvision's resnet so converted torch weights drop in 1:1
(reference backbone registry: ``models/architecture/vanilla.py:21-40``).
BatchNorm always runs with running statistics (inference framework).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class _BN(nn.Module):
    """Inference batch norm: y = (x - mean) / sqrt(var+eps) * scale + bias."""

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


def conv3x3(features: int, stride: int = 1, groups: int = 1, name=None) -> nn.Conv:
    """3x3 conv, pad 1, no bias (torchvision conv3x3)."""
    return nn.Conv(
        features,
        (3, 3),
        strides=(stride, stride),
        padding=[(1, 1), (1, 1)],
        use_bias=False,
        feature_group_count=groups,
        name=name,
    )


def conv1x1(features: int, stride: int = 1, name=None) -> nn.Conv:
    """1x1 conv, no bias (torchvision conv1x1)."""
    return nn.Conv(
        features,
        (1, 1),
        strides=(stride, stride),
        padding="VALID",
        use_bias=False,
        name=name,
    )


class BasicBlock(nn.Module):
    """torchvision BasicBlock: 3x3(stride) → 3x3, residual add."""

    features: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        identity = x
        out = conv3x3(self.features, self.stride, name="conv1")(x)
        out = _BN(name="bn1")(out)
        out = nn.relu(out)
        out = conv3x3(self.features, name="conv2")(out)
        out = _BN(name="bn2")(out)
        if self.downsample:
            identity = conv1x1(self.features, self.stride, name="downsample_conv")(x)
            identity = _BN(name="downsample_bn")(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    """torchvision Bottleneck (v1.5: stride on the 3x3 conv)."""

    features: int  # width of the 3x3 conv
    out_features: int  # expansion * planes
    stride: int = 1
    groups: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        identity = x
        out = conv1x1(self.features, name="conv1")(x)
        out = _BN(name="bn1")(out)
        out = nn.relu(out)
        out = conv3x3(self.features, self.stride, self.groups, name="conv2")(out)
        out = _BN(name="bn2")(out)
        out = nn.relu(out)
        out = conv1x1(self.out_features, name="conv3")(out)
        out = _BN(name="bn3")(out)
        if self.downsample:
            identity = conv1x1(self.out_features, self.stride, name="downsample_conv")(x)
            identity = _BN(name="downsample_bn")(identity)
        return nn.relu(out + identity)


class _S2DStem(nn.Module):
    """Space-to-depth ResNet stem: 7x7/s2 conv on 3 channels rewritten
    as a 4x4/s1 conv on 12 channels over 2x2 pixel blocks.

    The 7x7 stride-2 RGB conv leaves 125 of the MXU's 128 input lanes
    idle; folding a 2x2 space-to-depth into the input (and the
    matching zero-pad + reshape into the kernel, done on the fly from
    the SAME ``conv1/kernel`` parameter so checkpoints are untouched)
    quadruples stem lane utilisation. Numerically identical modulo
    fp reassociation. Requires even input H and W.
    """

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import jax

        n, h, w, c = x.shape
        k7 = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (7, 7, 3, 64),
        )
        # pad to 8x8 (top/left zero row+col), regroup to 4x4x12
        k8 = jnp.pad(k7, ((1, 0), (1, 0), (0, 0), (0, 0)))
        k4 = (
            k8.reshape(4, 2, 4, 2, 3, 64)
            .transpose(0, 2, 1, 3, 4, 5)
            .reshape(4, 4, 12, 64)
        ).astype(x.dtype)
        xs = (
            x.reshape(n, h // 2, 2, w // 2, 2, c)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(n, h // 2, w // 2, 4 * c)
        )
        return jax.lax.conv_general_dilated(
            xs, k4,
            window_strides=(1, 1),
            padding=((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class ResNet(nn.Module):
    """Generic torchvision-style ResNet feature extractor (NHWC).

    Args:
        layers: Blocks per stage, e.g. (2, 2, 2, 2) for resnet18.
        block: "basic" or "bottleneck".
        groups / width_per_group: ResNeXt / wide-ResNet knobs.
        stem: "conv" (torchvision 7x7/s2) or "s2d" (space-to-depth
            rewrite of the same weights; see ``_S2DStem``).
    """

    layers: Sequence[int] = (2, 2, 2, 2)
    block: str = "basic"
    groups: int = 1
    width_per_group: int = 64
    stem: str = "conv"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.stem == "s2d":
            x = _S2DStem(name="conv1")(x)
        else:
            x = nn.Conv(
                64,
                (7, 7),
                strides=(2, 2),
                padding=[(3, 3), (3, 3)],
                use_bias=False,
                name="conv1",
            )(x)
        x = _BN(name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        expansion = 1 if self.block == "basic" else 4
        in_features = 64
        for stage, n_blocks in enumerate(self.layers):
            planes = 64 * (2**stage)
            width = int(planes * (self.width_per_group / 64.0)) * self.groups
            out_features = planes * expansion
            for b in range(n_blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                needs_ds = b == 0 and (stride != 1 or in_features != out_features)
                name = f"layer{stage + 1}_{b}"
                if self.block == "basic":
                    x = BasicBlock(
                        planes, stride=stride, downsample=needs_ds, name=name
                    )(x)
                else:
                    x = Bottleneck(
                        width,
                        out_features,
                        stride=stride,
                        groups=self.groups,
                        downsample=needs_ds,
                        name=name,
                    )(x)
                in_features = out_features
        return x


RESNET_CONFIGS = {
    "resnet18": dict(layers=(2, 2, 2, 2), block="basic"),
    "resnet34": dict(layers=(3, 4, 6, 3), block="basic"),
    "resnet50": dict(layers=(3, 4, 6, 3), block="bottleneck"),
    "resnet101": dict(layers=(3, 4, 23, 3), block="bottleneck"),
    "resnet152": dict(layers=(3, 8, 36, 3), block="bottleneck"),
    "resnext50_32x4d": dict(
        layers=(3, 4, 6, 3), block="bottleneck", groups=32, width_per_group=4
    ),
    "resnext101_32x8d": dict(
        layers=(3, 4, 23, 3), block="bottleneck", groups=32, width_per_group=8
    ),
    "wide_resnet50_2": dict(
        layers=(3, 4, 6, 3), block="bottleneck", width_per_group=128
    ),
    "wide_resnet101_2": dict(
        layers=(3, 4, 23, 3), block="bottleneck", width_per_group=128
    ),
}

RESNET_FEATURES = {
    "resnet18": 512,
    "resnet34": 512,
    "resnet50": 2048,
    "resnet101": 2048,
    "resnet152": 2048,
    "resnext50_32x4d": 2048,
    "resnext101_32x8d": 2048,
    "wide_resnet50_2": 2048,
    "wide_resnet101_2": 2048,
}
