"""Flax EfficientNet (B0-B7) feature encoder.

Replaces the reference's timm EfficientNet shim
(``models/architecture/timm_efficientnet.py``): MBConv blocks with
squeeze-excite, SiLU, width/depth scaling; exposes per-stage features
for segmentation decoders (stride 2/4/8/16/32).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp

# (width_mult, depth_mult)
EFFICIENTNET_PARAMS = {
    "efficientnet_b0": (1.0, 1.0),
    "efficientnet_b1": (1.0, 1.1),
    "efficientnet_b2": (1.1, 1.2),
    "efficientnet_b3": (1.2, 1.4),
    "efficientnet_b4": (1.4, 1.8),
    "efficientnet_b5": (1.6, 2.2),
    "efficientnet_b6": (1.8, 2.6),
    "efficientnet_b7": (2.0, 3.1),
}

# (expand_ratio, channels, repeats, kernel, stride)
_B0_BLOCKS = (
    (1, 16, 1, 3, 1),
    (6, 24, 2, 3, 2),
    (6, 40, 2, 5, 2),
    (6, 80, 3, 3, 2),
    (6, 112, 3, 5, 1),
    (6, 192, 4, 5, 2),
    (6, 320, 1, 3, 1),
)


def _round_channels(channels: float, width_mult: float, divisor: int = 8) -> int:
    channels *= width_mult
    new = max(divisor, int(channels + divisor / 2) // divisor * divisor)
    if new < 0.9 * channels:
        new += divisor
    return int(new)


def _round_repeats(repeats: int, depth_mult: float) -> int:
    return int(math.ceil(depth_mult * repeats))


class _BN(nn.Module):
    epsilon: float = 1e-3  # torch efficientnet uses eps=1e-3

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


def _pad_spec(padding: str, kernel: int):
    """"SAME" (TF asymmetric, official efficientnet) or "symmetric"
    (static k//2 both sides, timm native efficientnet)."""
    if padding == "symmetric":
        p = kernel // 2
        return ((p, p), (p, p))
    return "SAME"


class MBConv(nn.Module):
    """Mobile inverted bottleneck with squeeze-excite."""

    out_ch: int
    expand_ratio: int
    kernel: int
    stride: int
    conv_padding: str = "SAME"
    bn_eps: float = 1e-3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        h = x
        expanded = in_ch * self.expand_ratio
        if self.expand_ratio != 1:
            h = nn.Conv(expanded, (1, 1), use_bias=False, name="expand_conv")(h)
            h = _BN(epsilon=self.bn_eps, name="expand_bn")(h)
            h = nn.silu(h)
        h = nn.Conv(
            expanded,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=_pad_spec(self.conv_padding, self.kernel),
            feature_group_count=expanded,
            use_bias=False,
            name="dw_conv",
        )(h)
        h = _BN(epsilon=self.bn_eps, name="dw_bn")(h)
        h = nn.silu(h)
        # squeeze-excite (ratio on pre-expansion channels)
        se_ch = max(1, in_ch // 4)
        se = jnp.mean(h, axis=(1, 2), keepdims=True)
        se = nn.Conv(se_ch, (1, 1), name="se_reduce")(se)
        se = nn.silu(se)
        se = nn.Conv(expanded, (1, 1), name="se_expand")(se)
        h = h * nn.sigmoid(se)
        h = nn.Conv(self.out_ch, (1, 1), use_bias=False, name="project_conv")(h)
        h = _BN(epsilon=self.bn_eps, name="project_bn")(h)
        if self.stride == 1 and in_ch == self.out_ch:
            h = h + x
        return h


class EfficientNetEncoder(nn.Module):
    """EfficientNet trunk returning per-stage features.

    Returns [stem(/2), s2(/4), s3(/8), s5(/16), s7(/32)] features.
    """

    variant: str = "efficientnet_b0"
    conv_padding: str = "SAME"  # "symmetric" = timm native efficientnet
    bn_eps: float = 1e-3  # timm native uses 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        width_mult, depth_mult = EFFICIENTNET_PARAMS[self.variant]
        stem_ch = _round_channels(32, width_mult)
        h = nn.Conv(
            stem_ch, (3, 3), strides=(2, 2),
            padding=_pad_spec(self.conv_padding, 3), use_bias=False,
            name="stem_conv",
        )(x)
        h = _BN(epsilon=self.bn_eps, name="stem_bn")(h)
        h = nn.silu(h)
        feats = [h]
        for stage_idx, (expand, ch, repeats, kernel, stride) in enumerate(_B0_BLOCKS):
            out_ch = _round_channels(ch, width_mult)
            n_repeats = _round_repeats(repeats, depth_mult)
            for block_idx in range(n_repeats):
                h = MBConv(
                    out_ch,
                    expand,
                    kernel,
                    stride if block_idx == 0 else 1,
                    conv_padding=self.conv_padding,
                    bn_eps=self.bn_eps,
                    name=f"s{stage_idx}_b{block_idx}",
                )(h)
            # capture features right before each downsample boundary
            if stage_idx in (1, 2, 4, 6):
                feats.append(h)
        return feats


class ConvBnAct(nn.Module):
    """timm "cn" block: conv + BN + SiLU, residual after activation."""

    out_ch: int
    kernel: int
    stride: int
    conv_padding: str = "SAME"
    bn_eps: float = 1e-3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        h = nn.Conv(
            self.out_ch,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=_pad_spec(self.conv_padding, self.kernel),
            use_bias=False,
            name="conv",
        )(x)
        h = _BN(epsilon=self.bn_eps, name="bn")(h)
        h = nn.silu(h)
        if self.stride == 1 and in_ch == self.out_ch:
            h = h + x
        return h


class FusedMBConv(nn.Module):
    """timm EdgeResidual ("er"): fused expand conv + 1x1 project, no SE."""

    out_ch: int
    expand_ratio: int
    kernel: int
    stride: int
    conv_padding: str = "SAME"
    bn_eps: float = 1e-3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        h = nn.Conv(
            in_ch * self.expand_ratio,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=_pad_spec(self.conv_padding, self.kernel),
            use_bias=False,
            name="expand_conv",
        )(x)
        h = _BN(epsilon=self.bn_eps, name="expand_bn")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (1, 1), use_bias=False, name="project_conv")(h)
        h = _BN(epsilon=self.bn_eps, name="project_bn")(h)
        if self.stride == 1 and in_ch == self.out_ch:
            h = h + x
        return h


# EfficientNetV2 stage plans (timm arch defs):
# (block_type, expand, channels, repeats, kernel, stride)
EFFICIENTNETV2_CONFIGS = {
    "efficientnetv2_s": {
        "stem": 24,
        "stages": (
            ("cn", 1, 24, 2, 3, 1),
            ("er", 4, 48, 4, 3, 2),
            ("er", 4, 64, 4, 3, 2),
            ("ir", 4, 128, 6, 3, 2),
            ("ir", 6, 160, 9, 3, 1),
            ("ir", 6, 256, 15, 3, 2),
        ),
        "feature_stages": (0, 1, 2, 4, 5),
    },
    "efficientnetv2_m": {
        "stem": 24,
        "stages": (
            ("cn", 1, 24, 3, 3, 1),
            ("er", 4, 48, 5, 3, 2),
            ("er", 4, 80, 5, 3, 2),
            ("ir", 4, 160, 7, 3, 2),
            ("ir", 6, 176, 14, 3, 1),
            ("ir", 6, 304, 18, 3, 2),
            ("ir", 6, 512, 5, 3, 1),
        ),
        "feature_stages": (0, 1, 2, 4, 6),
    },
    "efficientnetv2_l": {
        "stem": 32,
        "stages": (
            ("cn", 1, 32, 4, 3, 1),
            ("er", 4, 64, 7, 3, 2),
            ("er", 4, 96, 7, 3, 2),
            ("ir", 4, 192, 10, 3, 2),
            ("ir", 6, 224, 19, 3, 1),
            ("ir", 6, 384, 25, 3, 2),
            ("ir", 6, 640, 7, 3, 1),
        ),
        "feature_stages": (0, 1, 2, 4, 6),
    },
}


class EfficientNetV2Encoder(nn.Module):
    """EfficientNetV2 trunk returning per-stage features.

    Matches timm ``tf_efficientnetv2_*`` (TF-SAME padding, BN eps 1e-3,
    SiLU) as used by the reference KongNet encoder
    (``kongnet.py:728-736``). Returns 5 features at strides
    [2, 4, 8, 16, 32].
    """

    variant: str = "efficientnetv2_l"
    conv_padding: str = "SAME"
    bn_eps: float = 1e-3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        cfg = EFFICIENTNETV2_CONFIGS[self.variant]
        h = nn.Conv(
            cfg["stem"], (3, 3), strides=(2, 2),
            padding=_pad_spec(self.conv_padding, 3), use_bias=False,
            name="stem_conv",
        )(x)
        h = _BN(epsilon=self.bn_eps, name="stem_bn")(h)
        h = nn.silu(h)
        feats = []
        for stage_idx, (kind, expand, ch, repeats, kernel, stride) in enumerate(
            cfg["stages"]
        ):
            for block_idx in range(repeats):
                s = stride if block_idx == 0 else 1
                name = f"s{stage_idx}_b{block_idx}"
                if kind == "cn":
                    h = ConvBnAct(
                        ch, kernel, s,
                        conv_padding=self.conv_padding, bn_eps=self.bn_eps,
                        name=name,
                    )(h)
                elif kind == "er":
                    h = FusedMBConv(
                        ch, expand, kernel, s,
                        conv_padding=self.conv_padding, bn_eps=self.bn_eps,
                        name=name,
                    )(h)
                else:
                    h = MBConv(
                        ch, expand, kernel, s,
                        conv_padding=self.conv_padding, bn_eps=self.bn_eps,
                        name=name,
                    )(h)
            if stage_idx in cfg["feature_stages"]:
                feats.append(h)
        return feats


class EfficientNetClassifier(nn.Module):
    """EfficientNet with head conv + GAP + linear classifier.

    ``num_classes=0`` returns the pooled head features (timm's
    feature-extractor convention, used by TimmBackbone/TimmModel).
    """

    variant: str = "efficientnet_b0"
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        feats = EfficientNetEncoder(variant=self.variant, name="encoder")(x)
        width_mult, _ = EFFICIENTNET_PARAMS[self.variant]
        head_ch = _round_channels(1280, width_mult)
        h = nn.Conv(head_ch, (1, 1), use_bias=False, name="head_conv")(feats[-1])
        h = _BN(name="head_bn")(h)
        h = nn.silu(h)
        h = jnp.mean(h, axis=(1, 2))
        if self.num_classes == 0:
            return h
        return nn.Dense(self.num_classes, name="classifier")(h)


EFFICIENTNET_STAGE_CHANNELS = {
    variant: [
        _round_channels(32, wm),
        _round_channels(24, wm),
        _round_channels(40, wm),
        _round_channels(112, wm),
        _round_channels(320, wm),
    ]
    for variant, (wm, _) in EFFICIENTNET_PARAMS.items()
}
