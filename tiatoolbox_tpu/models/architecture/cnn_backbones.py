"""Additional flax CNN backbones (torchvision-topology-compatible).

Completes the reference backbone dict (``models/architecture/
vanilla.py:21-40``) beyond the ResNet family: AlexNet, DenseNet
121/161/169/201, MobileNetV2, MobileNetV3 small/large, GoogLeNet and
InceptionV3. NHWC layout, inference-mode batch norm.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from tiatoolbox_tpu.models.architecture.resnet import _BN


def _conv_bn_relu(x, features, kernel, stride=1, padding="SAME", name=""):
    x = nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=padding,
        use_bias=False,
        name=f"{name}_conv",
    )(x)
    x = _BN(name=f"{name}_bn")(x)
    return nn.relu(x)


class AlexNetFeatures(nn.Module):
    """AlexNet feature extractor (torchvision.features topology)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(64, (11, 11), strides=(4, 4), padding=[(2, 2), (2, 2)], name="c0")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.Conv(192, (5, 5), padding=[(2, 2), (2, 2)], name="c1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.relu(nn.Conv(384, (3, 3), padding=[(1, 1), (1, 1)], name="c2")(x))
        x = nn.relu(nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)], name="c3")(x))
        x = nn.relu(nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)], name="c4")(x))
        return nn.max_pool(x, (3, 3), strides=(2, 2))


class _DenseLayer(nn.Module):
    growth_rate: int
    bn_size: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.relu(_BN(name="bn1")(x))
        h = nn.Conv(self.bn_size * self.growth_rate, (1, 1), use_bias=False, name="conv1")(h)
        h = nn.relu(_BN(name="bn2")(h))
        h = nn.Conv(
            self.growth_rate, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
            name="conv2",
        )(h)
        return jnp.concatenate([x, h], axis=-1)


class DenseNetFeatures(nn.Module):
    """DenseNet feature trunk (121/161/169/201 via block_config)."""

    block_config: tuple = (6, 12, 24, 16)
    growth_rate: int = 32
    init_features: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(
            self.init_features, (7, 7), strides=(2, 2),
            padding=[(3, 3), (3, 3)], use_bias=False, name="conv0",
        )(x)
        x = nn.relu(_BN(name="bn0")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        features = self.init_features
        for block_idx, n_layers in enumerate(self.block_config):
            for layer_idx in range(n_layers):
                x = _DenseLayer(
                    self.growth_rate, name=f"db{block_idx}_l{layer_idx}"
                )(x)
                features += self.growth_rate
            if block_idx != len(self.block_config) - 1:
                features = features // 2
                x = nn.relu(_BN(name=f"trans{block_idx}_bn")(x))
                x = nn.Conv(features, (1, 1), use_bias=False, name=f"trans{block_idx}_conv")(x)
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        return nn.relu(_BN(name="bn_final")(x))


class _InvertedResidual(nn.Module):
    out_ch: int
    stride: int
    expand_ratio: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        hidden = in_ch * self.expand_ratio
        h = x
        if self.expand_ratio != 1:
            h = _conv_bn_relu(h, hidden, 1, name="expand")
        h = nn.Conv(
            hidden, (3, 3), strides=(self.stride, self.stride), padding="SAME",
            feature_group_count=hidden, use_bias=False, name="dw_conv",
        )(h)
        h = nn.relu(_BN(name="dw_bn")(h))
        h = nn.Conv(self.out_ch, (1, 1), use_bias=False, name="project")(h)
        h = _BN(name="project_bn")(h)
        if self.stride == 1 and in_ch == self.out_ch:
            return x + h
        return h


class MobileNetV2Features(nn.Module):
    """MobileNetV2 trunk (inverted residuals, ReLU6≈ReLU for inference)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = [  # t, c, n, s
            (1, 16, 1, 1),
            (6, 24, 2, 2),
            (6, 32, 3, 2),
            (6, 64, 4, 2),
            (6, 96, 3, 1),
            (6, 160, 3, 2),
            (6, 320, 1, 1),
        ]
        x = _conv_bn_relu(x, 32, 3, stride=2, name="stem")
        for bi, (t, c, n, s) in enumerate(cfg):
            for i in range(n):
                x = _InvertedResidual(
                    c, s if i == 0 else 1, t, name=f"b{bi}_{i}"
                )(x)
        return _conv_bn_relu(x, 1280, 1, name="head")


class _MBV3Block(nn.Module):
    out_ch: int
    hidden: int
    kernel: int
    stride: int
    use_se: bool
    use_hs: bool

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        def act(v):
            return nn.hard_swish(v) if self.use_hs else nn.relu(v)

        in_ch = x.shape[-1]
        h = x
        if self.hidden != in_ch:
            h = nn.Conv(self.hidden, (1, 1), use_bias=False, name="expand")(h)
            h = act(_BN(name="expand_bn")(h))
        h = nn.Conv(
            self.hidden,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding="SAME",
            feature_group_count=self.hidden,
            use_bias=False,
            name="dw",
        )(h)
        h = act(_BN(name="dw_bn")(h))
        if self.use_se:
            se = jnp.mean(h, axis=(1, 2), keepdims=True)
            squeeze = max(self.hidden // 4, 8)
            se = nn.relu(nn.Conv(squeeze, (1, 1), name="se1")(se))
            se = nn.hard_sigmoid(nn.Conv(self.hidden, (1, 1), name="se2")(se))
            h = h * se
        h = nn.Conv(self.out_ch, (1, 1), use_bias=False, name="project")(h)
        h = _BN(name="project_bn")(h)
        if self.stride == 1 and in_ch == self.out_ch:
            return x + h
        return h


_MBV3_LARGE = [  # k, hidden, out, se, hs, s
    (3, 16, 16, False, False, 1),
    (3, 64, 24, False, False, 2),
    (3, 72, 24, False, False, 1),
    (5, 72, 40, True, False, 2),
    (5, 120, 40, True, False, 1),
    (5, 120, 40, True, False, 1),
    (3, 240, 80, False, True, 2),
    (3, 200, 80, False, True, 1),
    (3, 184, 80, False, True, 1),
    (3, 184, 80, False, True, 1),
    (3, 480, 112, True, True, 1),
    (3, 672, 112, True, True, 1),
    (5, 672, 160, True, True, 2),
    (5, 960, 160, True, True, 1),
    (5, 960, 160, True, True, 1),
]
_MBV3_SMALL = [
    (3, 16, 16, True, False, 2),
    (3, 72, 24, False, False, 2),
    (3, 88, 24, False, False, 1),
    (5, 96, 40, True, True, 2),
    (5, 240, 40, True, True, 1),
    (5, 240, 40, True, True, 1),
    (5, 120, 48, True, True, 1),
    (5, 144, 48, True, True, 1),
    (5, 288, 96, True, True, 2),
    (5, 576, 96, True, True, 1),
    (5, 576, 96, True, True, 1),
]


class MobileNetV3Features(nn.Module):
    """MobileNetV3 trunk (large or small)."""

    variant: str = "large"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = _MBV3_LARGE if self.variant == "large" else _MBV3_SMALL
        x = nn.Conv(16, (3, 3), strides=(2, 2), padding="SAME", use_bias=False, name="stem")(x)
        x = nn.hard_swish(_BN(name="stem_bn")(x))
        for i, (k, hidden, out, se, hs, s) in enumerate(cfg):
            x = _MBV3Block(out, hidden, k, s, se, hs, name=f"b{i}")(x)
        head = 960 if self.variant == "large" else 576
        x = nn.Conv(head, (1, 1), use_bias=False, name="head")(x)
        return nn.hard_swish(_BN(name="head_bn")(x))


class _Inception(nn.Module):
    """GoogLeNet inception block."""

    b1: int
    b2: tuple  # (reduce, out)
    b3: tuple
    b4: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p1 = _conv_bn_relu(x, self.b1, 1, name="p1")
        p2 = _conv_bn_relu(x, self.b2[0], 1, name="p2a")
        p2 = _conv_bn_relu(p2, self.b2[1], 3, name="p2b")
        p3 = _conv_bn_relu(x, self.b3[0], 1, name="p3a")
        p3 = _conv_bn_relu(p3, self.b3[1], 3, name="p3b")
        p4 = nn.max_pool(x, (3, 3), strides=(1, 1), padding="SAME")
        p4 = _conv_bn_relu(p4, self.b4, 1, name="p4")
        return jnp.concatenate([p1, p2, p3, p4], axis=-1)


class GoogLeNetFeatures(nn.Module):
    """GoogLeNet (Inception v1) trunk."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = _conv_bn_relu(x, 64, 7, stride=2, name="stem1")
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        x = _conv_bn_relu(x, 64, 1, name="stem2")
        x = _conv_bn_relu(x, 192, 3, name="stem3")
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        x = _Inception(64, (96, 128), (16, 32), 32, name="i3a")(x)
        x = _Inception(128, (128, 192), (32, 96), 64, name="i3b")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        x = _Inception(192, (96, 208), (16, 48), 64, name="i4a")(x)
        x = _Inception(160, (112, 224), (24, 64), 64, name="i4b")(x)
        x = _Inception(128, (128, 256), (24, 64), 64, name="i4c")(x)
        x = _Inception(112, (144, 288), (32, 64), 64, name="i4d")(x)
        x = _Inception(256, (160, 320), (32, 128), 128, name="i4e")(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2), padding="SAME")
        x = _Inception(256, (160, 320), (32, 128), 128, name="i5a")(x)
        return _Inception(384, (192, 384), (48, 128), 128, name="i5b")(x)


class InceptionV3Features(nn.Module):
    """InceptionV3 trunk (compact faithful topology)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = _conv_bn_relu(x, 32, 3, stride=2, padding="VALID", name="s1")
        x = _conv_bn_relu(x, 32, 3, padding="VALID", name="s2")
        x = _conv_bn_relu(x, 64, 3, name="s3")
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = _conv_bn_relu(x, 80, 1, padding="VALID", name="s4")
        x = _conv_bn_relu(x, 192, 3, padding="VALID", name="s5")
        x = nn.max_pool(x, (3, 3), strides=(2, 2))

        def inception_a(x, pool_ch, name):
            p1 = _conv_bn_relu(x, 64, 1, name=f"{name}_p1")
            p2 = _conv_bn_relu(x, 48, 1, name=f"{name}_p2a")
            p2 = _conv_bn_relu(p2, 64, 5, name=f"{name}_p2b")
            p3 = _conv_bn_relu(x, 64, 1, name=f"{name}_p3a")
            p3 = _conv_bn_relu(p3, 96, 3, name=f"{name}_p3b")
            p3 = _conv_bn_relu(p3, 96, 3, name=f"{name}_p3c")
            p4 = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME")
            p4 = _conv_bn_relu(p4, pool_ch, 1, name=f"{name}_p4")
            return jnp.concatenate([p1, p2, p3, p4], axis=-1)

        x = inception_a(x, 32, "a1")
        x = inception_a(x, 64, "a2")
        x = inception_a(x, 64, "a3")
        # reduction
        r1 = _conv_bn_relu(x, 384, 3, stride=2, padding="VALID", name="rA_1")
        r2 = _conv_bn_relu(x, 64, 1, name="rA_2a")
        r2 = _conv_bn_relu(r2, 96, 3, name="rA_2b")
        r2 = _conv_bn_relu(r2, 96, 3, stride=2, padding="VALID", name="rA_2c")
        r3 = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = jnp.concatenate([r1, r2, r3], axis=-1)

        def inception_b(x, ch7, name):
            p1 = _conv_bn_relu(x, 192, 1, name=f"{name}_p1")
            p2 = _conv_bn_relu(x, ch7, 1, name=f"{name}_p2a")
            p2 = nn.relu(_BN(name=f"{name}_p2b_bn")(nn.Conv(ch7, (1, 7), padding="SAME", use_bias=False, name=f"{name}_p2b")(p2)))
            p2 = nn.relu(_BN(name=f"{name}_p2c_bn")(nn.Conv(192, (7, 1), padding="SAME", use_bias=False, name=f"{name}_p2c")(p2)))
            p3 = _conv_bn_relu(x, ch7, 1, name=f"{name}_p3a")
            p3 = nn.relu(_BN(name=f"{name}_p3b_bn")(nn.Conv(ch7, (7, 1), padding="SAME", use_bias=False, name=f"{name}_p3b")(p3)))
            p3 = nn.relu(_BN(name=f"{name}_p3c_bn")(nn.Conv(ch7, (1, 7), padding="SAME", use_bias=False, name=f"{name}_p3c")(p3)))
            p3 = nn.relu(_BN(name=f"{name}_p3d_bn")(nn.Conv(ch7, (7, 1), padding="SAME", use_bias=False, name=f"{name}_p3d")(p3)))
            p3 = nn.relu(_BN(name=f"{name}_p3e_bn")(nn.Conv(192, (1, 7), padding="SAME", use_bias=False, name=f"{name}_p3e")(p3)))
            p4 = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME")
            p4 = _conv_bn_relu(p4, 192, 1, name=f"{name}_p4")
            return jnp.concatenate([p1, p2, p3, p4], axis=-1)

        x = inception_b(x, 128, "b1")
        x = inception_b(x, 160, "b2")
        x = inception_b(x, 160, "b3")
        x = inception_b(x, 192, "b4")
        # reduction B
        r1 = _conv_bn_relu(x, 192, 1, name="rB_1a")
        r1 = _conv_bn_relu(r1, 320, 3, stride=2, padding="VALID", name="rB_1b")
        r2 = _conv_bn_relu(x, 192, 1, name="rB_2a")
        r2 = nn.relu(_BN(name="rB_2b_bn")(nn.Conv(192, (1, 7), padding="SAME", use_bias=False, name="rB_2b")(r2)))
        r2 = nn.relu(_BN(name="rB_2c_bn")(nn.Conv(192, (7, 1), padding="SAME", use_bias=False, name="rB_2c")(r2)))
        r2 = _conv_bn_relu(r2, 192, 3, stride=2, padding="VALID", name="rB_2d")
        r3 = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = jnp.concatenate([r1, r2, r3], axis=-1)

        def inception_c(x, name):
            p1 = _conv_bn_relu(x, 320, 1, name=f"{name}_p1")
            p2 = _conv_bn_relu(x, 384, 1, name=f"{name}_p2a")
            p2a = nn.relu(_BN(name=f"{name}_p2b_bn")(nn.Conv(384, (1, 3), padding="SAME", use_bias=False, name=f"{name}_p2b")(p2)))
            p2b = nn.relu(_BN(name=f"{name}_p2c_bn")(nn.Conv(384, (3, 1), padding="SAME", use_bias=False, name=f"{name}_p2c")(p2)))
            p3 = _conv_bn_relu(x, 448, 1, name=f"{name}_p3a")
            p3 = _conv_bn_relu(p3, 384, 3, name=f"{name}_p3b")
            p3a = nn.relu(_BN(name=f"{name}_p3c_bn")(nn.Conv(384, (1, 3), padding="SAME", use_bias=False, name=f"{name}_p3c")(p3)))
            p3b = nn.relu(_BN(name=f"{name}_p3d_bn")(nn.Conv(384, (3, 1), padding="SAME", use_bias=False, name=f"{name}_p3d")(p3)))
            p4 = nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME")
            p4 = _conv_bn_relu(p4, 192, 1, name=f"{name}_p4")
            return jnp.concatenate([p1, p2a, p2b, p3a, p3b, p4], axis=-1)

        x = inception_c(x, "c1")
        return inception_c(x, "c2")


EXTRA_BACKBONES = {
    "alexnet": (AlexNetFeatures, {}, 256),
    "densenet121": (DenseNetFeatures, {"block_config": (6, 12, 24, 16)}, 1024),
    "densenet161": (
        DenseNetFeatures,
        {"block_config": (6, 12, 36, 24), "growth_rate": 48, "init_features": 96},
        2208,
    ),
    "densenet169": (DenseNetFeatures, {"block_config": (6, 12, 32, 32)}, 1664),
    "densenet201": (DenseNetFeatures, {"block_config": (6, 12, 48, 32)}, 1920),
    "mobilenet_v2": (MobileNetV2Features, {}, 1280),
    "mobilenet_v3_large": (MobileNetV3Features, {"variant": "large"}, 960),
    "mobilenet_v3_small": (MobileNetV3Features, {"variant": "small"}, 576),
    "googlenet": (GoogLeNetFeatures, {}, 1024),
    "inception_v3": (InceptionV3Features, {}, 2048),
}
