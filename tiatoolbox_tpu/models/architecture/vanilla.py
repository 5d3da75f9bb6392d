"""Vanilla CNN patch classifiers and feature backbones.

Reference: ``models/architecture/vanilla.py:256-683`` (CNNModel /
CNNBackbone over the torchvision backbone dict). Here backbones are
flax modules in NHWC; the forward program fuses normalize → backbone →
GAP → linear → softmax into one XLA program, and ``infer_batch`` adds
on-device argmax so only compact outputs cross back to the host.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tiatoolbox_tpu.models.architecture.resnet import (
    RESNET_CONFIGS,
    RESNET_FEATURES,
    ResNet,
)
from tiatoolbox_tpu.models.models_abc import ModelABC


def argmax_last_axis(image: np.ndarray) -> np.ndarray:
    """argmax over the last axis (reference ``architecture/utils.py``)."""
    return np.argmax(image, axis=-1)


from tiatoolbox_tpu.models.architecture.cnn_backbones import EXTRA_BACKBONES

backbone_dict = {name: (ResNet, cfg) for name, cfg in RESNET_CONFIGS.items()}
backbone_dict.update(
    {name: (cls, cfg) for name, (cls, cfg, _) in EXTRA_BACKBONES.items()}
)
_FEATURE_WIDTHS = dict(RESNET_FEATURES)
_FEATURE_WIDTHS.update({name: width for name, (_, _, width) in EXTRA_BACKBONES.items()})


def get_backbone(
    backbone: str, name: str = "backbone", stem: str = "conv"
) -> tuple[nn.Module, int]:
    """Instantiate a named backbone module and its feature width."""
    if backbone not in backbone_dict:
        msg = f"Backbone {backbone!r} not supported."
        raise ValueError(msg)
    cls, cfg = backbone_dict[backbone]
    if stem != "conv" and cls is ResNet:
        cfg = {**cfg, "stem": stem}
    return cls(**cfg, name=name), _FEATURE_WIDTHS[backbone]


def _has_s2d_stem(backbone: str) -> bool:
    """ResNet-family backbones support the space-to-depth stem rewrite."""
    return backbone_dict[backbone][0] is ResNet


class _CNNClassifier(nn.Module):
    """Backbone → global average pool → linear → softmax."""

    backbone: str
    num_classes: int
    stem: str = "conv"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        feat_extract, _ = get_backbone(self.backbone, stem=self.stem)
        feat = feat_extract(x)
        pooled = jnp.mean(feat, axis=(1, 2))
        logits = nn.Dense(self.num_classes, name="classifier")(pooled)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)


class _CNNFeatures(nn.Module):
    """Backbone → global average pool (feature embeddings)."""

    backbone: str
    stem: str = "conv"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        feat_extract, _ = get_backbone(self.backbone, stem=self.stem)
        feat = feat_extract(x)
        return jnp.mean(feat, axis=(1, 2))


class CNNModel(ModelABC):
    """Patch classifier: named backbone + linear head, softmax output.

    Args:
        backbone: Backbone name (e.g. "resnet18").
        num_classes: Number of output classes.
    """

    def __init__(self, backbone: str, num_classes: int = 1, **kwargs) -> None:
        if backbone not in backbone_dict:
            msg = f"Backbone {backbone!r} not supported."
            raise ValueError(msg)
        module = _CNNClassifier(backbone=backbone, num_classes=num_classes)
        super().__init__(module, **kwargs)
        self.backbone = backbone
        self.num_classes = num_classes

    def optimize_for_inference(self) -> "CNNModel":
        """bf16 weights + space-to-depth stem (ResNet family).

        The stem swap changes the module, not the variables — the
        rewritten kernel is folded from the stock ``conv1/kernel`` at
        trace time, so converted checkpoints load unchanged. The swap is
        gated on a reduced-precision ``compute_dtype``: under float32 the
        whole call stays a bit-exact no-op (the s2d stem reassociates
        the stem conv's additions, ~5e-4 output drift, and requires even
        input H/W), so float32 parity runs keep the stock conv stem.
        """
        super().optimize_for_inference()
        if (
            self.compute_dtype != jnp.float32
            and _has_s2d_stem(self.backbone)
            and self.module.stem != "s2d"
        ):
            self.module = _CNNClassifier(
                backbone=self.backbone, num_classes=self.num_classes, stem="s2d"
            )
            self._invalidate_jitted()
        return self

    @staticmethod
    def postproc(image: np.ndarray) -> np.ndarray:
        """argmax over class probabilities."""
        return argmax_last_axis(image=image)

    @staticmethod
    def infer_batch(model: "CNNModel", batch_data, device: str | None = None):
        """uint8 NHWC batch → softmax probabilities (numpy).

        The cast + forward + softmax run as one device program; only
        the [N, num_classes] probabilities are copied back.
        """
        return np.asarray(CNNModel.infer_batch_device(model, batch_data, device))

    @classmethod
    def infer_batch_device(cls, model: "CNNModel", batch_data, device: str | None = None):  # noqa: ARG003
        return model.apply_u8(model.stage_batch(batch_data))


class CNNBackbone(ModelABC):
    """Feature extractor: named backbone + global average pooling."""

    def __init__(self, backbone: str, **kwargs) -> None:
        if backbone not in backbone_dict:
            msg = f"Backbone {backbone!r} not supported."
            raise ValueError(msg)
        module = _CNNFeatures(backbone=backbone)
        super().__init__(module, **kwargs)
        self.backbone = backbone

    @staticmethod
    def infer_batch(model: "CNNBackbone", batch_data, device: str | None = None):
        return np.asarray(CNNBackbone.infer_batch_device(model, batch_data, device))

    @classmethod
    def infer_batch_device(cls, model: "CNNBackbone", batch_data, device: str | None = None):  # noqa: ARG003
        return model.apply_u8(model.stage_batch(batch_data))
