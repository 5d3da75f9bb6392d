"""Flax Vision Transformer encoders for pathology foundation models.

The reference exposes timm-hub foundation tile encoders (UNI, UNI2,
Prov-GigaPath, H-optimus, Virchow, kaiko — ``models/architecture/
vanilla.py:42-110``). This module provides the equivalent flax ViT
family: pre-norm blocks, optional layer-scale (init_values), register
tokens, and SwiGLU MLPs, with named configs matching those encoders'
published architectures. Weights must be converted from the (gated) HF
checkpoints; shapes and token layouts line up 1:1.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from tiatoolbox_tpu.models.models_abc import ModelABC


class _Mlp(nn.Module):
    hidden: int
    out: int
    swiglu: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.swiglu:
            gates = nn.Dense(2 * self.hidden, name="fc1")(x)
            a, b = jnp.split(gates, 2, axis=-1)
            h = nn.silu(a) * b
        else:
            # exact (erf) gelu — timm/torch default, not the tanh approximation
            h = nn.gelu(nn.Dense(self.hidden, name="fc1")(x), approximate=False)
        return nn.Dense(self.out, name="fc2")(h)


class _Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float
    init_values: float | None = None
    swiglu: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.LayerNorm(name="norm1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.dim, name="attn"
        )(h, h)
        if self.init_values is not None:
            gamma1 = self.param(
                "ls1", lambda _, s: jnp.full(s, self.init_values), (self.dim,)
            )
            h = h * gamma1
        x = x + h
        h = nn.LayerNorm(name="norm2")(x)
        h = _Mlp(
            int(self.dim * self.mlp_ratio), self.dim, swiglu=self.swiglu, name="mlp"
        )(h)
        if self.init_values is not None:
            gamma2 = self.param(
                "ls2", lambda _, s: jnp.full(s, self.init_values), (self.dim,)
            )
            h = h * gamma2
        return x + h


class VisionTransformer(nn.Module):
    """Generic ViT tile encoder returning the CLS embedding.

    Args:
        patch_size / embed_dim / depth / num_heads / mlp_ratio: Standard
            ViT hyperparameters.
        init_values: Layer-scale init (None disables).
        reg_tokens: Number of register tokens.
        swiglu: Use SwiGLU MLPs (Virchow/H0-mini style).
        pool: "cls" or "mean" output pooling.
    """

    patch_size: int = 16
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    init_values: float | None = None
    reg_tokens: int = 0
    swiglu: bool = False
    pool: str = "cls"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, h, w, _ = x.shape
        x = nn.Conv(
            self.embed_dim,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            name="patch_embed",
        )(x)
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(n, gh * gw, self.embed_dim)

        cls_token = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.embed_dim)
        )
        tokens = [jnp.broadcast_to(cls_token, (n, 1, self.embed_dim))]
        if self.reg_tokens:
            reg = self.param(
                "reg_tokens",
                nn.initializers.zeros,
                (1, self.reg_tokens, self.embed_dim),
            )
            tokens.append(jnp.broadcast_to(reg, (n, self.reg_tokens, self.embed_dim)))
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, gh * gw + 1, self.embed_dim),
        )
        x = x + pos_embed[:, 1:]
        cls = tokens[0] + pos_embed[:, :1]
        x = jnp.concatenate([cls, *tokens[1:], x], axis=1)

        for i in range(self.depth):
            x = _Block(
                self.embed_dim,
                self.num_heads,
                self.mlp_ratio,
                init_values=self.init_values,
                swiglu=self.swiglu,
                name=f"block{i}",
            )(x)
        x = nn.LayerNorm(name="norm")(x)
        if self.pool == "mean":
            return x[:, 1 + self.reg_tokens :].mean(axis=1)
        return x[:, 0]


# Foundation-encoder configs (published architectures).
VIT_CONFIGS = {
    "UNI": dict(patch_size=16, embed_dim=1024, depth=24, num_heads=16,
                init_values=1e-5),
    "UNI2": dict(patch_size=14, embed_dim=1536, depth=24, num_heads=24,
                 init_values=1e-5, mlp_ratio=2.66667 * 2, reg_tokens=8,
                 swiglu=True),
    "prov-gigapath": dict(patch_size=16, embed_dim=1536, depth=40,
                          num_heads=24, init_values=1e-5),
    "H-optimus-0": dict(patch_size=14, embed_dim=1536, depth=40,
                        num_heads=24, init_values=1e-5, reg_tokens=4),
    "H-optimus-1": dict(patch_size=14, embed_dim=1536, depth=40,
                        num_heads=24, init_values=1e-5, reg_tokens=4),
    "H0-mini": dict(patch_size=14, embed_dim=768, depth=12, num_heads=12,
                    init_values=1e-5, swiglu=True, reg_tokens=4),
    "Virchow": dict(patch_size=14, embed_dim=1280, depth=32, num_heads=16,
                    swiglu=True),
    "Virchow2": dict(patch_size=14, embed_dim=1280, depth=32, num_heads=16,
                     swiglu=True, reg_tokens=4),
    "kaiko": dict(patch_size=14, embed_dim=1024, depth=24, num_heads=16,
                  reg_tokens=4),
}


class _TimmClassifierModule(nn.Module):
    """Foundation encoder → linear classifier → softmax."""

    encoder: nn.Module
    num_classes: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import jax

        feats = self.encoder(x)
        logits = nn.Dense(self.num_classes, name="classifier")(feats)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)


class TimmModel(ModelABC):
    """Patch classifier over a timm foundation tile encoder
    (reference ``vanilla.py:362-489`` ``TimmModel``: frozen-style
    encoder + linear classifier head).

    Args:
        backbone: One of the VIT_CONFIGS names (UNI, UNI2,
            prov-gigapath, Virchow(2), kaiko, H-optimus-0/1, H0-mini)
            or "efficientnet_b{i}".
        num_classes: Classifier output width.
    """

    def __init__(self, backbone: str, num_classes: int = 1, **kwargs) -> None:
        if backbone in VIT_CONFIGS:
            encoder = VisionTransformer(**VIT_CONFIGS[backbone])
        elif backbone.startswith("efficientnet"):
            from tiatoolbox_tpu.models.architecture.efficientnet import (
                EfficientNetClassifier,
            )

            encoder = EfficientNetClassifier(variant=backbone, num_classes=0)
        else:
            msg = f"Backbone {backbone!r} not supported."
            raise ValueError(msg)
        module = _TimmClassifierModule(encoder=encoder, num_classes=num_classes)
        super().__init__(module, **kwargs)
        self.backbone = backbone
        self.num_classes = num_classes

    @staticmethod
    def infer_batch(model: "TimmModel", batch_data, device: str | None = None):  # noqa: ARG004
        batch = jnp.asarray(batch_data).astype(model.compute_dtype) / 255.0
        return np.asarray(model(batch))


class TimmBackbone(ModelABC):
    """Foundation tile-encoder wrapper (reference TimmBackbone analog).

    Args:
        backbone: One of the VIT_CONFIGS names, or "efficientnet_b{i}".
    """

    def __init__(self, backbone: str, **kwargs) -> None:
        if backbone in VIT_CONFIGS:
            module = VisionTransformer(**VIT_CONFIGS[backbone])
        elif backbone.startswith("efficientnet"):
            from tiatoolbox_tpu.models.architecture.efficientnet import (
                EfficientNetClassifier,
            )

            module = EfficientNetClassifier(variant=backbone, num_classes=0)
        else:
            msg = f"Backbone {backbone!r} not supported."
            raise ValueError(msg)
        super().__init__(module, **kwargs)
        self.backbone = backbone

    @staticmethod
    def infer_batch(model: "TimmBackbone", batch_data, device: str | None = None):  # noqa: ARG004
        batch = jnp.asarray(batch_data).astype(model.compute_dtype) / 255.0
        return np.asarray(model(batch))
