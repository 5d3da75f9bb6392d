"""Minimal torch ResNet-18 replica (torchvision topology + naming).

Used only in tests to validate the torch→flax weight converter and
numerical parity. torchvision is not available in this environment, so
this replicates the exact module naming of torchvision's resnet18.
"""

from __future__ import annotations

import torch
from torch import nn


class BasicBlock(nn.Module):
    def __init__(self, inplanes: int, planes: int, stride: int = 1) -> None:
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        if stride != 1 or inplanes != planes:
            self.downsample = nn.Sequential(
                nn.Conv2d(inplanes, planes, 1, stride, bias=False),
                nn.BatchNorm2d(planes),
            )
        else:
            self.downsample = None

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchResNet18(nn.Module):
    def __init__(self, num_classes: int = 1000) -> None:
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = nn.Sequential(BasicBlock(64, 64), BasicBlock(64, 64))
        self.layer2 = nn.Sequential(BasicBlock(64, 128, 2), BasicBlock(128, 128))
        self.layer3 = nn.Sequential(BasicBlock(128, 256, 2), BasicBlock(256, 256))
        self.layer4 = nn.Sequential(BasicBlock(256, 512, 2), BasicBlock(512, 512))
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512, num_classes)

    def features(self, x: torch.Tensor) -> torch.Tensor:
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        return x

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        x = self.features(x)
        x = torch.flatten(self.avgpool(x), 1)
        return torch.softmax(self.fc(x), -1)


class Bottleneck(nn.Module):
    """torchvision Bottleneck (expansion 4, stride on 3x3)."""

    def __init__(self, inplanes: int, planes: int, stride: int = 1) -> None:
        super().__init__()
        out = planes * 4
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, out, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(out)
        self.relu = nn.ReLU(inplace=True)
        if stride != 1 or inplanes != out:
            self.downsample = nn.Sequential(
                nn.Conv2d(inplanes, out, 1, stride, bias=False),
                nn.BatchNorm2d(out),
            )
        else:
            self.downsample = None

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchResNetEncoder(nn.Module):
    """Reference-style ResNetEncoder: per-stage features, torchvision names."""

    def __init__(self, layers=(3, 4, 6, 3), in_ch: int = 3) -> None:
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, 64, 7, 2, 3, bias=(in_ch != 3))
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        inplanes = 64
        for i, n in enumerate(layers):
            planes = 64 * 2**i
            blocks = []
            for b in range(n):
                stride = 2 if (i > 0 and b == 0) else 1
                blocks.append(Bottleneck(inplanes, planes, stride))
                inplanes = planes * 4
            setattr(self, f"layer{i+1}", nn.Sequential(*blocks))

    def forward(self, x: torch.Tensor) -> list:
        x = self.conv1(x)
        x = self.bn1(x)
        x0 = x = self.relu(x)
        x = self.maxpool(x)
        x1 = x = self.layer1(x)
        x2 = x = self.layer2(x)
        x3 = x = self.layer3(x)
        x4 = self.layer4(x)
        return [x0, x1, x2, x3, x4]

class _TimmSE(nn.Module):
    """timm SqueezeExcite: reduce on block-input channels, SiLU, sigmoid."""

    def __init__(self, chs: int, in_chs: int) -> None:
        super().__init__()
        reduced = max(1, in_chs // 4)
        self.conv_reduce = nn.Conv2d(chs, reduced, 1, bias=True)
        self.act1 = nn.SiLU()
        self.conv_expand = nn.Conv2d(reduced, chs, 1, bias=True)

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        s = x.mean((2, 3), keepdim=True)
        s = self.conv_expand(self.act1(self.conv_reduce(s)))
        return x * torch.sigmoid(s)


class _TimmDSConv(nn.Module):
    """timm DepthwiseSeparableConv (EfficientNet stage 0), static padding."""

    def __init__(self, in_chs: int, out_chs: int, kernel: int = 3) -> None:
        super().__init__()
        self.conv_dw = nn.Conv2d(
            in_chs, in_chs, kernel, padding=kernel // 2, groups=in_chs, bias=False
        )
        self.bn1 = nn.BatchNorm2d(in_chs)
        self.se = _TimmSE(in_chs, in_chs)
        self.conv_pw = nn.Conv2d(in_chs, out_chs, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(out_chs)
        self.act = nn.SiLU()

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        x = self.act(self.bn1(self.conv_dw(x)))
        x = self.se(x)
        return self.bn2(self.conv_pw(x))


class _TimmIR(nn.Module):
    """timm InvertedResidual, static k//2 padding, SE on input chs."""

    def __init__(
        self, in_chs: int, out_chs: int, expand: int, kernel: int, stride: int
    ) -> None:
        super().__init__()
        mid = in_chs * expand
        self.has_skip = stride == 1 and in_chs == out_chs
        self.conv_pw = nn.Conv2d(in_chs, mid, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(mid)
        self.conv_dw = nn.Conv2d(
            mid, mid, kernel, stride, kernel // 2, groups=mid, bias=False
        )
        self.bn2 = nn.BatchNorm2d(mid)
        self.se = _TimmSE(mid, in_chs)
        self.conv_pwl = nn.Conv2d(mid, out_chs, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(out_chs)
        self.act = nn.SiLU()

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        shortcut = x
        x = self.act(self.bn1(self.conv_pw(x)))
        x = self.act(self.bn2(self.conv_dw(x)))
        x = self.se(x)
        x = self.bn3(self.conv_pwl(x))
        if self.has_skip:
            x = x + shortcut
        return x


class TorchTimmEfficientNetB0Encoder(nn.Module):
    """timm-native EfficientNet-B0 feature encoder (timm module naming).

    Mirrors the reference's SMP timm encoder
    (timm_efficientnet.py:383-552): returns [identity, s2, s4, s8,
    s16, s32] features.
    """

    # (expand, out, repeats, kernel, stride) per stage, B0
    _STAGES = (
        (1, 16, 1, 3, 1),
        (6, 24, 2, 3, 2),
        (6, 40, 2, 5, 2),
        (6, 80, 3, 3, 2),
        (6, 112, 3, 5, 1),
        (6, 192, 4, 5, 2),
        (6, 320, 1, 3, 1),
    )

    def __init__(self) -> None:
        super().__init__()
        self.conv_stem = nn.Conv2d(3, 32, 3, 2, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(32)
        self.act = nn.SiLU()
        stages = []
        in_chs = 32
        for stage_idx, (expand, out, repeats, k, s) in enumerate(self._STAGES):
            blocks = []
            for b in range(repeats):
                if stage_idx == 0:
                    blocks.append(_TimmDSConv(in_chs, out, k))
                else:
                    blocks.append(_TimmIR(in_chs, out, expand, k, s if b == 0 else 1))
                in_chs = out
            stages.append(nn.Sequential(*blocks))
        self.blocks = nn.Sequential(*stages)

    def forward(self, x: torch.Tensor) -> list:
        features = [x]
        x = self.act(self.bn1(self.conv_stem(x)))
        features.append(x)
        x = self.blocks[0](x)
        x = self.blocks[1](x)
        features.append(x)
        x = self.blocks[2](x)
        features.append(x)
        x = self.blocks[3](x)
        x = self.blocks[4](x)
        features.append(x)
        x = self.blocks[5](x)
        x = self.blocks[6](x)
        features.append(x)
        return features


class TFSameConv2d(nn.Conv2d):
    """Conv2d with TF dynamic SAME padding (as timm tf_ variants)."""

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        import math as _math

        h, w = x.shape[-2:]
        kh, kw = self.kernel_size
        sh, sw = self.stride
        pad_h = max((_math.ceil(h / sh) - 1) * sh + kh - h, 0)
        pad_w = max((_math.ceil(w / sw) - 1) * sw + kw - w, 0)
        if pad_h or pad_w:
            x = torch.nn.functional.pad(
                x, [pad_w // 2, pad_w - pad_w // 2, pad_h // 2, pad_h - pad_h // 2]
            )
        return torch.nn.functional.conv2d(
            x, self.weight, self.bias, self.stride, 0, self.dilation, self.groups
        )

class _TimmConvBnAct(nn.Module):
    """timm ConvBnAct ("cn") block: residual added after activation."""

    def __init__(self, in_chs: int, out_chs: int, kernel: int, stride: int) -> None:
        super().__init__()
        self.has_skip = stride == 1 and in_chs == out_chs
        self.conv = TFSameConv2d(in_chs, out_chs, kernel, stride, bias=False)
        self.bn1 = nn.BatchNorm2d(out_chs, eps=1e-3)
        self.act = nn.SiLU()

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        shortcut = x
        x = self.act(self.bn1(self.conv(x)))
        if self.has_skip:
            x = x + shortcut
        return x


class _TimmEdgeResidual(nn.Module):
    """timm EdgeResidual ("er"): fused expand conv + linear project."""

    def __init__(
        self, in_chs: int, out_chs: int, expand: int, kernel: int, stride: int
    ) -> None:
        super().__init__()
        mid = in_chs * expand
        self.has_skip = stride == 1 and in_chs == out_chs
        self.conv_exp = TFSameConv2d(in_chs, mid, kernel, stride, bias=False)
        self.bn1 = nn.BatchNorm2d(mid, eps=1e-3)
        self.conv_pwl = nn.Conv2d(mid, out_chs, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(out_chs, eps=1e-3)
        self.act = nn.SiLU()

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        shortcut = x
        x = self.act(self.bn1(self.conv_exp(x)))
        x = self.bn2(self.conv_pwl(x))
        if self.has_skip:
            x = x + shortcut
        return x


class _TimmIRv2(_TimmIR):
    """InvertedResidual with BN eps 1e-3 + TF-SAME dw conv (tf_ variants)."""

    def __init__(
        self, in_chs: int, out_chs: int, expand: int, kernel: int, stride: int
    ) -> None:
        super().__init__(in_chs, out_chs, expand, kernel, stride)
        mid = in_chs * expand
        self.conv_dw = TFSameConv2d(
            mid, mid, kernel, stride, groups=mid, bias=False
        )
        for m in self.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.eps = 1e-3


# (kind, expand, out, repeats, kernel, stride) per stage
_V2_CONFIGS = {
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
}


class TorchTimmEfficientNetV2Features(nn.Module):
    """timm tf_efficientnetv2_* features_only replica (timm naming).

    Uses TF dynamic-SAME padding (tf_ variants), BN eps 1e-3, SiLU.
    """

    def __init__(self, variant: str = "efficientnetv2_l") -> None:
        super().__init__()
        cfg = _V2_CONFIGS[variant]
        self.feature_stages = cfg["feature_stages"]
        self.conv_stem = TFSameConv2d(3, cfg["stem"], 3, 2, bias=False)
        self.bn1 = nn.BatchNorm2d(cfg["stem"], eps=1e-3)
        self.act = nn.SiLU()
        stages = []
        in_chs = cfg["stem"]
        for kind, expand, out, repeats, k, s in cfg["stages"]:
            blocks = []
            for b in range(repeats):
                stride = s if b == 0 else 1
                if kind == "cn":
                    blocks.append(_TimmConvBnAct(in_chs, out, k, stride))
                elif kind == "er":
                    blocks.append(_TimmEdgeResidual(in_chs, out, expand, k, stride))
                else:
                    blocks.append(_TimmIRv2(in_chs, out, expand, k, stride))
                in_chs = out
            stages.append(nn.Sequential(*blocks))
        self.blocks = nn.Sequential(*stages)

    def forward(self, x: torch.Tensor) -> list:
        x = self.act(self.bn1(self.conv_stem(x)))
        features = []
        for stage_idx, stage in enumerate(self.blocks):
            x = stage(x)
            if stage_idx in self.feature_stages:
                features.append(x)
        return features


class _TorchViTBlock(nn.Module):
    """timm-style pre-norm ViT block (packed qkv, optional layer-scale/SwiGLU)."""

    def __init__(self, dim, heads, mlp_ratio, init_values=None, swiglu=False,
                 swiglu_packed_names=False):
        super().__init__()
        self.heads = heads
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)  # timm vit convention
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(dim, 3 * dim)
        self.attn.proj = nn.Linear(dim, dim)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        hidden = int(dim * mlp_ratio)
        self.swiglu = swiglu
        self.mlp = nn.Module()
        fc1 = nn.Linear(dim, 2 * hidden if swiglu else hidden)
        fc2 = nn.Linear(hidden, dim)
        if swiglu_packed_names:  # timm SwiGLUPacked naming
            self.mlp.w12, self.mlp.w3 = fc1, fc2
        else:
            self.mlp.fc1, self.mlp.fc2 = fc1, fc2
        if init_values is not None:
            self.ls1 = nn.Module()
            self.ls1.gamma = nn.Parameter(torch.full((dim,), init_values))
            self.ls2 = nn.Module()
            self.ls2.gamma = nn.Parameter(torch.full((dim,), init_values))
        else:
            self.ls1 = self.ls2 = None

    def _attention(self, x):
        b, n, d = x.shape
        hd = d // self.heads
        qkv = self.attn.qkv(x).reshape(b, n, 3, self.heads, hd)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        att = (q @ k.transpose(-2, -1)) / hd ** 0.5
        out = (att.softmax(-1) @ v).transpose(1, 2).reshape(b, n, d)
        return self.attn.proj(out)

    def _mlp(self, x):
        fc1 = getattr(self.mlp, "fc1", None) or self.mlp.w12
        fc2 = getattr(self.mlp, "fc2", None) or self.mlp.w3
        h = fc1(x)
        if self.swiglu:
            a, g = h.chunk(2, dim=-1)
            h = torch.nn.functional.silu(a) * g
        else:
            h = torch.nn.functional.gelu(h)
        return fc2(h)

    def forward(self, x):
        h = self._attention(self.norm1(x))
        if self.ls1 is not None:
            h = h * self.ls1.gamma
        x = x + h
        h = self._mlp(self.norm2(x))
        if self.ls2 is not None:
            h = h * self.ls2.gamma
        return x + h


class TorchViT(nn.Module):
    """timm-graph ViT tile encoder (CLS output) for converter parity tests."""

    def __init__(self, img_size=224, patch_size=16, dim=384, depth=4, heads=6,
                 mlp_ratio=4.0, init_values=None, reg_tokens=0, swiglu=False,
                 swiglu_packed_names=False):
        super().__init__()
        self.reg_tokens = reg_tokens
        grid = img_size // patch_size
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, dim, patch_size, patch_size)
        self.cls_token = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        if reg_tokens:
            self.reg_token = nn.Parameter(torch.randn(1, reg_tokens, dim) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, grid * grid + 1, dim) * 0.02)
        self.blocks = nn.ModuleList([
            _TorchViTBlock(dim, heads, mlp_ratio, init_values, swiglu,
                           swiglu_packed_names)
            for _ in range(depth)
        ])
        self.norm = nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x):
        b = x.shape[0]
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = x + self.pos_embed[:, 1:]
        cls = (self.cls_token + self.pos_embed[:, :1]).expand(b, -1, -1)
        toks = [cls]
        if self.reg_tokens:
            toks.append(self.reg_token.expand(b, -1, -1))
        x = torch.cat([*toks, x], dim=1)
        for blk in self.blocks:
            x = blk(x)
        return self.norm(x)[:, 0]


class TorchVGG16Features(nn.Module):
    """torchvision vgg16.features graph returning pool3/4/5 outputs,
    with ImageNet input normalization folded in (DFBR contract)."""

    def __init__(self) -> None:
        super().__init__()
        cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512, "M"]
        layers, in_ch = [], 3
        for v in cfg:
            if v == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                layers += [nn.Conv2d(in_ch, v, 3, padding=1), nn.ReLU(inplace=True)]
                in_ch = v
        self.features = nn.Sequential(*layers)
        self.register_buffer("mean", torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1))
        self.register_buffer("std", torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1))

    def forward(self, x: torch.Tensor) -> list:
        x = (x - self.mean) / self.std
        outs = []
        for i, layer in enumerate(self.features):
            x = layer(x)
            if i in (16, 23, 30):
                outs.append(x)
        return outs
