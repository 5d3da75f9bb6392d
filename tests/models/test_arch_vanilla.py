"""Architecture tests: flax CNNs, torch parity, weight conversion."""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent.parent))

from tiatoolbox_tpu.models.architecture.vanilla import CNNBackbone, CNNModel


@pytest.mark.parametrize("backbone", ["resnet18", "resnet50"])
def test_forward_shapes(backbone) -> None:
    model = CNNModel(backbone, num_classes=5)
    model.init(input_shape=(1, 64, 64, 3))
    out = CNNModel.infer_batch(model, np.zeros((2, 64, 64, 3), np.uint8))
    assert out.shape == (2, 5)
    assert np.allclose(out.sum(axis=-1), 1.0, atol=1e-5)


def test_backbone_features() -> None:
    model = CNNBackbone("resnet18")
    model.init(input_shape=(1, 64, 64, 3))
    feats = CNNBackbone.infer_batch(model, np.zeros((2, 64, 64, 3), np.uint8))
    assert feats.shape == (2, 512)


def test_unknown_backbone() -> None:
    with pytest.raises(ValueError, match="not supported"):
        CNNModel("bogusnet")


def test_torch_parity_resnet18() -> None:
    """Converted torch weights produce identical outputs (<=1e-5)."""
    import torch
    from torch_ref import TorchResNet18

    from tiatoolbox_tpu.models.architecture.weight_converter import (
        torch_resnet_to_flax,
        verify_against_torch,
    )

    torch.manual_seed(0)
    torch_model = TorchResNet18(num_classes=9)
    with torch.no_grad():
        for m in torch_model.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    torch_model.eval()

    flax_model = CNNModel("resnet18", num_classes=9)
    state_dict = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    flax_model.load_weights(torch_resnet_to_flax(state_dict))
    diff = verify_against_torch(flax_model, torch_model, input_shape=(2, 64, 64, 3))
    assert diff < 1e-5


def test_npz_roundtrip(tmp_path) -> None:
    from tiatoolbox_tpu.models.architecture.weight_converter import (
        load_flax_npz,
        save_flax_npz,
    )

    model = CNNModel("resnet18", num_classes=3)
    model.init(input_shape=(1, 32, 32, 3))
    path = tmp_path / "w.npz"
    save_flax_npz(model.variables, path)
    loaded = load_flax_npz(path)
    out1 = CNNModel.infer_batch(model, np.zeros((1, 32, 32, 3), np.uint8))
    model2 = CNNModel("resnet18", num_classes=3)
    model2.load_weights(loaded)
    out2 = CNNModel.infer_batch(model2, np.zeros((1, 32, 32, 3), np.uint8))
    assert np.allclose(out1, out2, atol=1e-6)


def test_s2d_stem_matches_conv_stem() -> None:
    """optimize_for_inference's space-to-depth stem is numerically
    equivalent (same variables, kernel folded at trace time)."""
    import numpy as np

    from tiatoolbox_tpu.models.architecture.vanilla import _CNNClassifier

    model = CNNModel("resnet18", num_classes=9)
    model.init(input_shape=(1, 64, 64, 3))
    x = np.random.default_rng(0).integers(0, 255, (2, 64, 64, 3), np.uint8)
    ref = np.asarray(model.apply_u8(x))
    s2d = _CNNClassifier(backbone="resnet18", num_classes=9, stem="s2d")
    out = np.asarray(s2d.apply(model.variables, x.astype(np.float32) / 255.0))
    assert np.abs(out - ref).max() < 1e-5
