"""VGG16 feature-extractor parity (DFBR registration backbone)."""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_vgg16_converter_parity() -> None:
    import jax.numpy as jnp
    import torch
    from torch_ref import TorchVGG16Features

    from tiatoolbox_tpu.models.architecture.vgg import VGG16Features
    from tiatoolbox_tpu.models.architecture.weight_converter import (
        torch_vgg_to_flax,
    )

    torch.manual_seed(0)
    tm = TorchVGG16Features().eval()
    fv = torch_vgg_to_flax({k: v.numpy() for k, v in tm.state_dict().items()})
    fm = VGG16Features()
    x = np.random.default_rng(0).random((1, 64, 64, 3), np.float32)
    with torch.inference_mode():
        t_outs = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    f_outs = fm.apply(fv, jnp.asarray(x))
    assert len(f_outs) == 3
    for f, t in zip(f_outs, t_outs):
        t_nhwc = np.transpose(t.numpy(), (0, 2, 3, 1))
        assert np.asarray(f).shape == t_nhwc.shape
        assert np.abs(np.asarray(f) - t_nhwc).max() < 1e-4


def test_dfbr_loads_vgg_checkpoint(tmp_path) -> None:
    import torch
    from torch_ref import TorchVGG16Features

    from tiatoolbox_tpu.tools.registration.wsi_registration import (
        DFBRFeatureExtractor,
    )

    torch.manual_seed(1)
    tm = TorchVGG16Features()
    path = tmp_path / "vgg16.pth"
    torch.save(tm.state_dict(), path)
    ext = DFBRFeatureExtractor(patch_size=(64, 64), weights=path)
    feats = ext(np.zeros((64, 64, 3), np.uint8))
    assert [f.shape[-1] for f in feats] == [256, 512, 512]


def test_dfbr_register_runs_with_vgg() -> None:
    """End-to-end DFBR on a translated synthetic pair (random init)."""
    from tiatoolbox_tpu.data.synth import synthetic_he_patch
    from tiatoolbox_tpu.tools.registration.wsi_registration import DFBRegister

    fixed = synthetic_he_patch((256, 256), seed=3)
    moving = np.roll(fixed, (12, -8), axis=(0, 1))
    reg = DFBRegister(patch_size=(224, 224))
    transform = reg.register(fixed, moving)
    assert transform.shape == (3, 3)
