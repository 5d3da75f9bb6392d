"""Tests for PatchPredictor and the model registry path."""

from __future__ import annotations

import numpy as np
import pytest

from tiatoolbox_tpu.data.synth import make_synthetic_slide, synthetic_he_patch
from tiatoolbox_tpu.models.architecture import get_pretrained_model
from tiatoolbox_tpu.models.engine.patch_predictor import PatchPredictor


@pytest.fixture(scope="module")
def slide_path(tmp_path_factory) -> str:
    path = tmp_path_factory.mktemp("pp") / "s.tiff"
    make_synthetic_slide(path, size=(1024, 768), mpp=0.5, objective_power=20)
    return str(path)


def test_registry_model() -> None:
    model, ioconfig = get_pretrained_model("resnet18-kather100k")
    assert model.num_classes == 9
    assert ioconfig.patch_input_shape == [224, 224]
    assert ioconfig.input_resolutions[0]["resolution"] == 0.5


def test_registry_unknown() -> None:
    with pytest.raises(ValueError, match="does not exist"):
        get_pretrained_model("bogus-model")


def test_patch_mode_predictions() -> None:
    patches = np.stack([synthetic_he_patch((224, 224), seed=s) for s in range(4)])
    predictor = PatchPredictor(
        "resnet18-kather100k", batch_size=4, num_loader_workers=0
    )
    out = predictor.run(patches, patch_mode=True)
    assert out["probabilities"].shape == (4, 9)
    assert out["predictions"].shape == (4,)
    assert np.allclose(out["probabilities"].sum(axis=1), 1.0, atol=1e-4)


def test_no_probabilities() -> None:
    patches = np.stack([synthetic_he_patch((224, 224), seed=s) for s in range(2)])
    predictor = PatchPredictor(
        "resnet18-kather100k", batch_size=2, num_loader_workers=0
    )
    out = predictor.run(patches, patch_mode=True, return_probabilities=False)
    assert "probabilities" not in out
    assert "predictions" in out


def test_wsi_mode(slide_path) -> None:
    predictor = PatchPredictor(
        "resnet18-kather100k", batch_size=16, num_loader_workers=2
    )
    out = predictor.run([slide_path], patch_mode=False)
    wsi = out[slide_path]
    n = wsi["predictions"].shape[0]
    assert wsi["coordinates"].shape == (n, 4)
    assert wsi["probabilities"].shape == (n, 9)
    assert n > 0


def test_graft_entry_single() -> None:
    import jax

    import __graft_entry__ as graft

    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 9)


def test_graft_dryrun_multichip() -> None:
    import __graft_entry__ as graft

    graft.dryrun_multichip(8)
