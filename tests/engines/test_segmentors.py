"""Tests for SemanticSegmentor, MultiTaskSegmentor, NucleusDetector."""

from __future__ import annotations

import numpy as np
import pytest

from tiatoolbox_tpu.data.synth import make_synthetic_slide
from tiatoolbox_tpu.models.architecture.unet import UNetModel
from tiatoolbox_tpu.models.engine.io_config import (
    IOInstanceSegmentorConfig,
    IOSegmentorConfig,
)
from tiatoolbox_tpu.models.engine.semantic_segmentor import SemanticSegmentor


@pytest.fixture(scope="module")
def slide_path(tmp_path_factory) -> str:
    path = tmp_path_factory.mktemp("seg") / "s.tiff"
    make_synthetic_slide(path, size=(1024, 768), mpp=0.5, objective_power=20)
    return str(path)


@pytest.fixture(scope="module")
def tiny_unet() -> UNetModel:
    model = UNetModel(
        num_input_channels=3,
        num_output_channels=2,
        encoder="unet",
        encoder_levels=[8, 16, 32],
    )
    model.init(input_shape=(1, 64, 64, 3))
    return model


@pytest.fixture(scope="module")
def seg_ioconfig() -> IOSegmentorConfig:
    return IOSegmentorConfig(
        input_resolutions=[{"units": "mpp", "resolution": 2.0}],
        output_resolutions=[{"units": "mpp", "resolution": 2.0}],
        patch_input_shape=(64, 64),
        patch_output_shape=(32, 32),
        stride_shape=(32, 32),
    )


class TestSemanticSegmentor:
    def test_wsi_canvas(self, tiny_unet, slide_path, seg_ioconfig) -> None:
        seg = SemanticSegmentor(tiny_unet, batch_size=8, num_loader_workers=2)
        out = seg.run(
            [slide_path],
            patch_mode=False,
            ioconfig=seg_ioconfig,
            auto_get_mask=False,
        )
        w = out[slide_path]
        probs = np.asarray(w["probabilities"])
        # 1024x768 at 2mpp (0.5 mpp base) → 256x192
        assert probs.shape == (192, 256, 2)
        assert w["predictions"].shape == (192, 256)
        total = probs.sum(-1)
        assert (np.abs(total - 1) < 1e-3).mean() == 1.0  # full coverage

    def test_zarr_output(self, tiny_unet, slide_path, seg_ioconfig, tmp_path) -> None:
        seg = SemanticSegmentor(tiny_unet, batch_size=8, num_loader_workers=0)
        out = seg.run(
            [slide_path],
            patch_mode=False,
            ioconfig=seg_ioconfig,
            output_type="zarr",
            save_dir=tmp_path / "o",
            auto_get_mask=False,
        )
        from tiatoolbox_tpu.utils.zarrlite import open_zarr

        group = open_zarr(next(iter(out.values())))
        assert np.asarray(group["predictions"]).shape == (192, 256)

    def test_annotationstore_output(
        self, tiny_unet, slide_path, seg_ioconfig, tmp_path
    ) -> None:
        seg = SemanticSegmentor(tiny_unet, batch_size=8, num_loader_workers=0)
        out = seg.run(
            [slide_path],
            patch_mode=False,
            ioconfig=seg_ioconfig,
            output_type="annotationstore",
            save_dir=tmp_path / "o",
            auto_get_mask=False,
        )
        from tiatoolbox_tpu.annotation.storage import SQLiteStore

        path = next(iter(out.values()))
        store = SQLiteStore(path)
        assert len(store) >= 0  # random weights may give empty/any contours


class TestNucleusDetector:
    def test_patch_mode_detection(self) -> None:
        from tiatoolbox_tpu.models.architecture.mapde import MapDe
        from tiatoolbox_tpu.models.engine.nucleus_detector import NucleusDetector

        model = MapDe(num_classes=1)
        model.init()
        det = NucleusDetector(model, batch_size=1, num_loader_workers=0)
        patches = np.random.randint(0, 255, (1, 252, 252, 3), np.uint8)
        out = det.run(patches, patch_mode=True)
        assert "detections" in out
        assert isinstance(out["detections"][0]["coordinates"], np.ndarray)

    def test_detect_peaks_synthetic(self) -> None:
        from tiatoolbox_tpu.models.architecture.mapde import MapDe
        from tiatoolbox_tpu.models.engine.nucleus_detector import NucleusDetector

        model = MapDe(num_classes=1, threshold_abs=0.5, min_distance=4)
        det = NucleusDetector.__new__(NucleusDetector)
        det.model = model
        prob_map = np.zeros((64, 64, 1), np.float32)
        prob_map[10, 10] = 1.0
        prob_map[40, 44] = 0.9
        result = det._detect(prob_map)
        assert len(result["coordinates"]) == 2
        assert result["coordinates"][0].tolist() == [10, 10]  # (x, y)


class TestDeepFeatureExtractor:
    def test_features(self) -> None:
        from tiatoolbox_tpu.models.architecture.vanilla import CNNBackbone
        from tiatoolbox_tpu.models.engine.deep_feature_extractor import (
            DeepFeatureExtractor,
        )

        model = CNNBackbone("resnet18")
        model.init(input_shape=(1, 32, 32, 3))
        extractor = DeepFeatureExtractor(model, batch_size=4, num_loader_workers=0)
        patches = np.random.randint(0, 255, (4, 32, 32, 3), np.uint8)
        out = extractor.run(patches, patch_mode=True)
        assert out["features"].shape == (4, 512)


class TestRegistry:
    def test_all_entries_construct(self) -> None:
        from tiatoolbox_tpu import _get_pretrained_info
        from tiatoolbox_tpu.models.architecture import _locate_arch_class
        from tiatoolbox_tpu.models.engine import io_config as ioc

        info = _get_pretrained_info()
        assert len(info) >= 30
        for name, cfg in info.items():
            cls = _locate_arch_class(cfg["architecture"]["class"])
            model = cls(**cfg["architecture"].get("kwargs", {}))
            io_cls = getattr(ioc, cfg["ioconfig"]["class"].rsplit(".", 1)[-1])
            io_cfg = io_cls(**cfg["ioconfig"].get("kwargs", {}))
            assert model is not None, name
            assert io_cfg.patch_input_shape is not None, name
