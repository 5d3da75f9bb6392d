"""Extended engine coverage.

Scenario set modeled on the reference's engine tests
(``tests/engines/test_engine_abc.py``, ``test_patch_predictor.py``,
``test_semantic_segmentor.py``, ``test_nucleus_detection_engine.py``):
output-type matrix (dict/zarr/annotationstore/qupath), ioconfig
delegation and run-param overrides, multi-slide runs, and store
content validation.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pytest

from tiatoolbox_tpu.annotation.storage import SQLiteStore
from tiatoolbox_tpu.data.synth import make_synthetic_slide, synthetic_he_patch
from tiatoolbox_tpu.models.architecture.unet import UNetModel
from tiatoolbox_tpu.models.architecture.vanilla import CNNModel
from tiatoolbox_tpu.models.engine.engine_abc import (
    EngineABC,
    prepare_engines_save_dir,
)
from tiatoolbox_tpu.models.engine.io_config import (
    IOSegmentorConfig,
    ModelIOConfigABC,
)
from tiatoolbox_tpu.models.engine.nucleus_detector import (
    NucleusDetector,
    make_points,
    save_detection_arrays_to_qupath_json,
)
from tiatoolbox_tpu.models.engine.patch_predictor import PatchPredictor
from tiatoolbox_tpu.models.engine.semantic_segmentor import SemanticSegmentor
from tiatoolbox_tpu.utils.zarrlite import ZarrGroup


class MinimalEngine(EngineABC):
    """Concrete engine using the abstract machinery unmodified."""


@pytest.fixture(scope="module")
def small_model() -> CNNModel:
    model = CNNModel("resnet18", num_classes=3)
    model.init(input_shape=(1, 32, 32, 3))
    return model


@pytest.fixture(scope="module")
def slide_path(tmp_path_factory) -> str:
    path = tmp_path_factory.mktemp("engext") / "s.tiff"
    make_synthetic_slide(path, size=(1024, 768), mpp=0.5, objective_power=20)
    return str(path)


@pytest.fixture(scope="module")
def slide_path_b(tmp_path_factory) -> str:
    path = tmp_path_factory.mktemp("engext") / "t.tiff"
    make_synthetic_slide(path, size=(768, 512), mpp=0.5, objective_power=20, seed=3)
    return str(path)


@pytest.fixture(scope="module")
def patches() -> np.ndarray:
    return np.stack(
        [synthetic_he_patch(size=(32, 32), seed=i) for i in range(6)]
    )


def _wsi_kwargs() -> dict:
    return {
        "patch_input_shape": (32, 32),
        "stride_shape": (32, 32),
        "resolution": 1.0,
        "units": "baseline",
    }


class TestEngineConstruction:
    def test_incorrect_model_type_raises(self) -> None:
        with pytest.raises(TypeError, match="registry name or a ModelABC"):
            MinimalEngine(model=42)

    def test_unknown_run_param_raises(self, small_model, patches) -> None:
        engine = MinimalEngine(small_model, verbose=False)
        with pytest.raises(TypeError, match="Unknown run parameter"):
            engine.run(patches, bogus_param=1)

    def test_num_workers_alias(self, small_model, patches) -> None:
        engine = MinimalEngine(small_model, verbose=False)
        engine.run(patches, num_workers=1)
        assert engine.num_loader_workers == 1

    def test_prepare_save_dir_patch_mode_optional(self) -> None:
        assert prepare_engines_save_dir(None, patch_mode=True, overwrite=False) is None

    def test_prepare_save_dir_wsi_mode_dict_allowed(self) -> None:
        # Superset of the reference: WSI mode with in-memory dict output
        # needs no save_dir (device-canvas merge keeps results in RAM).
        assert prepare_engines_save_dir(None, patch_mode=False, overwrite=False) is None

    def test_prepare_save_dir_creates(self, tmp_path) -> None:
        target = tmp_path / "fresh"
        out = prepare_engines_save_dir(target, patch_mode=False, overwrite=False)
        assert out == target
        assert target.is_dir()

    def test_prepare_save_dir_existing_no_overwrite(self, tmp_path) -> None:
        target = tmp_path / "exists"
        target.mkdir()
        (target / "junk").write_text("x")
        with pytest.raises(OSError, match="exists"):
            prepare_engines_save_dir(target, patch_mode=False, overwrite=False)
        prepare_engines_save_dir(target, patch_mode=False, overwrite=True)


class TestIOConfigDelegation:
    def test_run_params_override_shape(self, small_model) -> None:
        engine = MinimalEngine(small_model, batch_size=8, verbose=False)
        engine.patch_input_shape = (48, 48)
        engine.stride_shape = (24, 24)
        engine.resolution = 2.0
        engine.units = "baseline"
        cfg = engine._update_ioconfig(None)
        assert cfg.patch_input_shape == (48, 48)
        assert cfg.stride_shape == (24, 24)
        assert cfg.input_resolutions[0]["resolution"] == 2.0

    def test_explicit_ioconfig_wins(self, small_model) -> None:
        engine = MinimalEngine(small_model, verbose=False)
        cfg = ModelIOConfigABC(
            input_resolutions=[{"units": "baseline", "resolution": 1.0}],
            patch_input_shape=(64, 64),
        )
        out = engine._update_ioconfig(cfg)
        assert out is cfg

    def test_run_param_overrides_explicit_ioconfig_shape(self, small_model) -> None:
        engine = MinimalEngine(small_model, verbose=False)
        cfg = ModelIOConfigABC(
            input_resolutions=[{"units": "baseline", "resolution": 1.0}],
            patch_input_shape=(64, 64),
        )
        engine.patch_input_shape = (32, 32)
        out = engine._update_ioconfig(cfg)
        assert out.patch_input_shape == (32, 32)

    def test_missing_everything_raises(self, small_model) -> None:
        engine = MinimalEngine(small_model, verbose=False)
        with pytest.raises(ValueError, match="ioconfig"):
            engine._update_ioconfig(None)

    def test_dataloader_uses_ioconfig_resolution(self, small_model, slide_path) -> None:
        engine = MinimalEngine(small_model, batch_size=8, verbose=False)
        cfg = ModelIOConfigABC(
            input_resolutions=[{"units": "baseline", "resolution": 0.5}],
            patch_input_shape=(32, 32),
        )
        engine._ioconfig = cfg
        loader = engine.get_dataloader(slide_path, patch_mode=False)
        assert loader.dataset.resolution == 0.5
        assert loader.dataset.units == "baseline"


class TestPatchModeOutputs:
    def test_annotationstore_boxes_at_patch_extent(
        self, small_model, patches, tmp_path
    ) -> None:
        predictor = PatchPredictor(small_model, batch_size=4, verbose=False)
        out = predictor.run(
            patches,
            patch_mode=True,
            save_dir=tmp_path / "store_out",
            output_type="annotationstore",
        )
        assert Path(out).exists()
        store = SQLiteStore(out)
        anns = list(store.values())
        assert len(anns) == len(patches)
        # Patch-mode coordinates are the patch extent (reference
        # engine_abc.py:482-502).
        assert all(a.geometry.bounds == (0.0, 0.0, 32.0, 32.0) for a in anns)
        assert all("prob" in a.properties for a in anns)

    def test_annotationstore_class_dict(self, small_model, patches, tmp_path) -> None:
        predictor = PatchPredictor(small_model, batch_size=4, verbose=False)
        out = predictor.run(
            patches,
            patch_mode=True,
            save_dir=tmp_path / "cd_out",
            output_type="annotationstore",
            class_dict={0: "a", 1: "b", 2: "c"},
        )
        store = SQLiteStore(out)
        assert {a.properties["type"] for a in store.values()} <= {"a", "b", "c"}

    def test_qupath_json_patch_mode(self, small_model, patches, tmp_path) -> None:
        predictor = PatchPredictor(small_model, batch_size=4, verbose=False)
        out = predictor.run(
            patches,
            patch_mode=True,
            save_dir=tmp_path / "qp_out",
            output_type="qupath",
        )
        assert Path(out).suffix == ".json"
        data = json.loads(Path(out).read_text())
        assert data["type"] == "FeatureCollection"
        assert len(data["features"]) == len(patches)
        assert all(
            f["properties"]["objectType"] == "annotation" for f in data["features"]
        )

    def test_no_probabilities(self, small_model, patches) -> None:
        predictor = PatchPredictor(small_model, batch_size=4, verbose=False)
        out = predictor.run(patches, patch_mode=True, return_probabilities=False)
        assert "probabilities" not in out
        assert "predictions" in out

    def test_zarr_matches_dict(self, small_model, patches, tmp_path) -> None:
        predictor = PatchPredictor(small_model, batch_size=4, verbose=False)
        as_dict = predictor.run(patches, patch_mode=True)
        zarr_path = predictor.run(
            patches,
            patch_mode=True,
            save_dir=tmp_path / "z_out",
            output_type="zarr",
        )
        group = ZarrGroup(zarr_path)
        assert np.allclose(
            np.asarray(group["probabilities"]), as_dict["probabilities"], atol=1e-6
        )
        assert np.array_equal(
            np.asarray(group["predictions"]), as_dict["predictions"]
        )

    def test_labels_returned(self, small_model, patches) -> None:
        predictor = PatchPredictor(small_model, batch_size=4, verbose=False)
        out = predictor.run(
            patches,
            labels=list(range(len(patches))),
            patch_mode=True,
            return_labels=True,
        )
        assert list(out["labels"]) == list(range(len(patches)))

    def test_path_list_inputs(self, small_model, tmp_path) -> None:
        from tiatoolbox_tpu.utils.misc import imwrite

        paths = []
        for i in range(3):
            p = tmp_path / f"p{i}.png"
            imwrite(p, synthetic_he_patch(size=(32, 32), seed=i))
            paths.append(p)
        predictor = PatchPredictor(small_model, batch_size=2, verbose=False)
        out = predictor.run(paths, patch_mode=True)
        assert out["probabilities"].shape == (3, 3)

    def test_save_predictions_unsupported_type(self, small_model) -> None:
        engine = MinimalEngine(small_model, verbose=False)
        with pytest.raises(ValueError, match="Unsupported output_type"):
            engine.save_predictions({}, "protobuf", save_dir=Path("/tmp"))

    def test_non_dict_output_requires_save_dir(self, small_model) -> None:
        engine = MinimalEngine(small_model, verbose=False)
        with pytest.raises(ValueError, match="save_dir"):
            engine.save_predictions({}, "zarr", save_dir=None)


class TestWSIModeOutputs:
    def test_multi_slide_results_keyed_per_image(
        self, small_model, slide_path, slide_path_b, tmp_path
    ) -> None:
        predictor = PatchPredictor(small_model, batch_size=16, verbose=False)
        results = predictor.run(
            [slide_path, slide_path_b],
            patch_mode=False,
            save_dir=tmp_path / "multi",
            output_type="zarr",
            **_wsi_kwargs(),
        )
        assert set(results) == {slide_path, slide_path_b}
        paths = set(results.values())
        assert len(paths) == 2
        for p in paths:
            assert Path(p).name.endswith(".zarr")

    def test_wsi_qupath_json(self, small_model, slide_path, tmp_path) -> None:
        predictor = PatchPredictor(small_model, batch_size=16, verbose=False)
        results = predictor.run(
            [slide_path],
            patch_mode=False,
            save_dir=tmp_path / "qp",
            output_type="qupath",
            **_wsi_kwargs(),
        )
        out = results[slide_path]
        assert Path(out).suffix == ".json"
        data = json.loads(Path(out).read_text())
        assert len(data["features"]) > 0

    def test_wsi_store_coordinates_scaled_to_baseline(
        self, small_model, slide_path, tmp_path
    ) -> None:
        # Read at half resolution: store coords must be scaled 2x back
        # to baseline space.
        predictor = PatchPredictor(small_model, batch_size=16, verbose=False)
        results = predictor.run(
            [slide_path],
            patch_mode=False,
            save_dir=tmp_path / "scaled",
            output_type="annotationstore",
            patch_input_shape=(32, 32),
            stride_shape=(32, 32),
            resolution=0.5,
            units="baseline",
        )
        store = SQLiteStore(results[slide_path])
        xs = [a.geometry.bounds[2] for a in store.values()]
        # Boxes are 32px at 0.5x → 64px at baseline.
        widths = {
            a.geometry.bounds[2] - a.geometry.bounds[0] for a in store.values()
        }
        assert widths == {64.0}
        assert max(xs) <= 1024

    def test_wsi_zarr_has_coordinates(self, small_model, slide_path, tmp_path) -> None:
        predictor = PatchPredictor(small_model, batch_size=16, verbose=False)
        results = predictor.run(
            [slide_path],
            patch_mode=False,
            save_dir=tmp_path / "coords",
            output_type="zarr",
            **_wsi_kwargs(),
        )
        group = ZarrGroup(results[slide_path])
        coords = np.asarray(group["coordinates"])
        probs = np.asarray(group["probabilities"])
        assert coords.shape == (probs.shape[0], 4)
        # Grid coordinates are unique and within the slide.
        assert len({tuple(c) for c in coords}) == len(coords)

    def test_output_file_override(self, small_model, slide_path, tmp_path) -> None:
        predictor = PatchPredictor(small_model, batch_size=16, verbose=False)
        results = predictor.run(
            [slide_path],
            patch_mode=False,
            save_dir=tmp_path / "named",
            output_type="zarr",
            output_file="custom.zarr",
            **_wsi_kwargs(),
        )
        assert Path(results[slide_path]).name == "custom.zarr"


class TestSemanticSegmentorOutputs:
    @pytest.fixture(scope="class")
    def tiny_unet(self) -> UNetModel:
        model = UNetModel(
            num_input_channels=3,
            num_output_channels=2,
            encoder="unet",
            encoder_levels=[8, 16],
        )
        model.init(input_shape=(1, 64, 64, 3))
        return model

    @pytest.fixture(scope="class")
    def seg_cfg(self) -> IOSegmentorConfig:
        return IOSegmentorConfig(
            input_resolutions=[{"units": "mpp", "resolution": 2.0}],
            output_resolutions=[{"units": "mpp", "resolution": 2.0}],
            patch_input_shape=(64, 64),
            patch_output_shape=(32, 32),
            stride_shape=(32, 32),
        )

    def test_ome_tiff_output(self, tiny_unet, slide_path, seg_cfg, tmp_path) -> None:
        seg = SemanticSegmentor(tiny_unet, batch_size=8, verbose=False)
        results = seg.run(
            [slide_path],
            patch_mode=False,
            ioconfig=seg_cfg,
            save_dir=tmp_path / "ome",
            output_type="ome-tiff",
        )
        out = Path(results[slide_path])
        assert out.name.endswith(".ome.tiff")
        from tiatoolbox_tpu.wsicore.wsireader import WSIReader

        reader = WSIReader.open(out)
        assert reader.info.slide_dimensions[0] > 0

    def test_annotationstore_output_polygons(
        self, tiny_unet, slide_path, seg_cfg, tmp_path
    ) -> None:
        seg = SemanticSegmentor(tiny_unet, batch_size=8, verbose=False)
        results = seg.run(
            [slide_path],
            patch_mode=False,
            ioconfig=seg_cfg,
            save_dir=tmp_path / "store",
            output_type="annotationstore",
        )
        store = SQLiteStore(results[slide_path])
        for ann in store.values():
            assert ann.geometry.area > 0
            assert "type" in ann.properties

    def test_probabilities_canvas_shape(self, tiny_unet, slide_path, seg_cfg) -> None:
        seg = SemanticSegmentor(tiny_unet, batch_size=8, verbose=False)
        results = seg.run(
            [slide_path], patch_mode=False, ioconfig=seg_cfg
        )
        out = results[slide_path]
        probs = np.asarray(out["probabilities"])
        # 0.5 mpp baseline read at 2.0 mpp → quarter scale of 1024x768.
        assert probs.shape[:2] == (192, 256)
        preds = np.asarray(out["predictions"])
        assert preds.shape == probs.shape[:2]


class TestNucleusDetectorHelpers:
    def test_make_points(self) -> None:
        pts = make_points(np.array([1.0, 2.0]), np.array([3.0, 4.0]))
        assert len(pts) == 2
        assert pts[0].bounds[:2] == (1.0, 3.0)

    def test_qupath_detection_json(self, tmp_path) -> None:
        p = tmp_path / "det.json"
        save_detection_arrays_to_qupath_json(
            {
                "coordinates": np.array([[5.0, 6.0]]),
                "scores": np.array([0.75]),
                "types": np.array([1]),
            },
            scale_factor=(2.0, 2.0),
            class_dict={1: "lymphocyte"},
            save_path=p,
        )
        data = json.loads(p.read_text())
        feats = data["features"]
        assert feats[0]["geometry"]["type"] == "Point"
        assert feats[0]["geometry"]["coordinates"] == [10.0, 12.0]
        assert feats[0]["properties"]["classification"]["name"] == "lymphocyte"
        assert feats[0]["properties"]["measurements"][0]["value"] == 0.75

    def test_detector_patch_mode_detections(self) -> None:
        from tiatoolbox_tpu.models.architecture.mapde import MapDe

        model = MapDe(num_classes=1, min_distance=4, threshold_abs=0.25)
        model.init()
        detector = NucleusDetector(model, batch_size=1, verbose=False)
        patches = np.stack(
            [synthetic_he_patch(size=(252, 252), seed=i) for i in range(2)]
        )
        out = detector.run(patches, patch_mode=True)
        assert len(out["detections"]) == 2
        for det in out["detections"]:
            assert det["coordinates"].shape[1] == 2 or det["coordinates"].size == 0
