"""User-facing reference symbols added for drop-in migration
(IDaRS, TimmModel, OpenSlideWSIReader factory, sniffers, ui_utils,
env detection, SQLiteMetadata, WSIReaderParams, colourise_image,
small_svs, patch_predictions_as_qupath_json, load_torch_model)."""

from __future__ import annotations

import numpy as np
import pytest


class TestIdars:
    def test_preproc_recipe(self) -> None:
        from tiatoolbox_tpu.models.architecture.idars import IDaRS, idars_preproc

        img = np.full((4, 4, 3), 255, np.uint8)
        out = idars_preproc(img)
        # (1.0 - 0.5) / 0.1 = 5.0 — the sharp IDaRS stretch
        np.testing.assert_allclose(out, 5.0)
        assert out.dtype == np.float32
        assert IDaRS.preproc(img).max() == pytest.approx(5.0)

    def test_registry_entry_loads_with_idars_preproc(self) -> None:
        """`dataset: idars` registry entries previously raised in
        predefined_preproc_func; they must build with the recipe."""
        from tiatoolbox_tpu.models.architecture import get_pretrained_model

        model, ioconfig = get_pretrained_model("resnet18-idars-braf")
        img = np.full((8, 8, 3), 255, np.uint8)
        np.testing.assert_allclose(model.preproc_func(img), 5.0)
        assert tuple(ioconfig.patch_input_shape) == (224, 224)

    def test_forward_shape(self) -> None:
        from tiatoolbox_tpu.models.architecture.idars import IDaRS

        model = IDaRS("resnet18", num_classes=2)
        model.init(input_shape=(1, 64, 64, 3))
        out = IDaRS.infer_batch(
            model, np.zeros((2, 64, 64, 3), np.uint8)
        )
        assert np.asarray(out).shape == (2, 2)

    def test_engine_values_match_direct_forward(self) -> None:
        """End-to-end VALUE check: the engine path (host idars preproc
        → float batch → device program) must equal the module applied
        to the preprocessed input — regression for the double-/255 the
        uint8 wire path used to apply on already-normalized floats."""
        import jax.numpy as jnp

        from tiatoolbox_tpu.models.architecture import get_pretrained_model
        from tiatoolbox_tpu.models.engine.patch_predictor import PatchPredictor

        model, ioconfig = get_pretrained_model("resnet18-idars-braf")
        rng = np.random.default_rng(0)
        patches = rng.integers(0, 255, (4, 96, 96, 3), np.uint8)
        pred = PatchPredictor(model=model, batch_size=2, verbose=False)
        out = pred.run(patches, patch_mode=True, ioconfig=ioconfig)
        got = np.asarray(out["probabilities"])
        pre = np.stack([model.preproc_func(p) for p in patches])
        ref = np.asarray(
            model.module.apply(
                model.variables, jnp.asarray(pre, model.compute_dtype)
            )
        )
        np.testing.assert_allclose(got, ref, atol=1e-5)
        # and the values genuinely depend on the preproc (a /255'd
        # input gives different outputs)
        wrong = np.asarray(
            model.module.apply(
                model.variables, jnp.asarray(pre / 255.0, model.compute_dtype)
            )
        )
        assert not np.allclose(got, wrong, atol=1e-3)


class TestTimmModel:
    def test_classifier_head(self) -> None:
        from tiatoolbox_tpu.models.architecture.vit import TimmModel

        model = TimmModel("efficientnet_b0", num_classes=3)
        model.init(input_shape=(1, 64, 64, 3))
        out = TimmModel.infer_batch(model, np.zeros((2, 64, 64, 3), np.uint8))
        assert out.shape == (2, 3)
        np.testing.assert_allclose(out.sum(axis=-1), 1.0, rtol=1e-5)

    def test_unknown_backbone_raises(self) -> None:
        from tiatoolbox_tpu.models.architecture.vit import TimmModel

        with pytest.raises(ValueError, match="not supported"):
            TimmModel("definitely-not-a-backbone")


class TestReaderShims:
    @pytest.fixture(scope="class")
    def slide_path(self, tmp_path_factory):
        from tiatoolbox_tpu.data.synth import make_synthetic_slide

        path = tmp_path_factory.mktemp("shims") / "s.svs"
        make_synthetic_slide(path, size=(512, 384), mpp=0.5)
        return path

    def test_openslide_reader_factory(self, slide_path) -> None:
        from tiatoolbox_tpu.wsicore.wsireader import (
            OpenSlideWSIReader,
            TIFFWSIReader,
        )

        reader = OpenSlideWSIReader(slide_path)
        assert isinstance(reader, TIFFWSIReader)
        assert reader.read_rect((0, 0), (64, 64), 0, "level").shape == (64, 64, 3)

    def test_openslide_reader_rejects_other_formats(self, tmp_path) -> None:
        from tiatoolbox_tpu.data.synth import make_synthetic_dicom
        from tiatoolbox_tpu.utils.exceptions import FileNotSupportedError
        from tiatoolbox_tpu.wsicore.wsireader import OpenSlideWSIReader

        dcm = tmp_path / "s.dcm"
        make_synthetic_dicom(dcm, size=(128, 128), frame_size=64, mpp=0.5)
        with pytest.raises(FileNotSupportedError):
            OpenSlideWSIReader(dcm)

    def test_sniffers(self, slide_path, tmp_path) -> None:
        from tiatoolbox_tpu.data.synth import make_synthetic_dicom
        from tiatoolbox_tpu.wsicore.wsireader import is_dicom, is_tiled_tiff

        assert is_tiled_tiff(slide_path)
        assert not is_dicom(slide_path)
        dcm = tmp_path / "s.dcm"
        make_synthetic_dicom(dcm, size=(128, 128), frame_size=64, mpp=0.5)
        assert is_dicom(dcm)
        assert not is_tiled_tiff(dcm)


class TestSmallShims:
    def test_ui_utils_level_by_extent(self) -> None:
        from tiatoolbox_tpu.visualization.ui_utils import (
            get_level_by_extent,
            resolutions,
        )

        assert get_level_by_extent((0, 0, 1e9, 1e9)) == 0
        assert get_level_by_extent((0, 0, 10, 10)) == len(resolutions) - 1
        levels = [
            get_level_by_extent((0, 0, w, w * 0.6))
            for w in (1e8, 1e6, 1e4, 1e2)
        ]
        assert levels == sorted(levels)  # zooming in → finer levels

    def test_env_detection(self, monkeypatch) -> None:
        from tiatoolbox_tpu.utils import env_detection as env

        assert env.is_notebook() is False
        assert env.version_to_tuple("1.2.3") == (1, 2, 3)
        assert env.version_to_tuple("0.38.4-rc1") == (0, 38, 4)
        monkeypatch.setenv("GITHUB_ACTIONS", "true")
        assert env.running_on_github()
        monkeypatch.setenv("COLAB_GPU", "1")
        assert env.running_on_colab() and env.colab_has_gpu()

    def test_sqlite_metadata_alias(self) -> None:
        from tiatoolbox_tpu.annotation.storage import (
            SQLiteMetadata,
            SQLiteStore,
        )

        store = SQLiteStore(":memory:")
        assert isinstance(store.metadata, SQLiteMetadata)

    def test_wsireader_params_typeddict(self) -> None:
        from tiatoolbox_tpu.wsicore import WSIReaderParams

        params: WSIReaderParams = {"mpp": (0.5, 0.5)}
        assert params["mpp"] == (0.5, 0.5)

    def test_colourise_image(self) -> None:
        from tiatoolbox_tpu.utils.visualization import colourise_image

        grey = np.linspace(0, 1, 64 * 64, dtype=np.float32).reshape(64, 64)
        rgb = colourise_image(grey)
        assert rgb.shape == (64, 64, 3) and rgb.dtype == np.uint8
        already = np.zeros((8, 8, 3), np.uint8)
        assert colourise_image(already) is already

    def test_small_svs(self) -> None:
        from tiatoolbox_tpu.data import small_svs
        from tiatoolbox_tpu.wsicore.wsireader import WSIReader

        path = small_svs()
        reader = WSIReader.open(path)
        assert tuple(reader.info.slide_dimensions) == (1024, 768)

    def test_patch_predictions_as_qupath_json(self) -> None:
        from tiatoolbox_tpu.utils.store_conversion import (
            patch_predictions_as_qupath_json,
        )

        out = patch_predictions_as_qupath_json(
            preds=[0, 1, 0],
            class_dict={0: "tumour", 1: "stroma"},
            patch_coords=[(0, 0, 10, 10), (10, 0, 20, 10), (0, 10, 10, 20)],
        )
        assert out["type"] == "FeatureCollection"
        assert len(out["features"]) == 3
        f = out["features"][1]
        assert f["properties"]["classification"]["name"] == "stroma"
        assert len(f["properties"]["classification"]["color"]) == 3

    def test_load_torch_model_alias(self, tmp_path) -> None:
        from tiatoolbox_tpu.models.architecture.vanilla import CNNModel
        from tiatoolbox_tpu.models.architecture.weight_converter import (
            save_flax_npz,
        )
        from tiatoolbox_tpu.models.models_abc import load_torch_model

        src = CNNModel("resnet18", num_classes=3)
        src.init(input_shape=(1, 64, 64, 3))
        ckpt = tmp_path / "w.npz"
        save_flax_npz(src.variables, ckpt)
        dst = CNNModel("resnet18", num_classes=3)
        out = load_torch_model(dst, ckpt)
        assert out is dst
        ref = CNNModel.infer_batch(src, np.zeros((1, 64, 64, 3), np.uint8))
        got = CNNModel.infer_batch(dst, np.zeros((1, 64, 64, 3), np.uint8))
        np.testing.assert_allclose(got, ref, atol=1e-6)
