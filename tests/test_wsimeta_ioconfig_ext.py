"""Extended WSIMeta + ModelIOConfig coverage.

Scenario set modeled on the reference's ``tests/test_wsimeta.py`` and
the io_config sections of ``tests/engines/test_engine_abc.py``.
"""

from __future__ import annotations

import numpy as np
import pytest

from tiatoolbox_tpu.models.engine.io_config import (
    IOInstanceSegmentorConfig,
    IOPatchPredictorConfig,
    IOSegmentorConfig,
    ModelIOConfigABC,
)
from tiatoolbox_tpu.wsicore.wsimeta import WSIMeta


def make_meta(**kwargs):
    defaults = {
        "slide_dimensions": (1024, 768),
        "axes": "YXS",
        "level_dimensions": [(1024, 768), (512, 384), (256, 192)],
        "level_downsamples": [1.0, 2.0, 4.0],
        "mpp": (0.5, 0.5),
        "objective_power": 20,
        "raw": {},
    }
    defaults.update(kwargs)
    return WSIMeta(**defaults)


class TestWSIMetaExt:
    def test_level_downsample_integer(self) -> None:
        meta = make_meta()
        assert meta.level_downsample(0) == 1.0
        assert meta.level_downsample(2) == 4.0

    def test_level_downsample_fractional_interpolates(self) -> None:
        meta = make_meta()
        assert meta.level_downsample(0.5) == pytest.approx(1.5)
        assert meta.level_downsample(1.5) == pytest.approx(3.0)

    def test_relative_level_scales_anisotropic_mpp(self) -> None:
        meta = make_meta(mpp=(0.25, 0.5))
        scales = meta.relative_level_scales((0.5, 0.5), "mpp")
        assert np.allclose(scales[0], [0.5, 1.0])

    def test_relative_level_scales_level_out_of_range(self) -> None:
        meta = make_meta()
        with pytest.raises(ValueError, match="number of levels"):
            meta.relative_level_scales(5, "level")

    def test_relative_level_scales_power_missing(self) -> None:
        meta = make_meta(objective_power=None)
        with pytest.raises(ValueError, match="[Oo]bjective power"):
            meta.relative_level_scales(10, "power")

    def test_relative_level_scales_fractional_level(self) -> None:
        meta = make_meta()
        scales = meta.relative_level_scales(0.5, "level")
        # target downsample 1.5: level 0 is 1/1.5 of the target scale
        assert np.allclose(scales[0], [1 / 1.5, 1 / 1.5])
        assert np.allclose(scales[1], [2 / 1.5, 2 / 1.5])

    def test_validate_bad_axes_warns_and_fails(self) -> None:
        meta = make_meta()
        meta.axes = "QQ"
        assert meta.validate() is False

    def test_validate_level_count_mismatch(self) -> None:
        meta = make_meta()
        meta.level_count = 7
        assert meta.validate() is False

    def test_validate_good_meta_passes(self) -> None:
        assert make_meta().validate() is True

    def test_as_dict_fields(self) -> None:
        d = make_meta().as_dict()
        assert tuple(d["slide_dimensions"]) == (1024, 768)
        assert d["objective_power"] == 20
        assert tuple(d["mpp"]) == (0.5, 0.5)
        assert len(d["level_downsamples"]) == 3

    def test_as_dict_none_mpp(self) -> None:
        d = make_meta(mpp=None, objective_power=40).as_dict()
        assert d["mpp"] == (None, None)

    def test_defaults_single_level(self) -> None:
        meta = WSIMeta(
            slide_dimensions=(100, 50), axes="YXS", raw={}, mpp=(1, 1)
        )
        assert meta.level_dimensions == [(100, 50)]
        assert meta.level_downsamples == [1.0]
        assert meta.level_count == 1


class TestModelIOConfig:
    def test_stride_defaults_to_patch(self) -> None:
        cfg = ModelIOConfigABC(
            input_resolutions=[{"units": "mpp", "resolution": 0.5}],
            patch_input_shape=(224, 224),
        )
        assert tuple(cfg.stride_shape) == (224, 224)

    def test_highest_input_resolution_mpp_is_min(self) -> None:
        cfg = ModelIOConfigABC(
            input_resolutions=[
                {"units": "mpp", "resolution": 0.5},
                {"units": "mpp", "resolution": 0.25},
            ],
            patch_input_shape=(224, 224),
        )
        assert cfg.highest_input_resolution["resolution"] == 0.25

    def test_highest_input_resolution_power_is_max(self) -> None:
        cfg = ModelIOConfigABC(
            input_resolutions=[
                {"units": "power", "resolution": 20},
                {"units": "power", "resolution": 40},
            ],
            patch_input_shape=(224, 224),
        )
        assert cfg.highest_input_resolution["resolution"] == 40

    def test_mixed_units_raise(self) -> None:
        with pytest.raises(ValueError, match="[Mm]ixing resolution units"):
            ModelIOConfigABC(
                input_resolutions=[
                    {"units": "mpp", "resolution": 0.5},
                    {"units": "power", "resolution": 20},
                ],
                patch_input_shape=(224, 224),
            )

    def test_invalid_units_raise(self) -> None:
        with pytest.raises(ValueError, match="[Ii]nvalid resolution units"):
            ModelIOConfigABC(
                input_resolutions=[{"units": "parsec", "resolution": 1}],
                patch_input_shape=(224, 224),
            )

    def test_scale_to_highest_mpp(self) -> None:
        scales = ModelIOConfigABC.scale_to_highest(
            [
                {"units": "mpp", "resolution": 0.25},
                {"units": "mpp", "resolution": 0.5},
                {"units": "mpp", "resolution": 1.0},
            ],
            "mpp",
        )
        assert np.allclose(scales, [1.0, 0.5, 0.25])

    def test_scale_to_highest_power(self) -> None:
        scales = ModelIOConfigABC.scale_to_highest(
            [
                {"units": "power", "resolution": 40},
                {"units": "power", "resolution": 10},
            ],
            "power",
        )
        assert np.allclose(scales, [1.0, 0.25])

    def test_scale_to_highest_baseline_passthrough(self) -> None:
        scales = ModelIOConfigABC.scale_to_highest(
            [{"units": "baseline", "resolution": 0.5}], "baseline"
        )
        assert np.allclose(scales, [0.5])

    def test_scale_to_highest_bad_units(self) -> None:
        with pytest.raises(ValueError, match="Unknown units"):
            ModelIOConfigABC.scale_to_highest(
                [{"units": "level", "resolution": 0}], "level"
            )

    def test_to_baseline_mpp(self) -> None:
        cfg = IOSegmentorConfig(
            input_resolutions=[
                {"units": "mpp", "resolution": 0.25},
                {"units": "mpp", "resolution": 0.5},
            ],
            output_resolutions=[{"units": "mpp", "resolution": 1.0}],
            patch_input_shape=(256, 256),
            patch_output_shape=(164, 164),
            stride_shape=(164, 164),
            save_resolution={"units": "mpp", "resolution": 4.0},
        )
        base = cfg.to_baseline()
        assert base.input_resolutions[0] == {
            "units": "baseline", "resolution": 1.0,
        }
        assert base.input_resolutions[1]["resolution"] == pytest.approx(0.5)
        assert base.output_resolutions[0]["resolution"] == pytest.approx(0.25)
        assert base.save_resolution["resolution"] == pytest.approx(0.0625)
        # original untouched
        assert cfg.input_resolutions[0]["units"] == "mpp"

    def test_to_baseline_preserves_shapes(self) -> None:
        cfg = IOSegmentorConfig(
            input_resolutions=[{"units": "power", "resolution": 20}],
            output_resolutions=[{"units": "power", "resolution": 20}],
            patch_input_shape=(128, 128),
            patch_output_shape=(64, 64),
            stride_shape=(96, 96),
        )
        base = cfg.to_baseline()
        assert tuple(base.patch_input_shape) == (128, 128)
        assert tuple(base.patch_output_shape) == (64, 64)
        assert tuple(base.stride_shape) == (96, 96)

    def test_patch_predictor_config_is_abc_subclass(self) -> None:
        cfg = IOPatchPredictorConfig(
            input_resolutions=[{"units": "mpp", "resolution": 0.5}],
            patch_input_shape=(224, 224),
        )
        assert isinstance(cfg, ModelIOConfigABC)

    def test_instance_segmentor_config_margin_tile(self) -> None:
        cfg = IOInstanceSegmentorConfig(
            input_resolutions=[{"units": "mpp", "resolution": 0.25}],
            output_resolutions=[{"units": "mpp", "resolution": 0.25}],
            patch_input_shape=(256, 256),
            patch_output_shape=(164, 164),
            stride_shape=(164, 164),
            margin=128,
            tile_shape=(2048, 2048),
        )
        assert cfg.margin == 128
        assert tuple(cfg.tile_shape) == (2048, 2048)
        base = cfg.to_baseline()
        assert base.margin == 128
