"""Tests for WSIMeta resolution algebra."""

from __future__ import annotations

import numpy as np
import pytest

from tiatoolbox_tpu.wsicore.wsimeta import WSIMeta


def make_meta(**kwargs) -> WSIMeta:
    defaults = dict(
        slide_dimensions=(1024, 768),
        axes="YXS",
        level_dimensions=[(1024, 768), (512, 384), (256, 192)],
        level_downsamples=[1, 2, 4],
        mpp=(0.5, 0.5),
        objective_power=20,
        vendor="synthetic",
        raw={},
    )
    defaults.update(kwargs)
    return WSIMeta(**defaults)


def test_basic_attributes() -> None:
    meta = make_meta()
    assert meta.slide_dimensions == (1024, 768)
    assert meta.level_count == 3
    assert meta.level_downsample(1) == 2.0
    assert meta.level_downsample(0.5) == pytest.approx(1.5)


def test_relative_level_scales_baseline() -> None:
    meta = make_meta()
    scales = meta.relative_level_scales(0.5, "baseline")
    assert np.allclose(scales, [[0.5, 0.5], [1.0, 1.0], [2.0, 2.0]])


def test_relative_level_scales_mpp() -> None:
    meta = make_meta()
    scales = meta.relative_level_scales(0.5, "mpp")
    # level 0 is at 0.5 mpp → scale 1; level 1 at 1.0 mpp → scale 2
    assert np.allclose(scales, [[1, 1], [2, 2], [4, 4]])


def test_relative_level_scales_power() -> None:
    meta = make_meta()
    scales = meta.relative_level_scales(20, "power")
    assert np.allclose(scales[0], [1, 1])
    assert np.allclose(scales[2], [4, 4])


def test_relative_level_scales_level() -> None:
    meta = make_meta()
    scales = meta.relative_level_scales(1, "level")
    assert np.allclose(scales, [[0.5, 0.5], [1, 1], [2, 2]])
    with pytest.raises(ValueError, match="Target scale level"):
        meta.relative_level_scales(5, "level")


def test_invalid_units() -> None:
    meta = make_meta()
    with pytest.raises(ValueError, match="Invalid units"):
        meta.relative_level_scales(1, "parsecs")


def test_missing_mpp_raises() -> None:
    meta = make_meta(mpp=None)
    with pytest.raises(ValueError, match="MPP is None"):
        meta.relative_level_scales(0.5, "mpp")


def test_validate_mismatched_levels() -> None:
    meta = make_meta()
    meta.level_downsamples = [1]
    assert not meta.validate()


def test_as_dict_roundtrip() -> None:
    meta = make_meta()
    d = meta.as_dict()
    assert d["slide_dimensions"] == (1024, 768)
    assert d["axes"] == "YXS"
