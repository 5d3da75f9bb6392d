"""Tests for patch extraction grid math and extractors."""

from __future__ import annotations

import numpy as np
import pytest

from tiatoolbox_tpu.data.synth import synthetic_he_patch
from tiatoolbox_tpu.tools.patchextraction import (
    PatchExtractor,
    PointsPatchExtractor,
    SlidingWindowPatchExtractor,
    get_patch_extractor,
)
from tiatoolbox_tpu.utils.exceptions import MethodNotSupportedError
from tiatoolbox_tpu.wsicore.wsireader import VirtualWSIReader


class TestGetCoordinates:
    def test_basic_grid(self) -> None:
        coords = PatchExtractor.get_coordinates(
            image_shape=(100, 100),
            patch_input_shape=(50, 50),
            stride_shape=(50, 50),
        )
        assert coords.shape == (4, 4)
        assert coords[0].tolist() == [0, 0, 50, 50]
        assert coords[-1].tolist() == [50, 50, 100, 100]

    def test_overhang_included_by_default(self) -> None:
        coords = PatchExtractor.get_coordinates(
            image_shape=(100, 100),
            patch_input_shape=(60, 60),
            stride_shape=(60, 60),
        )
        # 2x2 grid; second patch ends at 120 > 100 but kept
        assert coords.shape == (4, 4)
        assert coords[-1].tolist() == [60, 60, 120, 120]

    def test_input_within_bound(self) -> None:
        coords = PatchExtractor.get_coordinates(
            image_shape=(100, 100),
            patch_input_shape=(60, 60),
            stride_shape=(60, 60),
            input_within_bound=True,
        )
        assert coords.shape == (1, 4)

    def test_input_output_grids(self) -> None:
        inputs, outputs = PatchExtractor.get_coordinates(
            patch_output_shape=(20, 20),
            image_shape=(100, 100),
            patch_input_shape=(40, 40),
            stride_shape=(20, 20),
        )
        assert inputs.shape == outputs.shape
        # input grid is centred around output grid
        assert np.all(inputs[:, :2] == outputs[:, :2] - 10)

    def test_invalid_shapes(self) -> None:
        with pytest.raises(ValueError, match="image_shape"):
            PatchExtractor.get_coordinates(
                image_shape=(-1, 100),
                patch_input_shape=(50, 50),
                stride_shape=(50, 50),
            )
        with pytest.raises(ValueError, match="must larger"):
            PatchExtractor.get_coordinates(
                patch_output_shape=(60, 60),
                image_shape=(100, 100),
                patch_input_shape=(50, 50),
                stride_shape=(50, 50),
            )
        with pytest.raises(ValueError, match="stride"):
            PatchExtractor.get_coordinates(
                image_shape=(100, 100),
                patch_input_shape=(50, 50),
                stride_shape=(0, 0),
            )


class TestSlidingWindow:
    def test_extract_from_array(self) -> None:
        img = synthetic_he_patch((256, 256), seed=0)
        ex = SlidingWindowPatchExtractor(img, patch_size=(128, 128))
        assert len(ex) == 4
        patches = list(ex)
        assert all(p.shape == (128, 128, 3) for p in patches)
        assert np.array_equal(patches[0], img[:128, :128])

    def test_stride_overlap(self) -> None:
        img = synthetic_he_patch((256, 256), seed=0)
        ex = SlidingWindowPatchExtractor(img, patch_size=(128, 128), stride=(64, 64))
        assert len(ex) == 16

    def test_mask_filtering(self) -> None:
        img = synthetic_he_patch((256, 256), seed=0)
        mask = np.zeros((256, 256), dtype=np.uint8)
        mask[:128, :128] = 1  # only top-left quadrant
        mask_reader = VirtualWSIReader(
            mask, info=VirtualWSIReader(img).info, mode="bool"
        )
        ex = SlidingWindowPatchExtractor(
            img, patch_size=(128, 128), input_mask=mask_reader, min_mask_ratio=0.5
        )
        assert len(ex) == 1

    def test_getitem_bounds(self) -> None:
        img = synthetic_he_patch((256, 256), seed=0)
        ex = SlidingWindowPatchExtractor(img, patch_size=(128, 128))
        with pytest.raises(IndexError):
            ex[99]
        with pytest.raises(TypeError):
            ex["a"]


class TestPointsExtractor:
    def test_points(self) -> None:
        img = synthetic_he_patch((256, 256), seed=0)
        points = np.array([[128, 128], [64, 64]])
        ex = PointsPatchExtractor(img, locations_list=points, patch_size=(32, 32))
        assert len(ex) == 2
        p = ex[0]
        assert p.shape == (32, 32, 3)
        # centred: starts at 128 - 15
        assert np.array_equal(p, img[113:145, 113:145])


def test_factory() -> None:
    img = synthetic_he_patch((128, 128), seed=0)
    ex = get_patch_extractor(
        "slidingwindow", input_img=img, patch_size=(64, 64)
    )
    assert isinstance(ex, SlidingWindowPatchExtractor)
    with pytest.raises(MethodNotSupportedError):
        get_patch_extractor("bogus", input_img=img, patch_size=(64, 64))
