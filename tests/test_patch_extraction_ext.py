"""Extended patch-extraction + read_locations coverage (reference
``tests/test_patch_extraction.py`` / ``test_utils.py`` scenarios)."""

from __future__ import annotations

import json

import numpy as np
import pytest

from tiatoolbox_tpu.data.synth import synthetic_he_patch
from tiatoolbox_tpu.tools.patchextraction import (
    PointsPatchExtractor,
    SlidingWindowPatchExtractor,
    get_patch_extractor,
)
from tiatoolbox_tpu.utils.exceptions import (
    FileNotSupportedError,
    MethodNotSupportedError,
)
from tiatoolbox_tpu.utils.misc import read_locations


@pytest.fixture(scope="module")
def img():
    return synthetic_he_patch((512, 384), seed=6)


class TestReadLocations:
    POINTS = np.array([[10, 20], [100, 200], [300, 150]])

    def test_ndarray_two_columns(self) -> None:
        df = read_locations(self.POINTS)
        assert list(df.columns) == ["x", "y", "class"]
        assert df["class"].isna().all() or (df["class"] == None).all()  # noqa: E711
        assert df["x"].tolist() == [10, 100, 300]

    def test_ndarray_three_columns(self) -> None:
        arr = np.column_stack([self.POINTS, [1, 2, 3]])
        df = read_locations(arr)
        assert df["class"].tolist() == [1, 2, 3]

    def test_ndarray_bad_columns_raises(self) -> None:
        with pytest.raises(ValueError, match="format"):
            read_locations(np.zeros((3, 4)))

    def test_csv_with_header(self, tmp_path) -> None:
        p = tmp_path / "pts.csv"
        p.write_text("x,y,class\n1,2,a\n3,4,b\n")
        df = read_locations(p)
        assert df["x"].tolist() == [1, 3]
        assert df["class"].tolist() == ["a", "b"]

    def test_csv_headerless(self, tmp_path) -> None:
        p = tmp_path / "pts2.csv"
        p.write_text("5,6,c\n7,8,d\n")
        df = read_locations(p)
        assert df["x"].tolist() == [5, 7]

    def test_npy(self, tmp_path) -> None:
        p = tmp_path / "pts.npy"
        np.save(p, self.POINTS)
        df = read_locations(p)
        assert df["y"].tolist() == [20, 200, 150]

    def test_json(self, tmp_path) -> None:
        p = tmp_path / "pts.json"
        p.write_text(json.dumps({"x": [1, 2], "y": [3, 4], "class": [0, 1]}))
        df = read_locations(p)
        assert df["x"].tolist() == [1, 2]

    def test_unsupported_suffix(self, tmp_path) -> None:
        p = tmp_path / "pts.xyz"
        p.write_text("1,2\n")
        with pytest.raises(FileNotSupportedError):
            read_locations(p)

    def test_dataframe_passthrough(self) -> None:
        import pandas as pd

        df_in = pd.DataFrame({"a": [1], "b": [2]})
        df = read_locations(df_in)
        assert list(df.columns) == ["x", "y", "class"]


class TestSlidingWindowExtra:
    def test_iteration_protocol(self, img) -> None:
        ext = SlidingWindowPatchExtractor(
            img, patch_size=(128, 128), stride=(128, 128)
        )
        patches = list(ext)
        assert len(patches) == len(ext)
        assert all(p.shape == (128, 128, 3) for p in patches)

    def test_iter_matches_getitem(self, img) -> None:
        ext = SlidingWindowPatchExtractor(
            img, patch_size=(128, 128), stride=(64, 64)
        )
        for i, patch in enumerate(ext):
            if i >= 3:
                break
            assert np.array_equal(patch, ext[i])

    def test_getitem_out_of_range(self, img) -> None:
        ext = SlidingWindowPatchExtractor(img, patch_size=(128, 128))
        with pytest.raises(IndexError):
            ext[9999]

    def test_locations_df_populated(self, img) -> None:
        ext = SlidingWindowPatchExtractor(
            img, patch_size=(128, 128), stride=(128, 128)
        )
        assert len(ext.coordinate_list) == len(ext)

    def test_within_bound_drops_overhang(self, img) -> None:
        loose = SlidingWindowPatchExtractor(
            img, patch_size=(200, 200), stride=(200, 200)
        )
        tight = SlidingWindowPatchExtractor(
            img, patch_size=(200, 200), stride=(200, 200), within_bound=True
        )
        assert len(tight) < len(loose)
        # all tight coords are fully inside
        coords = np.asarray(tight.coordinate_list)
        assert (coords[:, 2] <= 512).all()
        assert (coords[:, 3] <= 384).all()


class TestPointsExtractor:
    def test_patches_centred_on_points(self, img) -> None:
        pts = np.array([[100, 100], [300, 200]])
        ext = PointsPatchExtractor(img, pts, patch_size=(65, 65))
        patch = ext[0]
        assert patch.shape == (65, 65, 3)
        # centre pixel of the patch equals the image pixel at the point
        assert np.array_equal(patch[32, 32], img[100, 100])

    def test_point_near_border_padded(self, img) -> None:
        ext = PointsPatchExtractor(
            img, np.array([[2, 2]]), patch_size=(65, 65),
            pad_constant_values=255,
        )
        patch = ext[0]
        assert patch.shape == (65, 65, 3)
        assert (patch[0, 0] == 255).all()

    def test_csv_input(self, img, tmp_path) -> None:
        p = tmp_path / "pts.csv"
        p.write_text("x,y,class\n100,100,0\n")
        ext = PointsPatchExtractor(img, p, patch_size=(33, 33))
        assert len(ext) == 1
        assert np.array_equal(ext[0][16, 16], img[100, 100])


class TestFactoryExt:
    def test_factory_kwargs_passthrough(self, img) -> None:
        ext = get_patch_extractor(
            "slidingwindow", input_img=img, patch_size=(128, 128),
            stride=(64, 64),
        )
        assert isinstance(ext, SlidingWindowPatchExtractor)

    def test_factory_point(self, img) -> None:
        ext = get_patch_extractor(
            "point", input_img=img, locations_list=np.array([[50, 50]]),
            patch_size=(33, 33),
        )
        assert isinstance(ext, PointsPatchExtractor)

    def test_factory_unknown_method(self) -> None:
        with pytest.raises(MethodNotSupportedError):
            get_patch_extractor("voronoi")
