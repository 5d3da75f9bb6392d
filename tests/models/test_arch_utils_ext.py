"""Extended architecture-utils + detection-postproc coverage
(reference ``tests/models/test_arch_utils.py`` / detection arch tests).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from tiatoolbox_tpu.models.architecture.utils import (
    centre_crop,
    centre_crop_to_shape,
    compile_model,
    is_torch_compile_compatible,
    nms_on_detection_maps,
    peak_detection_map_overlap,
    resize_bilinear,
    upsample2x,
)


class TestCrops:
    def test_centre_crop_nhwc(self) -> None:
        x = np.arange(2 * 8 * 8 * 1).reshape(2, 8, 8, 1)
        out = centre_crop(x, (4, 4))
        assert out.shape == (2, 4, 4, 1)
        assert np.array_equal(out, x[:, 2:6, 2:6, :])

    def test_centre_crop_odd_margin(self) -> None:
        x = np.zeros((1, 9, 9, 1))
        out = centre_crop(x, (3, 3))
        assert out.shape == (1, 6, 6, 1)

    def test_centre_crop_nchw(self) -> None:
        x = np.zeros((1, 3, 8, 8))
        out = centre_crop(x, (2, 2), data_format="NCHW")
        assert out.shape == (1, 3, 6, 6)

    def test_centre_crop_bad_format(self) -> None:
        with pytest.raises(ValueError, match="Unknown input format"):
            centre_crop(np.zeros((1, 4, 4, 1)), (2, 2), data_format="HWCN")

    def test_centre_crop_to_shape(self) -> None:
        x = np.zeros((1, 10, 12, 2))
        y = np.zeros((1, 6, 6, 2))
        out = centre_crop_to_shape(x, y)
        assert out.shape == (1, 6, 6, 2)

    def test_centre_crop_to_shape_equal_passthrough(self) -> None:
        x = np.zeros((1, 6, 6, 2))
        assert centre_crop_to_shape(x, x) is x

    def test_centre_crop_to_shape_smaller_x_raises(self) -> None:
        with pytest.raises(ValueError, match="smaller"):
            centre_crop_to_shape(np.zeros((1, 4, 4, 1)), np.zeros((1, 8, 8, 1)))


class TestUpsample:
    def test_upsample2x_nearest(self) -> None:
        x = jnp.asarray(np.arange(4, dtype=np.float32).reshape(1, 2, 2, 1))
        out = np.asarray(upsample2x(x))
        assert out.shape == (1, 4, 4, 1)
        # input [[0,1],[2,3]]: each pixel becomes a 2x2 block
        assert np.array_equal(out[0, :2, :2, 0], [[0, 0], [0, 0]])
        assert np.array_equal(out[0, :2, 2:, 0], [[1, 1], [1, 1]])
        assert np.array_equal(out[0, 2:, 2:, 0], [[3, 3], [3, 3]])

    def test_resize_bilinear_shape(self) -> None:
        x = jnp.zeros((2, 8, 8, 3))
        out = resize_bilinear(x, scale=4)
        assert out.shape == (2, 32, 32, 3)


class TestPeaksAndNMS:
    def test_peaks_found_at_maxima(self) -> None:
        det = np.zeros((64, 64), np.float32)
        det[10, 10] = 0.9
        det[40, 50] = 0.8
        coords = peak_detection_map_overlap(det, min_distance=3,
                                            threshold_abs=0.5)
        assert sorted(coords.tolist()) == [[10, 10], [40, 50]]

    def test_peaks_sorted_by_intensity(self) -> None:
        det = np.zeros((32, 32), np.float32)
        det[5, 5] = 0.6
        det[20, 20] = 0.95
        coords = peak_detection_map_overlap(det, min_distance=2,
                                            threshold_abs=0.5)
        assert coords[0].tolist() == [20, 20]

    def test_nearby_peaks_suppressed_by_window(self) -> None:
        det = np.zeros((32, 32), np.float32)
        det[10, 10] = 0.9
        det[10, 13] = 0.8  # within the window of the stronger peak
        coords = peak_detection_map_overlap(det, min_distance=4,
                                            threshold_abs=0.5)
        assert coords.tolist() == [[10, 10]]

    def test_threshold_filters(self) -> None:
        det = np.full((16, 16), 0.4, np.float32)
        det[8, 8] = 0.45
        coords = peak_detection_map_overlap(det, min_distance=2,
                                            threshold_abs=0.5)
        assert len(coords) == 0

    def test_nms_keeps_highest_in_radius(self) -> None:
        coords = np.array([[0, 0], [0, 3], [20, 20]])
        scores = np.array([0.5, 0.9, 0.7])
        kept = nms_on_detection_maps(coords, scores, radius=5.0)
        assert set(kept.tolist()) == {1, 2}

    def test_nms_empty(self) -> None:
        assert len(nms_on_detection_maps(np.zeros((0, 2)), np.zeros(0), 5)) == 0

    def test_nms_no_suppression_when_far(self) -> None:
        coords = np.array([[0, 0], [100, 100], [200, 0]])
        kept = nms_on_detection_maps(coords, [0.1, 0.2, 0.3], radius=5)
        assert len(kept) == 3


class TestDetectorPostproc:
    def test_mapde_postproc_marks_peaks(self) -> None:
        from tiatoolbox_tpu.models.architecture.mapde import MapDe

        model = MapDe(num_input_channels=3)
        block = np.zeros((128, 128, 1), np.float32)
        block[30, 40, 0] = 5.0
        block[90, 100, 0] = 6.0
        out = model.postproc(block, min_distance=6, threshold_abs=0.5)
        assert out.shape == block.shape
        assert out[30, 40, 0] == 1.0
        assert out[90, 100, 0] == 1.0
        assert out.sum() == 2.0

    def test_sccnn_postproc(self) -> None:
        from tiatoolbox_tpu.models.architecture.sccnn import SCCNN

        model = SCCNN(num_input_channels=3)
        block = np.zeros((64, 64, 1), np.float32)
        block[20, 20, 0] = 0.99
        out = model.postproc(block)
        assert out[20, 20, 0] == 1.0


class TestCompileShims:
    def test_is_torch_compile_compatible(self) -> None:
        assert is_torch_compile_compatible() is True

    def test_compile_model_passthrough(self) -> None:
        sentinel = object()
        assert compile_model(sentinel) is sentinel

    def test_compile_model_bad_mode(self) -> None:
        with pytest.raises(ValueError, match="Invalid mode"):
            compile_model(None, mode="turbo")
