"""Tests for host-side utils: transforms, image reads, misc."""

from __future__ import annotations

import numpy as np
import pytest

from tiatoolbox_tpu.utils import image as image_utils
from tiatoolbox_tpu.utils import misc, transforms


class TestTransforms:
    def test_rgb2od_od2rgb_roundtrip(self) -> None:
        rng = np.random.default_rng(0)
        img = rng.integers(1, 255, size=(32, 32, 3), dtype=np.uint8)
        od = transforms.rgb2od(img)
        back = transforms.od2rgb(od)
        assert np.abs(back.astype(int) - img.astype(int)).max() <= 1

    def test_rgb2od_zero_handling(self) -> None:
        img = np.zeros((4, 4, 3), dtype=np.uint8)
        od = transforms.rgb2od(img)
        assert np.all(od > 0)
        assert np.isfinite(od).all()

    def test_imresize_shrink_enlarge(self) -> None:
        img = np.arange(64 * 64 * 3, dtype=np.uint8).reshape(64, 64, 3)
        small = transforms.imresize(img, scale_factor=0.5)
        assert small.shape == (32, 32, 3)
        big = transforms.imresize(img, output_size=(128, 96))
        assert big.shape == (96, 128, 3)  # output_size is (w, h)

    def test_imresize_identity(self) -> None:
        img = np.random.default_rng(0).integers(0, 255, (16, 16), dtype=np.uint8)
        out = transforms.imresize(img, scale_factor=1.0)
        assert out is img

    def test_imresize_many_channels(self) -> None:
        img = np.random.default_rng(0).random((16, 16, 6)).astype(np.float32)
        out = transforms.imresize(img, scale_factor=0.5)
        assert out.shape == (8, 8, 6)

    def test_imresize_requires_arg(self) -> None:
        with pytest.raises(TypeError):
            transforms.imresize(np.zeros((4, 4)))

    def test_bounds_roundtrip(self) -> None:
        loc, size = transforms.bounds2locsize((5, 10, 15, 30))
        assert tuple(loc) == (5, 10)
        assert tuple(size) == (10, 20)
        assert transforms.locsize2bounds(loc, size) == (5, 10, 15, 30)

    def test_bounds2slices(self) -> None:
        slices = transforms.bounds2slices((5, 6, 10, 12))
        assert slices == (slice(6, 12, 1), slice(5, 10, 1))

    def test_pad_bounds(self) -> None:
        assert transforms.pad_bounds((0, 0, 10, 10), 1) == (-1, -1, 11, 11)

    def test_background_composite(self) -> None:
        img = np.zeros((8, 8, 4), dtype=np.uint8)
        img[:4, :, 3] = 255
        out = transforms.background_composite(img)
        assert out.shape == (8, 8, 3)
        assert np.all(out[4:] == 255)
        assert np.all(out[:4] == 0)


class TestSafePaddedRead:
    def setup_method(self) -> None:
        self.img = np.arange(100, dtype=np.uint8).reshape(10, 10)

    def test_within_bounds(self) -> None:
        out = image_utils.safe_padded_read(self.img, (2, 2, 5, 5))
        assert np.array_equal(out, self.img[2:5, 2:5])

    def test_negative_bounds_zero_pad(self) -> None:
        out = image_utils.safe_padded_read(self.img, (-2, -2, 3, 3))
        assert out.shape == (5, 5)
        assert np.all(out[:2, :] == 0)
        assert np.all(out[:, :2] == 0)
        assert np.array_equal(out[2:, 2:], self.img[:3, :3])

    def test_over_bounds_reflect(self) -> None:
        out = image_utils.safe_padded_read(self.img, (8, 8, 12, 12), pad_mode="reflect")
        assert out.shape == (4, 4)

    def test_pad_mode_none_crops(self) -> None:
        out = image_utils.safe_padded_read(self.img, (-2, -2, 3, 3), pad_mode="none")
        assert out.shape == (3, 3)

    def test_non_integer_bounds_raises(self) -> None:
        with pytest.raises(TypeError):
            image_utils.safe_padded_read(self.img, (0.5, 0, 5, 5))

    def test_negative_padding_raises(self) -> None:
        with pytest.raises(ValueError, match="negative"):
            image_utils.safe_padded_read(self.img, (0, 0, 5, 5), padding=-1)

    def test_extra_padding(self) -> None:
        out = image_utils.safe_padded_read(self.img, (2, 2, 5, 5), padding=1)
        assert out.shape == (5, 5)


class TestSubPixelRead:
    def setup_method(self) -> None:
        self.img = np.random.default_rng(0).integers(
            0, 255, (100, 100, 3), dtype=np.uint8
        )

    def test_integer_bounds_identity(self) -> None:
        out = image_utils.sub_pixel_read(
            self.img, (10, 10, 20, 20), output_size=(10, 10), pad_at_baseline=False
        )
        assert out.shape == (10, 10, 3)
        assert np.array_equal(out, self.img[10:20, 10:20])

    def test_fractional_bounds(self) -> None:
        out = image_utils.sub_pixel_read(
            self.img,
            (10.5, 10.5, 20.5, 20.5),
            output_size=(10, 10),
            pad_at_baseline=False,
        )
        assert out.shape == (10, 10, 3)

    def test_scaling(self) -> None:
        out = image_utils.sub_pixel_read(
            self.img, (0, 0, 10, 10), output_size=(20, 20), pad_at_baseline=False
        )
        assert out.shape == (20, 20, 3)

    def test_out_of_bounds_padded(self) -> None:
        out = image_utils.sub_pixel_read(
            self.img, (-5, -5, 5, 5), output_size=(10, 10), pad_at_baseline=False
        )
        assert out.shape == (10, 10, 3)

    def test_zero_size_bounds_raises(self) -> None:
        with pytest.raises(ValueError, match="non-zero"):
            image_utils.sub_pixel_read(
                self.img, (5, 5, 5, 10), output_size=(5, 5), pad_at_baseline=False
            )

    def test_padding_output_size(self) -> None:
        out = image_utils.sub_pixel_read(
            self.img,
            (10, 10, 20, 20),
            output_size=(10, 10),
            padding=2,
            pad_at_baseline=False,
        )
        assert out.shape == (14, 14, 3)


class TestMisc:
    def test_imread_imwrite_roundtrip(self, tmp_path) -> None:
        img = np.random.default_rng(0).integers(0, 255, (16, 16, 3), dtype=np.uint8)
        path = tmp_path / "img.png"
        misc.imwrite(path, img)
        back = misc.imread(path)
        assert np.array_equal(back, img)

    def test_mpp_power_conversion(self) -> None:
        assert misc.objective_power2mpp(40) == pytest.approx(0.25)
        assert misc.mpp2objective_power(0.25) == pytest.approx(40)
        assert misc.mpp2common_objective_power(0.26) == 40

    def test_get_bounding_box(self) -> None:
        mask = np.zeros((10, 10), dtype=bool)
        mask[2:5, 3:7] = True
        assert np.array_equal(misc.get_bounding_box(mask), [3, 2, 7, 5])

    def test_contrast_enhancer(self) -> None:
        img = np.linspace(50, 100, 64, dtype=np.uint8).reshape(8, 8)
        out = misc.contrast_enhancer(img)
        assert out.max() > img.max()

    def test_cast_to_min_dtype(self) -> None:
        arr = np.array([0, 255], dtype=np.int64)
        assert misc.cast_to_min_dtype(arr).dtype == np.uint8

    def test_metrics_pairing(self) -> None:
        from tiatoolbox_tpu.utils.metrics import f1_detection

        pts = np.array([[0, 0], [10, 10], [20, 20]], dtype=float)
        assert f1_detection(pts, pts, radius=1.0) == 1.0


class TestDatImport:
    """HoVerNet/cerberus .dat detection import (reference misc.py:989-1217)."""

    @staticmethod
    def _hover_dat(tmp_path, name="h.dat"):
        import joblib

        data = {
            f"inst_{i}": {
                "box": [i * 10, 0, i * 10 + 8, 8],
                "centroid": [i * 10 + 4, 4],
                "contour": [
                    [i * 10, 0], [i * 10 + 8, 0], [i * 10 + 8, 8], [i * 10, 8],
                ],
                "prob": 0.5 + i / 10,
                "type": i % 2,
            }
            for i in range(4)
        }
        path = tmp_path / name
        joblib.dump(data, path)
        return path

    def test_store_from_dat(self, tmp_path) -> None:
        from tiatoolbox_tpu.utils.misc import store_from_dat

        store = store_from_dat(
            self._hover_dat(tmp_path), typedict={0: "epith", 1: "lymph"}
        )
        anns = list(store.values())
        assert len(anns) == 4
        types = {a.properties["type"] for a in anns}
        assert types == {"epith", "lymph"}
        assert all("prob" in a.properties for a in anns)

    def test_store_from_dat_scale(self, tmp_path) -> None:
        from tiatoolbox_tpu.utils.misc import store_from_dat

        store = store_from_dat(self._hover_dat(tmp_path), scale_factor=(2.0, 2.0))
        bounds = np.array([a.geometry.bounds for a in store.values()])
        assert bounds[:, 2].max() == (3 * 10 + 8) * 2

    def test_cerberus_multihead(self, tmp_path) -> None:
        import joblib

        from tiatoolbox_tpu.utils.misc import store_from_dat

        inst = {
            "i0": {
                "box": [0, 0, 4, 4],
                "centroid": [2, 2],
                "contour": [[0, 0], [4, 0], [4, 4], [0, 4]],
                "type": 1,
            }
        }
        data = {
            "Gland": inst,
            "Nuclei": inst,
            "base_resolution": {"resolution": 0.5},
            "proc_resolution": {"resolution": 1.0},
        }
        path = tmp_path / "c.dat"
        joblib.dump(data, path)
        store = store_from_dat(path)
        anns = list(store.values())
        assert len(anns) == 2
        assert {a.properties["type"] for a in anns} == {"Gla: 1", "Nuc: 1"}
        # scale inferred from resolutions: 1.0/0.5 = 2
        assert max(a.geometry.bounds[2] for a in anns) == 8

    def test_ppu2mpp(self) -> None:
        from tiatoolbox_tpu.utils.misc import ppu2mpp

        assert ppu2mpp(10000, "cm") == 1.0
        assert ppu2mpp(25400, 2) == 1.0
        import pytest

        with pytest.raises(ValueError, match="Invalid units"):
            ppu2mpp(1, "furlong")
