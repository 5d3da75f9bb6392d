"""Extended utils coverage.

Scenario set modeled on the reference's ``tests/test_utils.py``
(2,493 LoC): fuzzed padded/sub-pixel reads, bounds algebra round trips,
padding format handling, error paths, file helpers, and the
engine-output → store converters.
"""

from __future__ import annotations

import json
from pathlib import Path

import cv2
import numpy as np
import pytest

from tiatoolbox_tpu.annotation.geometry import Polygon
from tiatoolbox_tpu.annotation.storage import DictionaryStore, SQLiteStore
from tiatoolbox_tpu.utils import image as image_utils
from tiatoolbox_tpu.utils import misc, transforms
from tiatoolbox_tpu.utils.exceptions import FileNotSupportedError
from tiatoolbox_tpu.utils.image import (
    crop_and_pad_edges,
    make_bounds_size_positive,
    normalize_padding_size,
    safe_padded_read,
    sub_pixel_read,
)
from tiatoolbox_tpu.utils.store_conversion import (
    dict_to_store_nucleus_detector,
    dict_to_store_patch_predictions,
    dict_to_store_semantic_segmentor,
    process_contours,
    store_to_qupath_json,
)
from tiatoolbox_tpu.utils.transforms import (
    bounds2locsize,
    bounds2slices,
    imresize,
    locsize2bounds,
    pad_bounds,
    parse_cv2_interpolaton,
)

RNG = np.random.default_rng(42)


@pytest.fixture()
def source_image() -> np.ndarray:
    rng = np.random.default_rng(7)
    return rng.integers(0, 256, (256, 256, 3), dtype=np.uint8)


# ---------------------------------------------------------------------------
# imresize
# ---------------------------------------------------------------------------


class TestImresize:
    def test_scale_factor_matches_output_size(self, source_image) -> None:
        by_scale = imresize(source_image, scale_factor=0.5)
        by_size = imresize(source_image, output_size=(128, 128))
        assert by_scale.shape == by_size.shape == (128, 128, 3)

    def test_anisotropic_scale(self, source_image) -> None:
        out = imresize(source_image, scale_factor=(0.5, 0.25))
        assert out.shape == (64, 128, 3)

    def test_1x1(self) -> None:
        img = np.ones((1, 1, 3), dtype=np.uint8) * 42
        out = imresize(img, scale_factor=10)
        assert out.shape == (10, 10, 3)
        assert (out == 42).all()

    def test_no_scale_factor(self, source_image) -> None:
        out = imresize(source_image, output_size=(50, 100))
        assert out.shape == (100, 50, 3)

    def test_output_size_scalar(self, source_image) -> None:
        out = imresize(source_image, output_size=64)
        assert out.shape[:2] == (64, 64)

    def test_no_args_raises(self, source_image) -> None:
        with pytest.raises(TypeError, match="scale_factor"):
            imresize(source_image)

    @pytest.mark.parametrize(
        ("dtype", "expected"),
        [
            (np.bool_, np.uint8),  # working-dtype map, reference transforms.py:156-179
            (np.uint8, np.uint8),
            (np.uint16, np.uint16),
            (np.int16, np.int16),
            (np.int32, np.float32),
            (np.float32, np.float32),
            (np.float64, np.float64),
        ],
    )
    def test_dtype_mapping(self, dtype, expected) -> None:
        img = np.zeros((32, 32), dtype=dtype)
        out = imresize(img, scale_factor=2.0)
        assert out.dtype == expected
        assert out.shape == (64, 64)

    def test_unsupported_dtype_raises(self) -> None:
        img = np.zeros((8, 8), dtype=np.complex64)
        with pytest.raises(ValueError, match="dtype"):
            imresize(img, scale_factor=2.0)

    def test_identity_scale_returns_original_dtype(self) -> None:
        img = np.arange(64, dtype=np.int32).reshape(8, 8)
        out = imresize(img, scale_factor=1.0, interpolation="nearest")
        assert out.dtype == np.int32

    @pytest.mark.parametrize(
        "interpolation", ["nearest", "linear", "area", "cubic", "lanczos", "optimise"]
    )
    def test_interpolation_modes(self, source_image, interpolation) -> None:
        out = imresize(source_image, scale_factor=0.5, interpolation=interpolation)
        assert out.shape == (128, 128, 3)

    def test_enlarge_uses_cubic_policy(self, source_image) -> None:
        opt = imresize(source_image, scale_factor=2.0, interpolation="optimise")
        cub = imresize(source_image, scale_factor=2.0, interpolation="cubic")
        assert np.array_equal(opt, cub)

    def test_shrink_uses_area_policy(self, source_image) -> None:
        opt = imresize(source_image, scale_factor=0.5, interpolation="optimise")
        area = imresize(source_image, scale_factor=0.5, interpolation="area")
        assert np.array_equal(opt, area)


# ---------------------------------------------------------------------------
# background_composite / colour conversions
# ---------------------------------------------------------------------------


class TestBackgroundComposite:
    def test_opaque_passthrough(self) -> None:
        img = np.full((8, 8, 4), 100, np.uint8)
        img[..., 3] = 255
        out = transforms.background_composite(img)
        assert out.shape == (8, 8, 3)
        assert (out == 100).all()

    def test_transparent_becomes_fill(self) -> None:
        img = np.zeros((8, 8, 4), np.uint8)
        out = transforms.background_composite(img, fill=255)
        assert (out == 255).all()

    def test_half_alpha_blends(self) -> None:
        img = np.zeros((4, 4, 4), np.uint8)
        img[..., 3] = 128
        out = transforms.background_composite(img, fill=255)
        assert np.all((out >= 126) & (out <= 129))

    def test_alpha_true_returns_rgba(self) -> None:
        img = np.zeros((4, 4, 3), np.uint8)
        out = transforms.background_composite(img, alpha=True)
        assert out.shape == (4, 4, 4)
        assert (out[..., 3] == 255).all()

    def test_greyscale_promoted(self) -> None:
        img = np.full((4, 4), 7, np.uint8)
        out = transforms.background_composite(img)
        assert out.shape == (4, 4, 3)


class TestResolutionConversions:
    def test_mpp2common_objective_power_scalar(self) -> None:
        assert misc.mpp2common_objective_power(0.25) == 40
        assert misc.mpp2common_objective_power(0.5) == 20
        assert misc.mpp2common_objective_power(1.0) == 10

    def test_mpp2common_objective_power_array(self) -> None:
        out = misc.mpp2common_objective_power([0.25, 0.5])
        assert list(out) == [40, 20]

    def test_power_mpp_roundtrip(self) -> None:
        for power in (1.25, 10, 20, 40, 100):
            mpp = misc.objective_power2mpp(power)
            assert misc.mpp2objective_power(mpp) == pytest.approx(power)

    def test_ppu2mpp_units(self) -> None:
        assert misc.ppu2mpp(1, "inch") == pytest.approx(25400)
        assert misc.ppu2mpp(1, 2) == pytest.approx(25400)  # TIFF inch code
        assert misc.ppu2mpp(1, "cm") == pytest.approx(10000)
        assert misc.ppu2mpp(1, 3) == pytest.approx(10000)
        assert misc.ppu2mpp(72, "inch") == pytest.approx(352.77, abs=0.1)

    def test_ppu2mpp_invalid_units(self) -> None:
        with pytest.raises(ValueError, match="[Ii]nvalid"):
            misc.ppu2mpp(1, "fathoms")


# ---------------------------------------------------------------------------
# safe_padded_read
# ---------------------------------------------------------------------------


class TestSafePaddedRead:
    def test_non_int_bounds_raises(self) -> None:
        data = np.zeros((16, 16))
        with pytest.raises(TypeError, match="integer"):
            safe_padded_read(data, (1.5, 0, 5, 5))

    def test_negative_padding_raises(self) -> None:
        data = np.zeros((16, 16))
        with pytest.raises(ValueError, match="negative"):
            safe_padded_read(data, (0, 0, 8, 8), padding=-1)

    def test_pad_mode_none_crops(self) -> None:
        data = np.ones((16, 16))
        region = safe_padded_read(data, (-4, -4, 8, 8), pad_mode="none")
        assert region.shape == (8, 8)

    @pytest.mark.parametrize("padding", [0, 1, (1, 2), (1, 2, 3, 4)])
    def test_padding_formats(self, padding) -> None:
        data = np.ones((16, 16))
        region = safe_padded_read(data, (0, 0, 8, 8), padding=padding)
        pad4 = normalize_padding_size(padding)
        assert region.shape == (8 + pad4[1] + pad4[3], 8 + pad4[0] + pad4[2])

    @pytest.mark.parametrize("padding", [(1, 2, 3), (1,) * 5])
    def test_invalid_padding_size_raises(self, padding) -> None:
        data = np.ones((16, 16))
        with pytest.raises(ValueError, match="size"):
            safe_padded_read(data, (0, 0, 8, 8), padding=padding)

    def test_2d_padding_shape_raises(self) -> None:
        data = np.ones((16, 16))
        with pytest.raises(ValueError, match="shape"):
            safe_padded_read(data, (0, 0, 8, 8), padding=np.ones((2, 2)))

    def test_invalid_stride_raises(self) -> None:
        data = np.ones((16, 16))
        with pytest.raises(ValueError, match="[Ss]tride"):
            safe_padded_read(data, (0, 0, 8, 8), stride=(1, 1, 1))

    def test_pad_kwargs_reflect(self, source_image) -> None:
        region = safe_padded_read(
            source_image, (-8, -8, 8, 8), pad_mode="reflect"
        )
        assert region.shape == (16, 16, 3)
        # Reflection mirrors the first row/col outward.
        assert np.array_equal(region[8:, 8:], source_image[:8, :8])

    def test_pad_constant_values(self) -> None:
        data = np.zeros((16, 16), dtype=np.uint8)
        region = safe_padded_read(
            data, (-4, -4, 4, 4), pad_constant_values=197
        )
        assert (region[:4, :4] == 197).all()
        assert (region[4:, 4:] == 0).all()

    def test_fuzz_in_bounds_equals_slice(self) -> None:
        rng = np.random.default_rng(0)
        for _ in range(50):
            data = rng.integers(0, 255, (64, 64), dtype=np.uint8)
            x0, y0 = rng.integers(0, 32, 2)
            w, h = rng.integers(1, 32, 2)
            region = safe_padded_read(data, (x0, y0, x0 + w, y0 + h))
            assert np.array_equal(region, data[y0 : y0 + h, x0 : x0 + w])

    def test_fuzz_edge_padding_matches_np_pad(self) -> None:
        rng = np.random.default_rng(1)
        for _ in range(50):
            data = rng.integers(0, 255, (32, 32), dtype=np.uint8)
            shift = rng.integers(-16, 0, 2)
            bounds = (shift[0], shift[1], shift[0] + 32, shift[1] + 32)
            region = safe_padded_read(data, bounds, pad_mode="edge")
            expected = np.pad(
                data[: 32 + shift[1], : 32 + shift[0]],
                ((-shift[1], 0), (-shift[0], 0)),
                mode="edge",
            )
            assert np.array_equal(region, expected)

    def test_stride_2(self) -> None:
        data = np.arange(64, dtype=np.uint8).reshape(8, 8)
        region = safe_padded_read(data, (0, 0, 8, 8), stride=2)
        assert np.array_equal(region, data[::2, ::2])


# ---------------------------------------------------------------------------
# sub_pixel_read
# ---------------------------------------------------------------------------


def _spr(image, bounds, output_size, **kwargs):
    kwargs.setdefault("pad_at_baseline", False)
    return sub_pixel_read(image, bounds, output_size, **kwargs)


class TestSubPixelRead:
    def test_aligned_identity(self, source_image) -> None:
        out = _spr(source_image, (10, 20, 110, 120), (100, 100))
        assert np.array_equal(out, source_image[20:120, 10:110])

    def test_upsample_2x_shape(self, source_image) -> None:
        out = _spr(source_image, (0, 0, 50, 50), (100, 100))
        assert out.shape == (100, 100, 3)

    def test_fractional_bounds_shape(self, source_image) -> None:
        out = _spr(source_image, (10.5, 10.5, 60.5, 60.5), (50, 50))
        assert out.shape == (50, 50, 3)

    def test_padding_increases_output(self, source_image) -> None:
        out = _spr(source_image, (10, 10, 60, 60), (50, 50), padding=5)
        assert out.shape == (60, 60, 3)

    def test_pad_at_baseline_scales_padding(self, source_image) -> None:
        out = sub_pixel_read(
            source_image,
            (10, 10, 60, 60),
            (100, 100),
            padding=5,
            pad_at_baseline=True,
        )
        # 2x scaling: baseline padding of 5 → 10 output pixels per side.
        assert out.shape == (120, 120, 3)

    def test_pad_mode_none_clips(self, source_image) -> None:
        out = _spr(
            source_image, (-10, -10, 50, 50), (60, 60), pad_mode="none"
        )
        assert out.shape[0] < 60 and out.shape[1] < 60

    def test_zero_size_bounds_raises(self, source_image) -> None:
        with pytest.raises(ValueError, match="[Bb]ounds"):
            _spr(source_image, (10, 10, 10, 50), (50, 50))

    def test_negative_size_bounds_flips(self, source_image) -> None:
        fwd = _spr(source_image, (10, 10, 60, 60), (50, 50))
        rev = _spr(source_image, (60, 10, 10, 60), (50, 50))
        assert np.array_equal(np.fliplr(fwd), rev)

    def test_negative_both_axes_flips_both(self, source_image) -> None:
        fwd = _spr(source_image, (10, 10, 60, 60), (50, 50))
        rev = _spr(source_image, (60, 60, 10, 10), (50, 50))
        assert np.array_equal(np.flipud(np.fliplr(fwd)), rev)

    def test_invalid_interpolation_raises(self, source_image) -> None:
        with pytest.raises(ValueError, match="[Ii]nterpolation"):
            _spr(
                source_image, (0, 0, 50, 50), (100, 100), interpolation="fancy"
            )

    def test_interpolation_none_returns_unscaled(self, source_image) -> None:
        out = _spr(
            source_image, (0, 0, 50, 50), (100, 100), interpolation="none"
        )
        assert out.shape == (50, 50, 3)

    def test_bad_read_func_wrong_size(self, source_image) -> None:
        def bad_read(_img, _bounds, _stride):
            return np.zeros((3, 3, 3), np.uint8)

        with pytest.raises(ValueError, match="incorrect size"):
            _spr(source_image, (0, 0, 50, 50), (50, 50), read_func=bad_read)

    def test_bad_read_func_empty(self, source_image) -> None:
        def empty_read(_img, _bounds, _stride):
            return np.zeros((0, 0, 3), np.uint8)

        with pytest.raises(ValueError, match="empty|None"):
            _spr(source_image, (0, 0, 50, 50), (50, 50), read_func=empty_read)

    def test_bad_read_func_none(self, source_image) -> None:
        def none_read(_img, _bounds, _stride):
            return None

        with pytest.raises(ValueError, match="empty|None"):
            _spr(source_image, (0, 0, 50, 50), (50, 50), read_func=none_read)

    @pytest.mark.parametrize("padding", [0, 1, (1, 2), (1, 2, 3, 4)])
    def test_padding_formats(self, source_image, padding) -> None:
        out = _spr(source_image, (10, 10, 60, 60), (50, 50), padding=padding)
        pad4 = normalize_padding_size(padding)
        assert out.shape == (50 + pad4[1] + pad4[3], 50 + pad4[0] + pad4[2], 3)

    def test_pad_kwargs_constant_value(self, source_image) -> None:
        out = _spr(
            source_image,
            (-20, -20, 30, 30),
            (50, 50),
            pad_mode="constant",
            pad_constant_values=123,
        )
        assert (out[:10, :10] == 123).all()

    def test_fuzz_aligned_reads_match_slicing(self, source_image) -> None:
        rng = np.random.default_rng(3)
        for _ in range(30):
            x0, y0 = rng.integers(0, 100, 2)
            w, h = rng.integers(10, 100, 2)
            out = _spr(
                source_image,
                (int(x0), int(y0), int(x0 + w), int(y0 + h)),
                (int(w), int(h)),
            )
            assert np.array_equal(
                out, source_image[y0 : y0 + h, x0 : x0 + w]
            )

    def test_fuzz_output_size_enforced(self, source_image) -> None:
        rng = np.random.default_rng(4)
        for _ in range(30):
            b = np.sort(rng.uniform(-30, 280, 4))
            bounds = (b[0], b[2], b[1], b[3])
            if 0 in bounds2locsize(bounds)[1]:
                continue
            ow, oh = rng.integers(8, 128, 2)
            out = _spr(source_image, bounds, (int(ow), int(oh)))
            assert out.shape == (oh, ow, 3)

    def test_2d_image(self) -> None:
        img = np.arange(256, dtype=np.uint8).reshape(16, 16)
        out = _spr(img, (0, 0, 8, 8), (16, 16))
        assert out.shape == (16, 16)


# ---------------------------------------------------------------------------
# bounds algebra
# ---------------------------------------------------------------------------


class TestBoundsAlgebra:
    def test_fuzz_bounds2locsize_roundtrip(self) -> None:
        rng = np.random.default_rng(5)
        for _ in range(100):
            loc = rng.integers(-100, 100, 2)
            size = rng.integers(1, 100, 2)
            bounds = locsize2bounds(loc, size)
            loc2, size2 = bounds2locsize(bounds)
            assert np.array_equal(loc, loc2)
            assert np.array_equal(size, size2)

    def test_bounds2locsize_lower_origin(self) -> None:
        loc, size = bounds2locsize((0, 0, 10, 20), origin="lower")
        assert tuple(loc) == (0, 20)
        assert tuple(size) == (10, -20)

    def test_bounds2locsize_invalid_origin(self) -> None:
        with pytest.raises(ValueError, match="origin"):
            bounds2locsize((0, 0, 1, 1), origin="middle")

    def test_bounds2slices_stride(self) -> None:
        slices = bounds2slices((1, 2, 9, 10), stride=2)
        assert slices == (slice(2, 10, 2), slice(1, 9, 2))

    def test_bounds2slices_invalid_stride(self) -> None:
        with pytest.raises(ValueError, match="stride"):
            bounds2slices((0, 0, 4, 4), stride=(1, 2, 3))

    def test_pad_bounds_scalar(self) -> None:
        assert pad_bounds((0, 0, 10, 10), 1) == (-1, -1, 11, 11)

    def test_pad_bounds_per_axis(self) -> None:
        assert pad_bounds((0, 0, 10, 10), (1, 2)) == (-1, -2, 11, 12)

    def test_pad_bounds_per_edge(self) -> None:
        assert pad_bounds((0, 0, 10, 10), (1, 2, 3, 4)) == (-1, -2, 13, 14)

    def test_pad_bounds_odd_bounds_raises(self) -> None:
        with pytest.raises(ValueError, match="even"):
            pad_bounds((0, 0, 10), 1)

    def test_pad_bounds_invalid_padding_raises(self) -> None:
        with pytest.raises(ValueError, match="padding"):
            pad_bounds((0, 0, 10, 10), (1, 2, 3))

    def test_make_bounds_size_positive_cases(self) -> None:
        b, lr, ud = make_bounds_size_positive((0, 0, 10, 10))
        assert not lr and not ud
        b, lr, ud = make_bounds_size_positive((10, 0, 0, 10))
        assert lr and not ud
        assert tuple(b) == (0, 0, 10, 10)
        b, lr, ud = make_bounds_size_positive((10, 10, 0, 0))
        assert lr and ud
        assert tuple(b) == (0, 0, 10, 10)


class TestCropAndPadEdges:
    def test_fully_inside_is_identity(self) -> None:
        region = np.ones((10, 10))
        out = crop_and_pad_edges((5, 5, 15, 15), (100, 100), region)
        assert np.array_equal(out, region)

    def test_negative_location_pads(self) -> None:
        region = np.ones((10, 10))
        out = crop_and_pad_edges((-5, -5, 5, 5), (100, 100), region)
        assert out.shape == (10, 10)
        assert (out[:5, :5] == 0).all()
        assert (out[5:, 5:] == 1).all()

    def test_overhang_pads(self) -> None:
        region = np.ones((10, 10))
        out = crop_and_pad_edges((95, 95, 105, 105), (100, 100), region)
        assert out.shape == (10, 10)
        assert (out[5:, 5:] == 0).all()

    def test_pad_mode_none_crops(self) -> None:
        region = np.ones((10, 10))
        out = crop_and_pad_edges(
            (-5, -5, 5, 5), (100, 100), region, pad_mode="none"
        )
        assert out.shape == (5, 5)

    def test_negative_max_dims_raises(self) -> None:
        with pytest.raises(ValueError, match="[Mm]ax dimensions"):
            crop_and_pad_edges((0, 0, 2, 2), (-1, 10), np.ones((2, 2)))

    def test_non_positive_bounds_size_raises(self) -> None:
        with pytest.raises(ValueError, match="size"):
            crop_and_pad_edges((0, 0, 0, 2), (10, 10), np.ones((2, 0)))

    def test_fuzz_output_size(self) -> None:
        # Overhang bounded within the region size, matching the
        # reference's own fuzz constraint (test_utils.py:1275-1296).
        rng = np.random.default_rng(6)
        size = np.array([10, 10])
        region = np.ones((10, 10))
        for _ in range(200):
            max_dims = rng.integers(0, 50, 2)
            loc = np.array([rng.integers(-5, d + 5) for d in max_dims])
            out = crop_and_pad_edges(
                locsize2bounds(loc, size), tuple(max_dims), region
            )
            assert out.shape == (10, 10)

    def test_fuzz_output_size_no_padding(self) -> None:
        rng = np.random.default_rng(7)
        size = np.array([10, 10])
        region = np.ones((10, 10))
        for _ in range(200):
            max_dims = rng.integers(5, 50, 2)
            loc = np.array([rng.integers(-5, d + 5) for d in max_dims])
            out = crop_and_pad_edges(
                locsize2bounds(loc, size), tuple(max_dims), region,
                pad_mode=None,
            )
            expected = np.maximum(
                size + np.minimum(loc, 0) - np.maximum(loc + size - max_dims, 0),
                0,
            )
            assert out.shape == tuple(expected[::-1])

    def test_3d_region(self) -> None:
        region = np.ones((10, 10, 3))
        out = crop_and_pad_edges((-5, -5, 5, 5), (100, 100), region)
        assert out.shape == (10, 10, 3)


class TestNormalizePadding:
    def test_invalid_dims(self) -> None:
        with pytest.raises(ValueError, match="shape"):
            normalize_padding_size(((1, 1), (2, 2)))

    def test_scalar(self) -> None:
        assert np.array_equal(normalize_padding_size(3), [3, 3, 3, 3])

    def test_pair(self) -> None:
        assert np.array_equal(normalize_padding_size((1, 2)), [1, 2, 1, 2])


# ---------------------------------------------------------------------------
# misc helpers
# ---------------------------------------------------------------------------


class TestMiscHelpers:
    def test_contrast_enhancer_known_case(self) -> None:
        img = np.array(
            [[[37, 244, 193], [106, 235, 128], [71, 140, 47]],
             [[103, 184, 72], [20, 188, 238], [126, 7, 0]],
             [[137, 195, 204], [32, 203, 170], [101, 77, 133]]],
            dtype=np.uint8,
        )
        out = misc.contrast_enhancer(img, low_p=2, high_p=98)
        assert out.dtype == np.uint8
        assert out.min() == 0
        assert out.max() == 255

    def test_contrast_enhancer_rejects_float(self) -> None:
        with pytest.raises(AssertionError, match="uint8"):
            misc.contrast_enhancer(np.zeros((4, 4, 3), np.float32))

    def test_contrast_enhancer_flat_image_unchanged(self) -> None:
        img = np.full((8, 8, 3), 50, np.uint8)
        out = misc.contrast_enhancer(img)
        assert (out == 50).all()

    def test_luminosity_mask_white_raises(self) -> None:
        white = np.full((16, 16, 3), 255, np.uint8)
        with pytest.raises(ValueError, match="[Ee]mpty"):
            misc.get_luminosity_tissue_mask(white, threshold=0.8)

    def test_luminosity_mask_finds_dark_tissue(self) -> None:
        img = np.full((16, 16, 3), 255, np.uint8)
        img[4:12, 4:12] = (120, 80, 140)
        mask = misc.get_luminosity_tissue_mask(img, threshold=0.8)
        assert mask[8, 8]
        assert not mask[0, 0]

    def test_load_stain_matrix_ndarray_passthrough(self) -> None:
        mat = np.eye(3)
        assert misc.load_stain_matrix(mat) is mat

    def test_load_stain_matrix_npy(self, tmp_path) -> None:
        mat = np.random.default_rng(0).random((2, 3))
        np.save(tmp_path / "sm.npy", mat)
        out = misc.load_stain_matrix(tmp_path / "sm.npy")
        assert np.allclose(out, mat)

    def test_load_stain_matrix_csv(self, tmp_path) -> None:
        p = tmp_path / "sm.csv"
        p.write_text("0.1,0.2,0.3\n0.4,0.5,0.6\n")
        out = misc.load_stain_matrix(p)
        assert out.shape == (2, 3)
        assert out[1, 2] == pytest.approx(0.6)

    def test_load_stain_matrix_bad_ext(self, tmp_path) -> None:
        with pytest.raises(FileNotSupportedError):
            misc.load_stain_matrix(tmp_path / "sm.txt")

    def test_grab_files_from_dir(self, tmp_path) -> None:
        for name in ("a.jpg", "b.png", "c.tif", "d.svs"):
            (tmp_path / name).write_bytes(b"x")
        default = misc.grab_files_from_dir(tmp_path)
        assert len(default) == 3
        svs_only = misc.grab_files_from_dir(tmp_path, file_types="*.svs")
        assert len(svs_only) == 1
        multi = misc.grab_files_from_dir(tmp_path, file_types="*.jpg,*.svs")
        assert len(multi) == 2

    def test_split_path_name_ext(self) -> None:
        _, name, suffixes = misc.split_path_name_ext("/tmp/x/slide.ome.tiff")
        assert name == "slide.ome.tiff"
        assert suffixes == [".ome", ".tiff"]

    def test_string_to_tuple(self) -> None:
        assert misc.string_to_tuple("a, b ,c") == ("a", "b", "c")

    @pytest.mark.parametrize(
        ("values", "expected"),
        [
            ([0, 255], np.uint8),
            ([-1, 100], np.int8),
            ([0, 60000], np.uint16),
            ([-30000, 30000], np.int16),
            ([0, 2**32 - 1], np.uint32),
            ([-(2**31), 2**31 - 1], np.int32),
        ],
    )
    def test_cast_to_min_dtype(self, values, expected) -> None:
        out = misc.cast_to_min_dtype(np.array(values, dtype=np.int64))
        assert out.dtype == expected

    def test_cast_to_min_dtype_large_passthrough(self) -> None:
        arr = np.array([0, 2**40], dtype=np.int64)
        assert misc.cast_to_min_dtype(arr).dtype == np.int64

    def test_cast_to_min_dtype_empty(self) -> None:
        arr = np.array([], dtype=np.int64)
        assert misc.cast_to_min_dtype(arr).size == 0

    def test_get_bounding_box(self) -> None:
        mask = np.zeros((20, 30), bool)
        mask[5:10, 12:25] = True
        assert np.array_equal(misc.get_bounding_box(mask), [12, 5, 25, 10])


class TestReadLocations:
    def test_ndarray_2col(self) -> None:
        df = misc.read_locations(np.array([[1, 2], [3, 4]]))
        assert list(df.columns) == ["x", "y", "class"]
        assert df["class"].isna().all()

    def test_ndarray_3col(self) -> None:
        df = misc.read_locations(np.array([[1, 2, 0], [3, 4, 1]]))
        assert list(df["class"]) == [0, 1]

    def test_ndarray_bad_cols_raises(self) -> None:
        with pytest.raises(ValueError, match="format"):
            misc.read_locations(np.zeros((2, 4)))

    def test_csv_with_header(self, tmp_path) -> None:
        p = tmp_path / "locs.csv"
        p.write_text("x,y,class\n1,2,0\n3,4,1\n")
        df = misc.read_locations(p)
        assert len(df) == 2

    def test_csv_without_header(self, tmp_path) -> None:
        p = tmp_path / "locs.csv"
        p.write_text("1,2,0\n3,4,1\n")
        df = misc.read_locations(p)
        assert list(df.columns) == ["x", "y", "class"]

    def test_npy(self, tmp_path) -> None:
        p = tmp_path / "locs.npy"
        np.save(p, np.array([[1, 2], [3, 4]]))
        df = misc.read_locations(p)
        assert len(df) == 2

    def test_json(self, tmp_path) -> None:
        p = tmp_path / "locs.json"
        p.write_text(json.dumps({"x": [1, 3], "y": [2, 4]}))
        df = misc.read_locations(p)
        assert len(df) == 2

    def test_unsupported_ext_raises(self, tmp_path) -> None:
        with pytest.raises(FileNotSupportedError):
            misc.read_locations(tmp_path / "locs.txt")

    def test_dataframe_2col(self) -> None:
        import pandas as pd

        df = misc.read_locations(pd.DataFrame({"a": [1], "b": [2]}))
        assert list(df.columns) == ["x", "y", "class"]

    def test_dataframe_bad_cols_raises(self) -> None:
        import pandas as pd

        with pytest.raises(ValueError, match="columns"):
            misc.read_locations(pd.DataFrame({"a": [1], "b": [2], "c": [3], "d": [4]}))

    def test_unsupported_type_raises(self) -> None:
        with pytest.raises(TypeError):
            misc.read_locations(42)


class TestSaveHelpers:
    def test_save_as_json_numpy_values(self, tmp_path) -> None:
        data = {
            "arr": np.arange(3),
            "scalar": np.float32(1.5),
            np.int64(7): "np-key",
            "path": Path("/tmp/x"),
            "nested": [{"v": np.uint8(3)}],
        }
        p = tmp_path / "out.json"
        misc.save_as_json(data, p)
        loaded = json.loads(p.read_text())
        assert loaded["arr"] == [0, 1, 2]
        assert loaded["scalar"] == 1.5
        assert loaded["7"] == "np-key"
        assert loaded["nested"][0]["v"] == 3

    def test_save_as_json_exists_raises(self, tmp_path) -> None:
        p = tmp_path / "out.json"
        misc.save_as_json({}, p)
        with pytest.raises(FileExistsError):
            misc.save_as_json({}, p)
        misc.save_as_json({"k": 1}, p, exist_ok=True)

    def test_save_as_json_parents(self, tmp_path) -> None:
        p = tmp_path / "a" / "b" / "out.json"
        with pytest.raises(FileNotFoundError):
            misc.save_as_json({}, p)
        misc.save_as_json({}, p, parents=True)
        assert p.exists()

    def test_save_yaml_exists_raises(self, tmp_path) -> None:
        p = tmp_path / "out.yaml"
        misc.save_yaml({"a": 1}, p)
        with pytest.raises(FileExistsError):
            misc.save_yaml({"a": 2}, p)
        misc.save_yaml({"a": 2}, p, exist_ok=True)

    def test_save_yaml_parents(self, tmp_path) -> None:
        p = tmp_path / "c" / "d" / "out.yaml"
        misc.save_yaml({"a": 1}, p, parents=True)
        import yaml

        assert yaml.safe_load(p.read_text()) == {"a": 1}

    def test_unzip_data(self, tmp_path) -> None:
        import zipfile

        zp = tmp_path / "data.zip"
        with zipfile.ZipFile(zp, "w") as zf:
            zf.writestr("inner.txt", "hello")
        misc.unzip_data(zp, tmp_path / "out", del_zip=False)
        assert (tmp_path / "out" / "inner.txt").read_text() == "hello"
        assert zp.exists()
        misc.unzip_data(zp, tmp_path / "out2")
        assert not zp.exists()


class TestImreadImwrite:
    def test_imread_missing_raises(self) -> None:
        with pytest.raises(FileNotFoundError):
            misc.imread("/nonexistent/image.png")

    def test_imread_undecodable_raises(self, tmp_path) -> None:
        p = tmp_path / "bad.png"
        p.write_bytes(b"not an image")
        with pytest.raises(FileNotSupportedError):
            misc.imread(p)

    def test_imread_npy(self, tmp_path) -> None:
        arr = np.zeros((4, 4, 3), np.uint8)
        np.save(tmp_path / "img.npy", arr)
        out = misc.imread(tmp_path / "img.npy")
        assert np.array_equal(out, arr)

    def test_imread_float_npy_clips_to_uint8(self, tmp_path) -> None:
        arr = np.array([[-5.0, 300.0]])
        np.save(tmp_path / "img.npy", arr)
        out = misc.imread(tmp_path / "img.npy")
        assert out.dtype == np.uint8
        assert out[0, 0] == 0 and out[0, 1] == 255

    def test_imwrite_roundtrip_rgba(self, tmp_path) -> None:
        rng = np.random.default_rng(8)
        img = rng.integers(0, 255, (16, 16, 4), dtype=np.uint8)
        p = tmp_path / "img.png"
        misc.imwrite(p, img)
        out = misc.imread(p)
        assert np.array_equal(out, img)

    def test_imwrite_bad_path_raises(self, tmp_path) -> None:
        with pytest.raises(OSError, match="write"):
            misc.imwrite(tmp_path / "nodir" / "img.png", np.zeros((4, 4, 3), np.uint8))

    def test_parse_cv2_interpolation_flags(self) -> None:
        assert parse_cv2_interpolaton("nearest") == cv2.INTER_NEAREST
        assert parse_cv2_interpolaton("AREA") == cv2.INTER_AREA
        assert parse_cv2_interpolaton(cv2.INTER_CUBIC) == cv2.INTER_CUBIC
        with pytest.raises(ValueError, match="interpolation"):
            parse_cv2_interpolaton("blah")

    def test_select_device_cpu_forced(self) -> None:
        assert misc.select_device(on_gpu=False) == "cpu"


# ---------------------------------------------------------------------------
# store converters
# ---------------------------------------------------------------------------


def _patch_output() -> dict:
    return {
        "predictions": [1, 0, 1],
        "coordinates": [(0, 0, 4, 4), (4, 4, 8, 8), (8, 8, 12, 12)],
        "probabilities": [[0.1, 0.9], [0.9, 0.1], [0.4, 0.6]],
        "labels": [1, 0, 1],
    }


class TestStoreConversion:
    def test_patch_pred_store(self) -> None:
        store = dict_to_store_patch_predictions(_patch_output())
        anns = list(store.values())
        assert len(anns) == 3
        types = sorted(a.properties["type"] for a in anns)
        assert types == [0, 1, 1]
        assert anns[0].properties["prob"] == pytest.approx(0.9)

    def test_patch_pred_store_class_dict(self) -> None:
        store = dict_to_store_patch_predictions(
            _patch_output(), class_dict={0: "normal", 1: "tumour"}
        )
        types = {a.properties["type"] for a in store.values()}
        assert types == {"normal", "tumour"}
        labels = {a.properties["label"] for a in store.values()}
        assert labels == {"normal", "tumour"}

    def test_patch_pred_store_scale_factor(self) -> None:
        store = dict_to_store_patch_predictions(
            _patch_output(), scale_factor=(2.0, 2.0)
        )
        boxes = [a.geometry.bounds for a in store.values()]
        assert (0.0, 0.0, 8.0, 8.0) in boxes

    def test_patch_pred_store_missing_coords_raises(self) -> None:
        with pytest.raises(ValueError, match="coordinates"):
            dict_to_store_patch_predictions({"predictions": [1]})

    def test_patch_pred_store_persist(self, tmp_path) -> None:
        p = tmp_path / "preds.db"
        out = dict_to_store_patch_predictions(_patch_output(), save_path=p)
        assert out == p
        reopened = SQLiteStore(p)
        assert len(reopened) == 3

    def test_semantic_store_single_region(self) -> None:
        mask = np.zeros((32, 32), np.uint8)
        mask[8:24, 8:24] = 1
        store = dict_to_store_semantic_segmentor({"predictions": mask})
        anns = list(store.values())
        assert len(anns) == 1
        assert anns[0].properties["type"] == 1
        assert anns[0].geometry.area == pytest.approx(15 * 15, rel=0.2)

    def test_semantic_store_with_hole(self) -> None:
        mask = np.zeros((64, 64), np.uint8)
        mask[8:56, 8:56] = 1
        mask[24:40, 24:40] = 0
        store = dict_to_store_semantic_segmentor({"predictions": mask})
        (ann,) = store.values()
        solid = 47 * 47
        hole = 17 * 17
        assert ann.geometry.area < solid
        assert ann.geometry.area == pytest.approx(solid - hole, rel=0.15)

    def test_semantic_store_multiple_holes(self) -> None:
        mask = np.zeros((64, 64), np.uint8)
        mask[4:60, 4:60] = 1
        mask[10:20, 10:20] = 0
        mask[30:40, 30:40] = 0
        store = dict_to_store_semantic_segmentor({"predictions": mask})
        (ann,) = store.values()
        assert len(ann.geometry.holes) == 2

    def test_semantic_store_multiclass(self) -> None:
        mask = np.zeros((32, 32), np.uint8)
        mask[:16, :16] = 1
        mask[16:, 16:] = 2
        store = dict_to_store_semantic_segmentor(
            {"predictions": mask}, class_dict={1: "stroma", 2: "tumour"}
        )
        types = sorted(a.properties["type"] for a in store.values())
        assert types == ["stroma", "tumour"]

    def test_semantic_store_offset(self) -> None:
        mask = np.zeros((16, 16), np.uint8)
        mask[4:12, 4:12] = 1
        store = dict_to_store_semantic_segmentor(
            {"predictions": mask}, offset=(100, 200)
        )
        (ann,) = store.values()
        minx, miny, _, _ = ann.geometry.bounds
        assert minx >= 100 and miny >= 200

    def test_semantic_store_empty_mask(self) -> None:
        store = dict_to_store_semantic_segmentor(
            {"predictions": np.zeros((8, 8), np.uint8)}
        )
        assert len(store) == 0

    def test_process_contours_min_area(self) -> None:
        mask = np.zeros((32, 32), np.uint8)
        mask[2:4, 2:4] = 1  # tiny
        mask[8:28, 8:28] = 1  # big
        polys = process_contours(mask, 1, min_area=10)
        assert len(polys) == 1

    def test_nucleus_detector_store(self) -> None:
        store = dict_to_store_nucleus_detector(
            {
                "coordinates": np.array([[4.0, 6.0], [10.0, 12.0]]),
                "scores": [0.8, 0.9],
                "types": [0, 1],
            },
            scale_factor=(2.0, 2.0),
            class_dict={0: "epi", 1: "lym"},
        )
        anns = sorted(store.values(), key=lambda a: a.geometry.bounds[0])
        assert anns[0].geometry.bounds[:2] == (8.0, 12.0)
        assert anns[0].properties["type"] == "epi"
        assert anns[1].properties["prob"] == pytest.approx(0.9)

    def test_store_to_qupath_json(self, tmp_path) -> None:
        store = dict_to_store_patch_predictions(
            _patch_output(), class_dict={0: "normal", 1: "tumour"}
        )
        p = tmp_path / "qp.json"
        store_to_qupath_json(store, p)
        data = json.loads(p.read_text())
        assert data["type"] == "FeatureCollection"
        assert len(data["features"]) == 3
        feat = data["features"][0]
        assert feat["properties"]["objectType"] == "annotation"
        assert feat["properties"]["classification"]["name"] in {"normal", "tumour"}

    def test_dict_store_from_dat(self, tmp_path) -> None:
        import joblib

        data = {
            "inst-1": {
                "contour": [[0, 0], [10, 0], [10, 10], [0, 10]],
                "type": 1,
                "prob": 0.9,
            },
        }
        fp = tmp_path / "preds.dat"
        joblib.dump(data, fp)
        store = misc.store_from_dat(fp, cls=DictionaryStore)
        assert isinstance(store, DictionaryStore)
        assert len(store) == 1

    def test_from_dat_typedict(self, tmp_path) -> None:
        import joblib

        # HoVerNet dict order: box, centroid, contour, then extra props —
        # the importer keeps props[3:] only (reference misc.py:1090-1110).
        data = {
            "inst-1": {
                "box": [0, 0, 8, 8],
                "centroid": [4, 3],
                "contour": [[0, 0], [8, 0], [8, 8]],
                "type": 1,
            },
            "inst-2": {
                "box": [20, 20, 28, 28],
                "centroid": [25, 23],
                "contour": [[20, 20], [28, 20], [28, 28]],
                "type": 2,
            },
        }
        fp = tmp_path / "preds.dat"
        joblib.dump(data, fp)
        store = misc.store_from_dat(fp, typedict={1: "epith", 2: "lymph"})
        types = sorted(a.properties["type"] for a in store.values())
        assert types == ["epith", "lymph"]

    def test_from_dat_origin_shift(self, tmp_path) -> None:
        import joblib

        data = {"i": {"contour": [[100, 100], [110, 100], [110, 110]], "type": 0}}
        fp = tmp_path / "preds.dat"
        joblib.dump(data, fp)
        store = misc.store_from_dat(fp, origin=(100, 100))
        (ann,) = store.values()
        assert ann.geometry.bounds[0] == pytest.approx(0.0)

    def test_make_valid_poly_buffers_degenerate(self) -> None:
        line_like = Polygon(np.array([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0]]))
        fixed = misc.make_valid_poly(line_like)
        assert fixed.area > 0


class TestOmeTiffHeatmap:
    def test_write_and_reopen(self, tmp_path) -> None:
        from tiatoolbox_tpu.wsicore.wsireader import WSIReader

        prob = np.linspace(0, 1, 512 * 512, dtype=np.float32).reshape(512, 512)
        p = tmp_path / "heat.ome.tiff"
        misc.write_probability_heatmap_as_ome_tiff(p, prob, mpp=(0.5, 0.5))
        reader = WSIReader.open(p)
        assert tuple(reader.info.slide_dimensions) == (512, 512)
        assert reader.info.mpp is not None
        thumb = reader.slide_thumbnail(resolution=4.0, units="baseline")
        assert thumb.ndim == 3

    def test_colormap_variant(self, tmp_path) -> None:
        prob = np.zeros((300, 300), np.float32)
        prob[100:200, 100:200] = 1.0
        p = tmp_path / "heat_jet.ome.tiff"
        misc.write_probability_heatmap_as_ome_tiff(
            p, prob, colormap=cv2.COLORMAP_JET
        )
        from tiatoolbox_tpu.wsicore.wsireader import WSIReader

        reader = WSIReader.open(p)
        region = reader.read_rect((140, 140), (16, 16), resolution=0, units="level")
        assert region[..., 0].mean() > region[..., 2].mean()  # JET: hot is red
