"""Extended device-ops coverage: YUV wire codec, grey conversion,
canvas accumulation properties, stain-op numerics."""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from tiatoolbox_tpu.data.synth import synthetic_he_patch
from tiatoolbox_tpu.ops.canvas import DeviceCanvas, canvas_argmax
from tiatoolbox_tpu.ops.colorconv import (
    od2rgb,
    rgb2grey,
    rgb2od,
    rgb_batch_to_yuv420,
    yuv420_batch_to_rgb,
)


class TestYUVWire:
    def test_pack_shape_and_dtype(self) -> None:
        batch = np.stack([synthetic_he_patch((64, 64), seed=s) for s in range(3)])
        packed = rgb_batch_to_yuv420(batch)
        assert packed.shape == (3, 96, 64)
        assert packed.dtype == np.uint8

    def test_roundtrip_close(self) -> None:
        batch = np.stack([synthetic_he_patch((64, 64), seed=s) for s in range(2)])
        packed = rgb_batch_to_yuv420(batch)
        rgb = np.asarray(yuv420_batch_to_rgb(jnp.asarray(packed)))
        assert rgb.shape == (2, 64, 64, 3)
        # 4:2:0 chroma subsampling: small error on smooth H&E content
        assert np.abs(rgb - batch.astype(np.float32)).mean() < 4.0

    def test_flat_color_roundtrip_tight(self) -> None:
        flat = np.full((1, 32, 32, 3), (180, 90, 160), np.uint8)
        packed = rgb_batch_to_yuv420(flat)
        rgb = np.asarray(yuv420_batch_to_rgb(jnp.asarray(packed)))
        # no spatial detail -> subsampling loses nothing but rounding
        assert np.abs(rgb - flat.astype(np.float32)).max() < 3.0

    def test_extremes_stay_in_range(self) -> None:
        extremes = np.zeros((1, 32, 32, 3), np.uint8)
        extremes[:, :16] = 255
        rgb = np.asarray(yuv420_batch_to_rgb(jnp.asarray(
            rgb_batch_to_yuv420(extremes))))
        assert rgb.min() >= 0.0
        assert rgb.max() <= 255.0

    def test_bad_dims_raise(self) -> None:
        with pytest.raises(ValueError, match="yuv420"):
            rgb_batch_to_yuv420(np.zeros((1, 30, 30, 3), np.uint8))

    def test_band_pack_unpack_roundtrip(self) -> None:
        """Single-image band codec: odd band shapes are edge-padded on
        pack and sliced back on unpack, returning uint8 RGB."""
        from tiatoolbox_tpu.ops.colorconv import (
            rgb_image_to_yuv420,
            unpack_yuv420_band,
        )

        img = synthetic_he_patch((113, 70), seed=3)  # (w, h): H%4!=0, W%2!=0
        planes = rgb_image_to_yuv420(img)
        assert planes.dtype == np.uint8
        assert planes.shape == (72 + 36, 114)  # padded to 72x114
        out = np.asarray(unpack_yuv420_band(jnp.asarray(planes), (70, 113)))
        assert out.shape == (70, 113, 3)
        assert out.dtype == np.uint8
        assert np.abs(out.astype(np.float32) - img.astype(np.float32)).mean() < 4.0

    def test_band_codec_matches_batch_codec(self) -> None:
        """The band codec is the batch codec on one padded image."""
        img = synthetic_he_patch((64, 64), seed=7)
        from tiatoolbox_tpu.ops.colorconv import (
            rgb_image_to_yuv420,
            unpack_yuv420_band,
        )

        band_planes = rgb_image_to_yuv420(img)
        batch_planes = rgb_batch_to_yuv420(img[None])[0]
        np.testing.assert_array_equal(band_planes, batch_planes)
        band_rgb = np.asarray(
            unpack_yuv420_band(jnp.asarray(band_planes), (64, 64))
        )
        batch_rgb = np.asarray(yuv420_batch_to_rgb(jnp.asarray(batch_planes)[None]))[0]
        assert np.abs(band_rgb - np.round(batch_rgb)).max() <= 1.0


class TestGreyAndOD:
    def test_rgb2grey_matches_cv2(self) -> None:
        import cv2

        img = synthetic_he_patch((64, 64), seed=2)
        ours = np.asarray(rgb2grey(jnp.asarray(img)))
        ref = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
        assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1

    def test_od_roundtrip_device(self) -> None:
        img = synthetic_he_patch((32, 32), seed=3)
        od = rgb2od(jnp.asarray(img))
        back = np.asarray(od2rgb(od))
        assert np.abs(back.astype(int) - img.astype(int)).max() <= 1

    def test_od_zero_pixels_finite(self) -> None:
        img = np.zeros((4, 4, 3), np.uint8)
        od = np.asarray(rgb2od(jnp.asarray(img)))
        assert np.isfinite(od).all()


class TestCanvasProperties:
    def test_overlap_counts_average(self) -> None:
        canvas = DeviceCanvas((8, 8), 1)
        a = np.full((1, 4, 4, 1), 2.0, np.float32)
        b = np.full((1, 4, 4, 1), 4.0, np.float32)
        canvas.add(a, np.array([[0, 0]]))
        canvas.add(b, np.array([[2, 2]]))  # overlaps rows/cols 2-3
        out = np.asarray(canvas.normalized())
        assert out[0, 0, 0] == 2.0  # only a
        assert out[3, 3, 0] == 3.0  # mean of 2 and 4
        assert out[5, 5, 0] == 4.0  # only b
        assert out[7, 7, 0] == 0.0  # untouched

    def test_batched_scatter_matches_sequential(self) -> None:
        rng = np.random.default_rng(0)
        patches = rng.random((6, 8, 8, 2)).astype(np.float32)
        positions = np.array(
            [[0, 0], [8, 8], [0, 8], [8, 0], [4, 4], [12, 12]], np.int32
        )
        both = DeviceCanvas((24, 24), 2)
        both.add(patches, positions)
        one_by_one = DeviceCanvas((24, 24), 2)
        for i in range(6):
            one_by_one.add(patches[i : i + 1], positions[i : i + 1])
        assert np.allclose(
            np.asarray(both.normalized()), np.asarray(one_by_one.normalized())
        )

    def test_normalized_dtype_cast(self) -> None:
        canvas = DeviceCanvas((4, 4), 1)
        canvas.add(np.full((1, 4, 4, 1), 1 / 3, np.float32), np.array([[0, 0]]))
        f16 = np.asarray(canvas.normalized(jnp.float16))
        assert f16.dtype == np.float16
        assert abs(float(f16[0, 0, 0]) - 1 / 3) < 1e-3

    def test_canvas_argmax(self) -> None:
        canvas = np.zeros((2, 2, 3), np.float32)
        canvas[0, 0, 2] = 1.0
        canvas[1, 1, 1] = 1.0
        preds = np.asarray(canvas_argmax(jnp.asarray(canvas)))
        assert preds.dtype == np.uint8
        assert preds[0, 0] == 2
        assert preds[1, 1] == 1


class TestStainOpsNumerics:
    def test_device_transform_matches_host_reference(self) -> None:
        from tiatoolbox_tpu.ops.stain import apply_stain_transform
        from tiatoolbox_tpu.tools.stainnorm import MacenkoNormalizer

        target = synthetic_he_patch((96, 96), seed=1)
        source = synthetic_he_patch((96, 96), seed=7)
        norm = MacenkoNormalizer()
        norm.fit(target)
        host = norm.transform(source)
        consts = norm.prepare_tile_transform(source)
        dev = np.asarray(
            apply_stain_transform(
                np.stack([source]),
                consts["conc_proj"],
                consts["target_stains"],
                consts["conc_scale"],
            )
        )[0]
        assert np.abs(dev.astype(int) - host.astype(int)).max() <= 1

    def test_transform_idempotent_shape(self) -> None:
        from tiatoolbox_tpu.ops.stain import apply_stain_transform
        from tiatoolbox_tpu.tools.stainnorm import MacenkoNormalizer

        target = synthetic_he_patch((64, 64), seed=4)
        norm = MacenkoNormalizer()
        norm.fit(target)
        consts = norm.prepare_tile_transform(target)
        tiles = np.stack([target] * 3)
        out = np.asarray(
            apply_stain_transform(
                tiles, consts["conc_proj"], consts["target_stains"],
                consts["conc_scale"],
            )
        )
        assert out.shape == tiles.shape
        assert out.dtype == np.uint8
