"""Tests for the WSI reader stack.

Runs a shared behaviour suite over reader classes (parametrized, like
the reference's reader-matrix tests).
"""

from __future__ import annotations

import numpy as np
import pytest

from tiatoolbox_tpu.data.synth import make_synthetic_slide, synthetic_he_patch
from tiatoolbox_tpu.utils.exceptions import FileNotSupportedError
from tiatoolbox_tpu.utils.zarrlite import ZarrGroup
from tiatoolbox_tpu.wsicore.wsimeta import WSIMeta
from tiatoolbox_tpu.wsicore.wsireader import (
    NGFFWSIReader,
    TIFFWSIReader,
    VirtualWSIReader,
    WSIReader,
)

SLIDE_W, SLIDE_H = 1024, 768


@pytest.fixture(scope="module")
def slide_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("wsi") / "slide.tiff"
    make_synthetic_slide(path, size=(SLIDE_W, SLIDE_H), mpp=0.5, objective_power=20)
    return path


@pytest.fixture(scope="module")
def ngff_path(tmp_path_factory):
    img = synthetic_he_patch((SLIDE_W, SLIDE_H), seed=11)
    root = tmp_path_factory.mktemp("wsi") / "slide.zarr"
    grp = ZarrGroup.create(root)
    import cv2

    levels = [img]
    for _ in range(2):
        prev = levels[-1]
        levels.append(
            cv2.resize(prev, (prev.shape[1] // 2, prev.shape[0] // 2))
        )
    datasets = []
    for i, lv in enumerate(levels):
        grp.from_array(str(i), lv)
        scale = 2.0**i
        datasets.append(
            {
                "path": str(i),
                "coordinateTransformations": [
                    {"type": "scale", "scale": [0.5 * scale, 0.5 * scale, 1.0]}
                ],
            }
        )
    grp.attrs = {
        "multiscales": [
            {
                "version": "0.4",
                "axes": [
                    {"name": "y", "type": "space", "unit": "micrometer"},
                    {"name": "x", "type": "space", "unit": "micrometer"},
                    {"name": "c", "type": "channel"},
                ],
                "datasets": datasets,
            }
        ]
    }
    return root


@pytest.fixture(scope="module")
def dicom_path(tmp_path_factory):
    from tiatoolbox_tpu.data.synth import make_synthetic_dicom

    path = tmp_path_factory.mktemp("rdr") / "d.dcm"
    make_synthetic_dicom(path, size=(SLIDE_W, SLIDE_H), frame_size=128, mpp=0.5)
    return path


@pytest.fixture(scope="module")
def jp2_path(tmp_path_factory):
    import cv2

    path = tmp_path_factory.mktemp("rdr") / "j.jp2"
    img = synthetic_he_patch((SLIDE_W, SLIDE_H), seed=11)
    cv2.imwrite(str(path), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    return path


@pytest.fixture(scope="module")
def mrxs_path(tmp_path_factory):
    from mirax_synth import write_synthetic_mrxs

    return write_synthetic_mrxs(
        tmp_path_factory.mktemp("rdr") / "m",
        grid_nx=SLIDE_W // 64,
        grid_ny=SLIDE_H // 64,
        tile=64,
        n_levels=2,
        mpp=0.5,
    )


@pytest.fixture()
def reader(request, slide_path, ngff_path, dicom_path, jp2_path, mrxs_path):
    kind = request.param
    if kind == "tiff":
        return WSIReader.open(slide_path)
    if kind == "ngff":
        return WSIReader.open(ngff_path)
    if kind == "dicom":
        return WSIReader.open(dicom_path)
    if kind == "jp2":
        return WSIReader.open(jp2_path, mpp=(0.5, 0.5))
    if kind == "mirax":
        return WSIReader.open(mrxs_path)
    img = synthetic_he_patch((SLIDE_W, SLIDE_H), seed=11)
    info = WSIMeta(
        slide_dimensions=(SLIDE_W, SLIDE_H),
        axes="YXS",
        level_dimensions=[(SLIDE_W, SLIDE_H)],
        level_downsamples=[1.0],
        mpp=(0.5, 0.5),
        objective_power=20,
        raw={},
    )
    return VirtualWSIReader(img, info=info)


ALL_READERS = pytest.mark.parametrize(
    "reader",
    ["tiff", "ngff", "virtual", "dicom", "jp2", "mirax"],
    indirect=True,
)


class TestReaderMatrix:
    @ALL_READERS
    def test_info(self, reader) -> None:
        assert reader.info.slide_dimensions == (SLIDE_W, SLIDE_H)

    @ALL_READERS
    def test_read_rect_shape(self, reader) -> None:
        region = reader.read_rect((64, 64), (224, 224))
        assert region.shape == (224, 224, 3)
        assert region.dtype == np.uint8

    @ALL_READERS
    def test_read_rect_baseline_units(self, reader) -> None:
        region = reader.read_rect((0, 0), (128, 128), resolution=0.5, units="baseline")
        assert region.shape == (128, 128, 3)

    @ALL_READERS
    def test_read_bounds_scaling(self, reader) -> None:
        region = reader.read_bounds((0, 0, 512, 512), resolution=0.5, units="baseline")
        assert region.shape == (256, 256, 3)

    @ALL_READERS
    def test_out_of_bounds_padded(self, reader) -> None:
        region = reader.read_rect(
            (SLIDE_W - 32, SLIDE_H - 32), (64, 64), resolution=0, units="level"
        )
        assert region.shape == (64, 64, 3)

    @ALL_READERS
    def test_thumbnail(self, reader) -> None:
        thumb = reader.slide_thumbnail(resolution=8.0, units="baseline") \
            if reader.info.objective_power is None else reader.slide_thumbnail()
        assert thumb.ndim == 3

    @ALL_READERS
    def test_read_region_openslide_compat(self, reader) -> None:
        region = reader.read_region((32, 32), 0, (96, 96))
        assert region.shape == (96, 96, 3)

    @ALL_READERS
    def test_read_rect_equals_read_bounds_at_level0(self, reader) -> None:
        rect = reader.read_rect((64, 96), (128, 64), resolution=0, units="level")
        bounds = reader.read_bounds(
            (64, 96, 64 + 128, 96 + 64), resolution=0, units="level"
        )
        assert np.array_equal(rect, bounds)

    @ALL_READERS
    def test_read_rect_resolution_coord_space(self, reader) -> None:
        region = reader.read_rect(
            (16, 16), (64, 64), resolution=0.5, units="baseline",
            coord_space="resolution",
        )
        assert region.shape == (64, 64, 3)

    @ALL_READERS
    def test_negative_location_pads(self, reader) -> None:
        region = reader.read_rect((-32, -32), (64, 64), resolution=0, units="level")
        assert region.shape == (64, 64, 3)
        assert (region[:16, :16] == 0).all()  # constant pad default

    @ALL_READERS
    def test_pad_constant_value(self, reader) -> None:
        region = reader.read_rect(
            (-32, -32), (64, 64), resolution=0, units="level",
            pad_mode="constant", pad_constant_values=255,
        )
        assert (region[:16, :16] == 255).all()

    @ALL_READERS
    def test_slide_dimensions_halve_at_half_resolution(self, reader) -> None:
        full = reader.slide_dimensions(0, "level")
        half = reader.slide_dimensions(0.5, "baseline")
        assert abs(half[0] - full[0] / 2) <= 1
        assert abs(half[1] - full[1] / 2) <= 1

    @ALL_READERS
    def test_fractional_resolution_read(self, reader) -> None:
        region = reader.read_rect((0, 0), (100, 100), resolution=0.3, units="baseline")
        assert region.shape == (100, 100, 3)

    @ALL_READERS
    def test_interpolation_none_returns_level_pixels(self, reader) -> None:
        region = reader.read_bounds(
            (0, 0, 200, 200), resolution=0, units="level", interpolation="none"
        )
        assert region.shape[0] >= 200 and region.shape[1] >= 200

    @ALL_READERS
    def test_info_as_dict_roundtrip(self, reader) -> None:
        d = reader.info.as_dict()
        assert tuple(d["slide_dimensions"]) == (SLIDE_W, SLIDE_H)
        assert "level_downsamples" in d

    @ALL_READERS
    def test_tissue_mask_matrix(self, reader) -> None:
        mask = reader.tissue_mask(method="otsu", resolution=8.0, units="baseline")
        assert mask.img.ndim == 2
        assert mask.img.dtype == np.uint8 or mask.img.dtype == bool


class TestTIFFReader:
    def test_mpp_power_metadata(self, slide_path) -> None:
        wsi = WSIReader.open(slide_path)
        assert np.allclose(wsi.info.mpp, [0.5, 0.5])
        assert wsi.info.objective_power == 20

    def test_pixel_content_matches_source(self, slide_path) -> None:
        wsi = WSIReader.open(slide_path)
        src = synthetic_he_patch((SLIDE_W, SLIDE_H), seed=11)
        region = wsi.read_rect((100, 100), (64, 64), resolution=0, units="level")
        crop = src[100:164, 100:164]
        assert np.abs(region.astype(float) - crop.astype(float)).mean() < 4

    def test_level_read_consistency(self, slide_path) -> None:
        wsi = WSIReader.open(slide_path)
        full = wsi.read_bounds((0, 0, 256, 256), resolution=0, units="level")
        half = wsi.read_bounds((0, 0, 256, 256), resolution=1, units="level")
        assert full.shape == (256, 256, 3)
        assert half.shape == (128, 128, 3)

    def test_read_mpp_resolution(self, slide_path) -> None:
        wsi = WSIReader.open(slide_path)
        r = wsi.read_rect((0, 0), (100, 100), resolution=1.0, units="mpp")
        assert r.shape == (100, 100, 3)

    def test_convert_resolution_units(self, slide_path) -> None:
        wsi = WSIReader.open(slide_path)
        out = wsi.convert_resolution_units(0.5, "mpp")
        assert out["baseline"] == pytest.approx(1.0)
        assert out["power"] == pytest.approx(20.0)

    def test_tissue_mask(self, slide_path) -> None:
        wsi = WSIReader.open(slide_path)
        mask = wsi.tissue_mask(resolution=4, units="baseline")
        assert isinstance(mask, VirtualWSIReader)
        assert mask.mode == "bool"
        mask_region = mask.read_rect((0, 0), (64, 64))
        assert mask_region.shape == (64, 64)

    def test_save_tiles(self, slide_path, tmp_path) -> None:
        wsi = WSIReader.open(slide_path)
        wsi.save_tiles(tmp_path, tile_objective_value=10, tile_read_size=(256, 256))
        outdir = tmp_path / slide_path.name
        assert (outdir / "Output.csv").exists()
        assert (outdir / "slide_thumbnail.jpg").exists()
        assert len(list(outdir.glob("Tile_*.jpg"))) == 4  # 512x384 at 10x → 2x2 tiles


class TestVirtualReader:
    def test_mask_mode_nearest(self) -> None:
        mask = np.zeros((64, 64), dtype=np.uint8)
        mask[16:48, 16:48] = 1
        info = WSIMeta(
            slide_dimensions=(128, 128),
            axes="YXS",
            level_dimensions=[(128, 128)],
            level_downsamples=[1.0],
            mpp=(0.5, 0.5),
            raw={},
        )
        v = VirtualWSIReader(mask, info=info, mode="bool")
        out = v.read_bounds((0, 0, 128, 128), resolution=0, units="level")
        assert set(np.unique(out)) <= {0, 1}

    def test_feature_mode_warning(self) -> None:
        arr = np.zeros((32, 32, 7), dtype=np.float32)
        v = VirtualWSIReader(arr, mode="rgb")
        assert v.mode == "feature"

    def test_invalid_mode(self) -> None:
        with pytest.raises(ValueError, match="Invalid mode"):
            VirtualWSIReader(np.zeros((8, 8, 3), np.uint8), mode="bogus")


class TestDispatch:
    def test_open_ndarray(self) -> None:
        reader = WSIReader.open(np.zeros((16, 16, 3), np.uint8))
        assert isinstance(reader, VirtualWSIReader)

    def test_open_tiff(self, slide_path) -> None:
        assert isinstance(WSIReader.open(slide_path), TIFFWSIReader)

    def test_open_ngff(self, ngff_path) -> None:
        reader = WSIReader.open(ngff_path)
        assert isinstance(reader, NGFFWSIReader)
        assert np.allclose(reader.info.mpp, [0.5, 0.5])

    def test_open_png(self, tmp_path) -> None:
        from tiatoolbox_tpu.utils.misc import imwrite

        path = tmp_path / "x.png"
        imwrite(path, np.zeros((8, 8, 3), np.uint8))
        assert isinstance(WSIReader.open(path), VirtualWSIReader)

    def test_open_missing(self) -> None:
        with pytest.raises(FileNotFoundError):
            WSIReader.open("/nonexistent/file.svs")

    def test_open_unsupported(self, tmp_path) -> None:
        path = tmp_path / "f.xyz"
        path.write_text("hello")
        with pytest.raises(FileNotSupportedError):
            WSIReader.open(path)

    def test_open_jp2(self, tmp_path) -> None:
        import cv2

        img = synthetic_he_patch((300, 200), seed=4)
        path = tmp_path / "x.jp2"
        cv2.imwrite(str(path), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        reader = WSIReader.open(path)
        assert reader.info.slide_dimensions == (300, 200)
        region = reader.read_rect((0, 0), (64, 64))
        assert region.shape == (64, 64, 3)

    def test_jp2_lazy_reduced_decode(self, tmp_path) -> None:
        """Low-res JP2 reads use reduced decoding, never full-res."""
        import cv2

        img = synthetic_he_patch((2048, 1536), seed=5)
        path = tmp_path / "big.jp2"
        cv2.imwrite(str(path), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        reader = WSIReader.open(path)
        # dims from the SIZ header: nothing decoded yet
        assert reader.info.slide_dimensions == (2048, 1536)
        assert reader._planes == {}
        thumb = reader.slide_thumbnail(resolution=2, units="level")
        assert thumb.shape[1] == 512
        assert 1 not in reader._planes  # full plane never materialised
        assert 4 in reader._planes
        # a full-res read decodes level 0 and matches the source closely
        region = reader.read_rect((100, 100), (64, 64), resolution=0, units="level")
        assert 1 in reader._planes
        src = img[100:164, 100:164]
        assert np.abs(region.astype(int) - src.astype(int)).mean() < 4
