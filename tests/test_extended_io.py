"""Tests for DICOM parsing, fsspec references, datasets, misc long-tail."""

from __future__ import annotations

import numpy as np
import pytest

from tiatoolbox_tpu.data.synth import (
    make_synthetic_dicom,
    synthetic_he_patch,
)


class TestDicom:
    @pytest.fixture(scope="class")
    def dcm_path(self, tmp_path_factory):
        path = tmp_path_factory.mktemp("dcm") / "slide.dcm"
        make_synthetic_dicom(path, size=(512, 384), mpp=0.5)
        return path

    def test_parse(self, dcm_path) -> None:
        from tiatoolbox_tpu.wsicore.dicom import DicomSlide

        slide = DicomSlide(dcm_path)
        inst = slide.levels[0]
        assert inst.total_shape == (384, 512)
        assert inst.n_frames == 12
        assert inst.mpp == (0.5, 0.5)

    def test_region_exact(self, dcm_path) -> None:
        from tiatoolbox_tpu.wsicore.dicom import DicomSlide

        slide = DicomSlide(dcm_path)
        region = slide.read_region(0, (100, 50), (200, 150))
        src = synthetic_he_patch((512, 384), seed=21)
        assert np.array_equal(region, src[50:200, 100:300])

    def test_reader_dispatch(self, dcm_path) -> None:
        from tiatoolbox_tpu.wsicore.wsireader import DICOMWSIReader, WSIReader

        reader = WSIReader.open(dcm_path)
        assert isinstance(reader, DICOMWSIReader)
        assert np.allclose(reader.info.mpp, [0.5, 0.5])
        region = reader.read_rect((0, 0), (64, 64))
        assert region.shape == (64, 64, 3)


class TestFsspec:
    def test_reference_roundtrip(self, tmp_path) -> None:
        import cv2

        from tiatoolbox_tpu.utils.tiff_to_fsspec import tiff_to_fsspec
        from tiatoolbox_tpu.wsicore.store_reader import FsspecJsonWSIReader
        from tiatoolbox_tpu.wsicore.tiffio import TiffPyramidWriter

        img = synthetic_he_patch((512, 384), seed=4)
        tiff_path = tmp_path / "f.tiff"
        writer = TiffPyramidWriter(tiff_path, tile_size=128, compression="deflate")
        writer.write([img, cv2.resize(img, (256, 192))])
        json_path = tmp_path / "f.json"
        tiff_to_fsspec(tiff_path, f"file://{tiff_path}", out_path=json_path)
        reader = FsspecJsonWSIReader(json_path)
        assert reader.info.slide_dimensions == (512, 384)
        region = reader.read_rect((50, 60), (100, 100), resolution=0, units="level")
        assert np.array_equal(region, img[60:160, 50:150])

    def test_jpeg_rejected(self, tmp_path) -> None:
        from tiatoolbox_tpu.data.synth import make_synthetic_slide
        from tiatoolbox_tpu.utils.tiff_to_fsspec import tiff_to_fsspec

        path = tmp_path / "j.tiff"
        make_synthetic_slide(path, size=(256, 256))
        with pytest.raises(ValueError, match="compression"):
            tiff_to_fsspec(path, "file://x")


class TestDatasets:
    def test_kather_synthetic_standin(self, tmp_path, monkeypatch) -> None:
        from tiatoolbox_tpu import rcParam
        from tiatoolbox_tpu.models.dataset.info import KatherPatchDataset

        monkeypatch.setitem(rcParam, "TIATOOLBOX_HOME", tmp_path)
        ds = KatherPatchDataset()
        assert len(ds) == 128
        item = ds[0]
        assert item["image"].shape == (224, 224, 3)
        assert 0 <= item["label"] < 9

    def test_kather_local_dir(self, tmp_path) -> None:
        from tiatoolbox_tpu.models.dataset.info import KatherPatchDataset
        from tiatoolbox_tpu.utils.misc import imwrite

        for cls in ("TUM", "STR"):
            d = tmp_path / cls
            d.mkdir()
            imwrite(d / "p1.tif", synthetic_he_patch((64, 64), seed=1))
        ds = KatherPatchDataset(tmp_path)
        assert len(ds) == 2


def test_sam_requires_checkpoint() -> None:
    from tiatoolbox_tpu.models.architecture.sam import SAM

    with pytest.raises((FileNotFoundError, OSError, ValueError, Exception)):
        SAM(checkpoint_path="/nonexistent/sam")


def test_profiling_stage_timer() -> None:
    from tiatoolbox_tpu.utils.profiling import StageTimer, log_memory

    timer = StageTimer()
    with timer.stage("x", items=10):
        pass
    summary = timer.summary()
    assert "x" in summary
    assert summary["x"]["items"] == 10
    stats = log_memory()
    assert isinstance(stats, dict)
