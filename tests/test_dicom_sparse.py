"""TILED_SPARSE frame maps + concatenated DICOM instances.

Reference behaviour via wsidicom (``wsicore/wsireader.py:5191-5724``):
sparse levels place frames by explicit PlanePositionSlideSequence
positions with background fill for unoccupied tiles; concatenated
instances (shared ConcatenationUID, frame offsets) form one level.
"""

from __future__ import annotations

import numpy as np
import pytest

from tiatoolbox_tpu.data.synth import make_synthetic_dicom, synthetic_he_patch
from tiatoolbox_tpu.wsicore.dicom import DicomSlide

W, H, F = 512, 384, 128


@pytest.fixture(scope="module")
def full_slide(tmp_path_factory):
    path = tmp_path_factory.mktemp("dsp") / "full.dcm"
    make_synthetic_dicom(path, size=(W, H), frame_size=F, mpp=0.5, seed=5)
    return DicomSlide(path)


class TestSparse:
    @pytest.fixture(scope="class")
    def sparse_slide(self, tmp_path_factory):
        path = tmp_path_factory.mktemp("dsp") / "sparse.dcm"
        make_synthetic_dicom(
            path, size=(W, H), frame_size=F, mpp=0.5, seed=5, sparse=True
        )
        return DicomSlide(path)

    def test_occupied_cells_match_full(self, sparse_slide, full_slide) -> None:
        """Checkerboard-kept tiles read identically to the dense slide."""
        for fy, fx in [(0, 0), (1, 1), (0, 2), (2, 0)]:
            got = sparse_slide.read_region(0, (fx * F, fy * F), (F, F))
            ref = full_slide.read_region(0, (fx * F, fy * F), (F, F))
            np.testing.assert_array_equal(got, ref)

    def test_unoccupied_cells_are_background_white(self, sparse_slide) -> None:
        got = sparse_slide.read_region(0, (F, 0), (F, F))  # (0,1): dropped
        assert np.all(got == 255)

    def test_mixed_window_across_sparse_boundary(
        self, sparse_slide, full_slide
    ) -> None:
        """A window straddling kept+dropped tiles mixes data and fill."""
        got = sparse_slide.read_region(0, (64, 0), (F, F))
        ref = full_slide.read_region(0, (64, 0), (F, F))
        np.testing.assert_array_equal(got[:, :64], ref[:, :64])  # cell (0,0)
        assert np.all(got[:, 64:] == 255)  # cell (0,1) dropped

    def test_out_of_matrix_padding_stays_zero(self, sparse_slide) -> None:
        got = sparse_slide.read_region(0, (W - 10, H - 10), (40, 40))
        assert np.all(got[20:, :] == 0)
        assert np.all(got[:, 20:] == 0)

    def test_sparse_flag_and_n_frames(self, sparse_slide) -> None:
        lv = sparse_slide.levels[0]
        assert any(p.is_sparse for p in lv.parts)
        # checkerboard on a 4x3 grid keeps ceil(12/2) = 6 frames
        assert lv.n_frames == 6


class TestConcatenation:
    @pytest.fixture(scope="class")
    def concat_dir(self, tmp_path_factory):
        tmp = tmp_path_factory.mktemp("dcat")
        paths = make_synthetic_dicom(
            tmp / "c.dcm", size=(W, H), frame_size=F, mpp=0.5, seed=5,
            n_concat=3,
        )
        assert len(paths) == 3
        return tmp

    def test_concat_group_is_one_level(self, concat_dir) -> None:
        slide = DicomSlide(concat_dir)
        assert len(slide.levels) == 1
        assert len(slide.levels[0].parts) == 3
        assert slide.levels[0].n_frames == 12

    def test_concat_reads_match_single_instance(
        self, concat_dir, full_slide
    ) -> None:
        slide = DicomSlide(concat_dir)
        got = slide.read_region(0, (0, 0), (W, H))
        ref = full_slide.read_region(0, (0, 0), (W, H))
        np.testing.assert_array_equal(got, ref)

    def test_sparse_and_concatenated(self, tmp_path_factory, full_slide) -> None:
        tmp = tmp_path_factory.mktemp("dcs")
        make_synthetic_dicom(
            tmp / "cs.dcm", size=(W, H), frame_size=F, mpp=0.5, seed=5,
            sparse=True, n_concat=2,
        )
        slide = DicomSlide(tmp)
        assert len(slide.levels) == 1
        got = slide.read_region(0, (0, 0), (W, H))
        ref = full_slide.read_region(0, (0, 0), (W, H))
        for fy in range(3):
            for fx in range(4):
                sl = np.s_[fy * F : (fy + 1) * F, fx * F : (fx + 1) * F]
                if (fy + fx) % 2 == 0:
                    np.testing.assert_array_equal(got[sl], ref[sl])
                else:
                    assert np.all(got[sl] == 255)


class TestReaderIntegration:
    def test_wsireader_over_sparse_dicom(self, tmp_path_factory) -> None:
        from tiatoolbox_tpu.wsicore.wsireader import WSIReader

        path = tmp_path_factory.mktemp("dri") / "s.dcm"
        make_synthetic_dicom(
            path, size=(W, H), frame_size=F, mpp=0.5, seed=5, sparse=True
        )
        reader = WSIReader.open(path)
        assert tuple(reader.info.slide_dimensions) == (W, H)
        region = reader.read_rect((0, 0), (256, 256), resolution=0, units="level")
        assert region.shape == (256, 256, 3)
        # top-left cell kept, cell (0,1) fill-white
        assert np.all(region[:128, 128:] == 255)
        expected = synthetic_he_patch((W, H), seed=5)[:128, :128]
        np.testing.assert_array_equal(region[:128, :128], expected)


class TestImplicitVR:
    """Implicit-VR little-endian datasets (no VR bytes in elements).

    Defined-length sequences are indistinguishable from binary values
    without a dictionary; the parser recurses into the known WSI
    sequence tags and decodes raw-binary US/UL/SL integer values.
    """

    def test_implicit_full_matches_explicit(self, tmp_path_factory, full_slide) -> None:
        path = tmp_path_factory.mktemp("div") / "imp.dcm"
        make_synthetic_dicom(
            path, size=(W, H), frame_size=F, mpp=0.5, seed=5, explicit=False
        )
        slide = DicomSlide(path)
        got = slide.read_region(0, (0, 0), (W, H))
        ref = full_slide.read_region(0, (0, 0), (W, H))
        np.testing.assert_array_equal(got, ref)

    def test_implicit_sparse_positions_respected(
        self, tmp_path_factory, full_slide
    ) -> None:
        path = tmp_path_factory.mktemp("div") / "imp_sparse.dcm"
        make_synthetic_dicom(
            path, size=(W, H), frame_size=F, mpp=0.5, seed=5,
            sparse=True, explicit=False,
        )
        slide = DicomSlide(path)
        lv = slide.levels[0]
        assert any(p.is_sparse for p in lv.parts)
        ref = full_slide.read_region(0, (0, 0), (W, H))
        got = slide.read_region(0, (0, 0), (W, H))
        for fy in range(3):
            for fx in range(4):
                sl = np.s_[fy * F : (fy + 1) * F, fx * F : (fx + 1) * F]
                if (fy + fx) % 2 == 0:
                    np.testing.assert_array_equal(got[sl], ref[sl])
                else:
                    assert np.all(got[sl] == 255)

    def test_implicit_concat_offsets_decoded(
        self, tmp_path_factory, full_slide
    ) -> None:
        """Binary UL ConcatenationFrameOffsetNumber places each part."""
        tmp = tmp_path_factory.mktemp("divc")
        make_synthetic_dicom(
            tmp / "c.dcm", size=(W, H), frame_size=F, mpp=0.5, seed=5,
            n_concat=3, explicit=False,
        )
        slide = DicomSlide(tmp)
        assert len(slide.levels) == 1
        got = slide.read_region(0, (0, 0), (W, H))
        ref = full_slide.read_region(0, (0, 0), (W, H))
        np.testing.assert_array_equal(got, ref)


class TestImplicitAsciiLookalikeInts:
    """Implicit-VR binary integers whose LE bytes are ASCII digits.

    US 48 = b"0\\x00", UL 48 = b"0\\x00\\x00\\x00", SL 49 =
    b"1\\x00\\x00\\x00" — a text-first decode turns these into the
    WRONG small integers (48 -> 0, 49 -> 1) silently. The parser must
    decode known US/UL/SL tags binary-first (regression for the
    `_KNOWN_INT_VRS` parse-time decode).
    """

    AW, AH, AF = 576, 384, 48  # Rows/Columns = 48; 12x8 = 96 frames

    def test_rows_48_reads_identically_to_explicit(
        self, tmp_path_factory
    ) -> None:
        tmp = tmp_path_factory.mktemp("dascii")
        make_synthetic_dicom(
            tmp / "exp.dcm", size=(self.AW, self.AH), frame_size=self.AF,
            mpp=0.5, seed=7,
        )
        make_synthetic_dicom(
            tmp / "imp.dcm", size=(self.AW, self.AH), frame_size=self.AF,
            mpp=0.5, seed=7, explicit=False,
        )
        exp = DicomSlide(tmp / "exp.dcm")
        imp = DicomSlide(tmp / "imp.dcm")
        assert imp.levels[0].parts[0].ds.get_int((0x0028, 0x0010)) == 48
        got = imp.read_region(0, (0, 0), (self.AW, self.AH))
        ref = exp.read_region(0, (0, 0), (self.AW, self.AH))
        np.testing.assert_array_equal(got, ref)

    def test_concat_offset_48_places_second_part(
        self, tmp_path_factory
    ) -> None:
        """96 frames in 2 parts: part 2's offset is UL 48 = b'0...'."""
        tmp = tmp_path_factory.mktemp("dascii")
        make_synthetic_dicom(
            tmp / "c.dcm", size=(self.AW, self.AH), frame_size=self.AF,
            mpp=0.5, seed=7, n_concat=2, explicit=False,
        )
        make_synthetic_dicom(
            tmp / "ref.dcm", size=(self.AW, self.AH), frame_size=self.AF,
            mpp=0.5, seed=7,
        )
        slide = DicomSlide(tmp)
        offsets = sorted(
            p.concatenation_offset for p in slide.levels[0].parts
        )
        assert offsets == [0, 48]
        got = slide.read_region(0, (0, 0), (self.AW, self.AH))
        ref = DicomSlide(tmp / "ref.dcm").read_region(
            0, (0, 0), (self.AW, self.AH)
        )
        np.testing.assert_array_equal(got, ref)

    def test_sparse_position_49_not_mistaken_for_1(
        self, tmp_path_factory
    ) -> None:
        """SL RowPosition 49 (= b'1\\x00\\x00\\x00') must stay 49."""
        tmp = tmp_path_factory.mktemp("dascii")
        make_synthetic_dicom(
            tmp / "s.dcm", size=(self.AW, self.AH), frame_size=self.AF,
            mpp=0.5, seed=7, sparse=True, explicit=False,
        )
        slide = DicomSlide(tmp / "s.dcm")
        part = slide.levels[0].parts[0]
        assert part.is_sparse
        # second grid row (checkerboard keeps fy+fx even → col 49):
        # 1-based position (49, 49), both coords ASCII-lookalike
        assert (49, 49) in part.ds.frame_positions
        assert all(r % 48 == 1 and c % 48 == 1
                   for r, c in part.ds.frame_positions)


class TestMixedOrganisationGroup:
    def test_dense_part_in_sparse_group_not_dropped(
        self, tmp_path_factory, full_slide
    ) -> None:
        """A part without per-frame positions concatenated with a
        sparse part keeps its frames (row-major via its concatenation
        offset) instead of silently reading as background."""
        from tiatoolbox_tpu.wsicore.dicom import TAG_DIM_ORG_TYPE, _DicomLevel

        tmp = tmp_path_factory.mktemp("dmix")
        make_synthetic_dicom(
            tmp / "c.dcm", size=(W, H), frame_size=F, mpp=0.5, seed=5,
            n_concat=2,
        )
        slide = DicomSlide(tmp)
        parts = sorted(
            slide.levels[0].parts, key=lambda p: p.concatenation_offset
        )
        assert len(parts) == 2 and not any(p.is_sparse for p in parts)
        # simulate part 0 carrying explicit per-frame positions (its
        # true row-major cells) while part 1 has none: the group is now
        # "sparse" but part 1's frames must still place by offset
        frames_across = -(-W // F)
        for local_idx in range(parts[0].n_frames):
            fy, fx = divmod(local_idx, frames_across)
            parts[0].ds.frame_positions.append((fy * F + 1, fx * F + 1))
        parts[0].ds.elements[TAG_DIM_ORG_TYPE] = b"TILED_SPARSE"
        assert parts[0].is_sparse
        slide.levels[0] = _DicomLevel(parts)
        got = slide.read_region(0, (0, 0), (W, H))
        ref = full_slide.read_region(0, (0, 0), (W, H))
        np.testing.assert_array_equal(got, ref)
