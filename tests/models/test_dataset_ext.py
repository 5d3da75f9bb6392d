"""Extended dataset + tissue-mask coverage.

Scenario set modeled on the reference's ``tests/models/test_dataset.py``
and ``tests/test_tissuemask.py``.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest

from tiatoolbox_tpu.data.synth import make_synthetic_slide, synthetic_he_patch
from tiatoolbox_tpu.models.dataset.classification import predefined_preproc_func
from tiatoolbox_tpu.models.dataset.dataset_abc import (
    PatchDataset,
    PatchDatasetABC,
    WSIPatchDataset,
)
from tiatoolbox_tpu.models.dataset.info import KatherPatchDataset
from tiatoolbox_tpu.tools.tissuemask import (
    MorphologicalMasker,
    OtsuTissueMasker,
    otsu_threshold,
)


@pytest.fixture(scope="module")
def slide_path(tmp_path_factory) -> str:
    path = tmp_path_factory.mktemp("dsext") / "s.tiff"
    make_synthetic_slide(path, size=(1024, 768), mpp=0.5, objective_power=20)
    return str(path)


class TestPatchDataset:
    def test_array_inputs(self) -> None:
        arr = np.zeros((5, 16, 16, 3), np.uint8)
        ds = PatchDataset(arr)
        assert len(ds) == 5
        item = ds[2]
        assert item["image"].shape == (16, 16, 3)

    def test_array_with_labels(self) -> None:
        arr = np.zeros((3, 8, 8, 3), np.uint8)
        ds = PatchDataset(arr, labels=[7, 8, 9])
        assert ds[1]["label"] == 8

    def test_list_of_arrays(self) -> None:
        imgs = [np.full((8, 8, 3), i, np.uint8) for i in range(4)]
        ds = PatchDataset(imgs)
        assert (ds[3]["image"] == 3).all()

    def test_list_of_paths(self, tmp_path) -> None:
        from tiatoolbox_tpu.utils.misc import imwrite

        paths = []
        for i in range(3):
            p = tmp_path / f"img{i}.png"
            imwrite(p, np.full((8, 8, 3), i * 10, np.uint8))
            paths.append(p)
        ds = PatchDataset(paths)
        assert (ds[2]["image"] == 20).all()

    def test_wrong_ndim_array_raises(self) -> None:
        with pytest.raises(ValueError, match="NHWC"):
            PatchDataset(np.zeros((8, 8, 3), np.uint8))

    def test_scalar_input_raises(self) -> None:
        with pytest.raises(ValueError, match="NHWC array or list"):
            PatchDataset(42)

    def test_preproc_func_applied(self) -> None:
        arr = np.full((2, 4, 4, 3), 10, np.uint8)
        ds = PatchDataset(arr)
        ds.preproc_func = lambda img: img * 2
        assert (ds[0]["image"] == 20).all()

    def test_default_preproc_identity(self) -> None:
        patch = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
        assert np.array_equal(PatchDatasetABC.preproc(patch), patch)

    def test_load_img(self, tmp_path) -> None:
        from tiatoolbox_tpu.utils.misc import imwrite

        img = np.random.default_rng(0).integers(0, 255, (8, 8, 3), np.uint8)
        p = tmp_path / "x.png"
        imwrite(p, img)
        assert np.array_equal(PatchDatasetABC.load_img(p), img)


class TestKatherDataset:
    def test_synthetic_standin(self) -> None:
        ds = KatherPatchDataset(save_dir_path=None)
        assert len(ds) == 128
        item = ds[0]
        assert item["image"].shape == (224, 224, 3)
        assert 0 <= item["label"] < 9
        assert len(ds.label_names) == 9

    def test_empty_dir_raises(self, tmp_path) -> None:
        with pytest.raises(ValueError, match="No Kather100k patches"):
            KatherPatchDataset(save_dir_path=tmp_path)

    def test_on_disk_layout(self, tmp_path) -> None:
        from tiatoolbox_tpu.models.dataset.info import KATHER_CLASSES
        from tiatoolbox_tpu.utils.misc import imwrite

        for cls_idx, name in enumerate(KATHER_CLASSES[:2]):
            d = tmp_path / name
            d.mkdir()
            imwrite(d / "p0.tif", np.full((8, 8, 3), cls_idx, np.uint8))
        ds = KatherPatchDataset(save_dir_path=tmp_path)
        assert len(ds) == 2
        labels = {ds[i]["label"] for i in range(2)}
        assert labels == {0, 1}

    def test_predefined_preproc(self) -> None:
        fn = predefined_preproc_func("kather100k")
        patch = np.full((4, 4, 3), 128, np.uint8)
        out = fn(patch)
        assert out.shape == (4, 4, 3)

    def test_predefined_preproc_unknown(self) -> None:
        with pytest.raises(ValueError, match="does not exist"):
            predefined_preproc_func("not-a-dataset")


class TestWSIPatchDataset:
    def test_invalid_mode(self, slide_path) -> None:
        with pytest.raises(ValueError, match="not supported"):
            WSIPatchDataset(slide_path, mode="movie", patch_input_shape=(32, 32))

    @pytest.mark.parametrize(
        "shape", [(32.5, 32), (-32, 32), (32, 32, 32)]
    )
    def test_invalid_patch_shape(self, slide_path, shape) -> None:
        with pytest.raises(ValueError, match="patch_input_shape"):
            WSIPatchDataset(
                slide_path,
                patch_input_shape=shape,
                resolution=0,
                units="level",
                auto_get_mask=False,
            )

    @pytest.mark.parametrize("stride", [(16.5, 16), (-16, 16), (16, 16, 16)])
    def test_invalid_stride(self, slide_path, stride) -> None:
        with pytest.raises(ValueError, match="stride_shape"):
            WSIPatchDataset(
                slide_path,
                patch_input_shape=(32, 32),
                stride_shape=stride,
                resolution=0,
                units="level",
                auto_get_mask=False,
            )

    def test_grid_count_and_item_shape(self, slide_path) -> None:
        ds = WSIPatchDataset(
            slide_path,
            patch_input_shape=(256, 256),
            stride_shape=(256, 256),
            resolution=0,
            units="level",
            auto_get_mask=False,
        )
        assert len(ds) == 4 * 3  # 1024x768 / 256
        item = ds[0]
        assert item["image"].shape == (256, 256, 3)
        assert "coords" in item

    def test_stride_denser_than_patch(self, slide_path) -> None:
        full = WSIPatchDataset(
            slide_path,
            patch_input_shape=(256, 256),
            resolution=0,
            units="level",
            auto_get_mask=False,
        )
        dense = WSIPatchDataset(
            slide_path,
            patch_input_shape=(256, 256),
            stride_shape=(128, 128),
            resolution=0,
            units="level",
            auto_get_mask=False,
        )
        assert len(dense) > len(full)

    def test_tile_mode_from_array(self) -> None:
        img = synthetic_he_patch(size=(512, 384), seed=1)
        ds = WSIPatchDataset(
            img,
            mode="tile",
            patch_input_shape=(128, 128),
            auto_get_mask=False,
        )
        assert ds.units == "baseline"
        assert ds.resolution == 1.0
        assert len(ds) == 4 * 3

    def test_ndarray_mask_filters(self, slide_path) -> None:
        # Mask off the right half of the slide.
        mask = np.zeros((768, 1024), np.uint8)
        mask[:, :512] = 1
        full = WSIPatchDataset(
            slide_path,
            patch_input_shape=(256, 256),
            resolution=0,
            units="level",
            auto_get_mask=False,
        )
        masked = WSIPatchDataset(
            slide_path,
            mask_path=mask,
            patch_input_shape=(256, 256),
            resolution=0,
            units="level",
        )
        assert len(masked) == len(full) // 2
        assert all(c[0] < 512 for c in masked.inputs)

    def test_mask_image_file(self, slide_path, tmp_path) -> None:
        from tiatoolbox_tpu.utils.misc import imwrite

        mask = np.zeros((768, 1024, 3), np.uint8)
        mask[:256, :256] = 255
        mask_path = tmp_path / "mask.png"
        imwrite(mask_path, mask)
        ds = WSIPatchDataset(
            slide_path,
            mask_path=mask_path,
            patch_input_shape=(256, 256),
            resolution=0,
            units="level",
        )
        assert len(ds) == 1
        assert tuple(ds.inputs[0][:2]) == (0, 0)

    def test_min_mask_ratio(self, slide_path) -> None:
        # Mask covers one quarter of the top-left patch only.
        mask = np.zeros((768, 1024), np.uint8)
        mask[:128, :128] = 1
        loose = WSIPatchDataset(
            slide_path,
            mask_path=mask,
            patch_input_shape=(256, 256),
            resolution=0,
            units="level",
            min_mask_ratio=0.0,
        )
        assert len(loose) == 1
        with pytest.raises(ValueError, match="No patch coordinates"):
            WSIPatchDataset(
                slide_path,
                mask_path=mask,
                patch_input_shape=(256, 256),
                resolution=0,
                units="level",
                min_mask_ratio=0.5,
            )

    def test_patch_output_shape_coords(self, slide_path) -> None:
        ds = WSIPatchDataset(
            slide_path,
            patch_input_shape=(256, 256),
            stride_shape=(128, 128),
            patch_output_shape=(128, 128),
            resolution=0,
            units="level",
            auto_get_mask=False,
        )
        assert len(ds.outputs) == len(ds.inputs)
        # Output windows are centred inside the input windows.
        in0 = ds.inputs[0]
        out0 = ds.outputs[0]
        assert out0[0] >= in0[0] and out0[2] <= in0[2]


class TestOtsuTissueMasker:
    def test_fit_transform_slide_thumb(self, slide_path) -> None:
        from tiatoolbox_tpu.wsicore.wsireader import WSIReader

        reader = WSIReader.open(slide_path)
        thumb = reader.slide_thumbnail(resolution=4.0, units="baseline")
        masker = OtsuTissueMasker()
        masks = masker.fit_transform(thumb[None])
        assert masks.shape == (1, *thumb.shape[:2])
        assert masks.dtype == bool
        assert 0 < masks.sum() < masks.size

    def test_greyscale_input(self) -> None:
        # Tissue values need spread: Otsu's argmax convention puts the
        # threshold AT the tissue value for exactly-two-valued images
        # (matching skimage), and the mask test is strict `<`.
        rng = np.random.default_rng(0)
        img = np.full((32, 32, 1), 255, np.uint8)
        img[8:24, 8:24, 0] = rng.integers(30, 60, (16, 16), np.uint8)
        img[16, 16, 0] = 40
        masker = OtsuTissueMasker()
        masks = masker.fit_transform(img[None])
        assert masks[0, 16, 16]
        assert not masks[0, 0, 0]

    def test_fit_wrong_shape_raises(self) -> None:
        masker = OtsuTissueMasker()
        with pytest.raises(ValueError, match="4 dimensional"):
            masker.fit(np.zeros((16, 16, 3), np.uint8))

    def test_transform_before_fit_raises(self) -> None:
        with pytest.raises(SyntaxError, match="Fit"):
            OtsuTissueMasker().transform(np.zeros((1, 8, 8, 3), np.uint8))

    def test_otsu_threshold_bimodal(self) -> None:
        values = np.concatenate(
            [np.full(500, 40, np.uint8), np.full(500, 200, np.uint8)]
        )
        thresh = otsu_threshold(values)
        # argmax over a flat inter-class-variance plateau picks its first
        # bin (skimage convention) — the lower mode for a two-spike hist.
        assert 40 <= thresh < 200


class TestMorphologicalMasker:
    def test_transform_before_fit_raises(self) -> None:
        with pytest.raises(SyntaxError, match="Fit"):
            MorphologicalMasker().transform(np.zeros((1, 8, 8, 3), np.uint8))

    def test_conflicting_args_raise(self) -> None:
        with pytest.raises(ValueError, match="Only one"):
            MorphologicalMasker(mpp=32, power=1.25)
        with pytest.raises(ValueError, match="Only one"):
            MorphologicalMasker(mpp=32, kernel_size=5)

    def test_default_kernel_1x1(self) -> None:
        masker = MorphologicalMasker()
        assert masker.kernel_size == (1, 1)

    def test_kernel_from_mpp(self) -> None:
        # 32/mpp rule: mpp=32 → kernel 1x1; mpp=4 → kernel 8x8.
        assert MorphologicalMasker(mpp=32).kernel_size == (1, 1)
        assert MorphologicalMasker(mpp=4).kernel_size == (8, 8)

    def test_kernel_from_power(self) -> None:
        # power 1.25 → mpp 8 → kernel 4x4.
        assert MorphologicalMasker(power=1.25).kernel_size == (4, 4)

    def test_int_kernel_size(self) -> None:
        assert MorphologicalMasker(kernel_size=5).kernel_size == (5, 5)
        assert MorphologicalMasker(kernel_size=(3, 7)).kernel_size == (3, 7)

    def test_min_region_size_default_is_kernel_area(self) -> None:
        masker = MorphologicalMasker(kernel_size=3)
        assert masker.min_region_size == int(masker.kernel.sum())

    def test_small_regions_removed(self) -> None:
        rng = np.random.default_rng(0)
        img = np.full((64, 64, 3), 255, np.uint8)
        img[30:50, 30:50] = rng.integers(30, 60, (20, 20, 3), np.uint8)
        img[40, 40] = 40  # pixel safely below the Otsu threshold
        img[2:4, 2:4] = 40  # speck
        masker = MorphologicalMasker(kernel_size=1, min_region_size=10)
        mask = masker.fit_transform(img[None])[0]
        assert mask[40, 40]
        assert not mask[2, 2]

    def test_dilation_grows_mask(self) -> None:
        rng = np.random.default_rng(0)
        img = np.full((64, 64, 3), 255, np.uint8)
        img[24:40, 24:40] = rng.integers(30, 60, (16, 16, 3), np.uint8)
        small = MorphologicalMasker(kernel_size=1).fit_transform(img[None])[0]
        big = MorphologicalMasker(kernel_size=9).fit_transform(img[None])[0]
        assert big.sum() > small.sum()

    def test_reader_tissue_mask_morphological(self, slide_path) -> None:
        from tiatoolbox_tpu.wsicore.wsireader import WSIReader

        reader = WSIReader.open(slide_path)
        vr = reader.tissue_mask(method="morphological", resolution=8.0, units="baseline")
        mask = vr.img
        assert mask.ndim == 2
        assert mask.sum() > 0
