"""Tests for stain extraction, normalization, and augmentation."""

from __future__ import annotations

import numpy as np
import pytest

from tiatoolbox_tpu.data.synth import synthetic_he_patch
from tiatoolbox_tpu.tools import stainextract
from tiatoolbox_tpu.tools.stainnorm import get_normalizer
from tiatoolbox_tpu.utils.exceptions import MethodNotSupportedError


@pytest.fixture(scope="module")
def target() -> np.ndarray:
    return synthetic_he_patch((224, 224), seed=1)


@pytest.fixture(scope="module")
def source() -> np.ndarray:
    return synthetic_he_patch((224, 224), seed=42)


class TestExtractors:
    def test_ruifrok_fixed(self, source) -> None:
        ext = stainextract.RuifrokExtractor()
        mat = ext.get_stain_matrix(source)
        assert np.allclose(mat, [[0.65, 0.70, 0.29], [0.07, 0.99, 0.11]])

    def test_macenko_shape_and_norm(self, source) -> None:
        ext = stainextract.MacenkoExtractor()
        mat = ext.get_stain_matrix(source)
        assert mat.shape == (2, 3)
        assert np.allclose(np.linalg.norm(mat, axis=1), 1.0)
        # H (first row) should have larger red OD than E
        assert mat[0, 0] > mat[1, 0]

    def test_macenko_recovers_synth_stains(self, source) -> None:
        # synthetic data is generated with Ruifrok H&E vectors
        ext = stainextract.MacenkoExtractor()
        mat = ext.get_stain_matrix(source)
        ruifrok = stainextract.RUIFROK_HE / np.linalg.norm(
            stainextract.RUIFROK_HE, axis=1, keepdims=True
        )
        cos_h = mat[0] @ ruifrok[0]
        assert cos_h > 0.9

    def test_custom_validation(self) -> None:
        with pytest.raises(ValueError, match="shape"):
            stainextract.CustomExtractor(np.zeros((4, 4)))

    def test_vector_direction(self) -> None:
        v = np.array([[-1.0, 2.0], [3.0, -4.0]])
        out = stainextract.vectors_in_correct_direction(v.copy())
        assert out[0, 0] > 0

    def test_h_e_order(self) -> None:
        v1 = np.array([0.1, 0.5, 0.5])
        v2 = np.array([0.9, 0.3, 0.3])
        he = stainextract.h_and_e_in_right_order(v1, v2)
        assert he[0, 0] == 0.9


class TestNormalizers:
    @pytest.mark.parametrize("method", ["ruifrok", "macenko", "reinhard"])
    def test_fit_transform(self, method, target, source) -> None:
        norm = get_normalizer(method)
        norm.fit(target)
        out = norm.transform(source.copy())
        assert out.shape == source.shape
        assert out.dtype == np.uint8

    def test_transform_changes_stain(self, target, source) -> None:
        norm = get_normalizer("macenko")
        norm.fit(target)
        out = norm.transform(source.copy())
        assert not np.array_equal(out, source)

    def test_device_tile_path_matches_host(self, target, source) -> None:
        norm = get_normalizer("macenko")
        norm.fit(target)
        host = norm.transform(source.copy())
        consts = norm.prepare_tile_transform(source)
        dev = np.asarray(norm.transform_tiles(source[None], consts))[0]
        diff = np.abs(dev.astype(int) - host.astype(int))
        assert (diff <= 1).mean() > 0.999
        assert (diff == 0).mean() > 0.98

    def test_custom_normalizer(self, target, source) -> None:
        mat = np.array([[0.65, 0.70, 0.29], [0.07, 0.99, 0.11]])
        norm = get_normalizer("custom", stain_matrix=mat)
        norm.fit(target)
        out = norm.transform(source.copy())
        assert out.dtype == np.uint8

    def test_bad_method(self) -> None:
        with pytest.raises(MethodNotSupportedError):
            get_normalizer("bogus")

    def test_stain_matrix_with_noncustom(self) -> None:
        with pytest.raises(ValueError, match="custom"):
            get_normalizer("macenko", stain_matrix=np.eye(3))


class TestStainAugment:
    def test_augment_produces_valid(self, source) -> None:
        from tiatoolbox_tpu.tools.stainaugment import StainAugmentor

        aug = StainAugmentor(method="macenko", always_apply=True)
        out = aug(image=source.copy())["image"]
        assert out.shape == source.shape
        assert out.dtype == np.uint8

    def test_jax_batch_augment(self, source) -> None:
        import jax

        from tiatoolbox_tpu.tools.stainaugment import augment_tiles_jax
        from tiatoolbox_tpu.tools.stainextract import RUIFROK_HE

        tiles = np.stack([source] * 2)
        out = augment_tiles_jax(tiles, RUIFROK_HE, jax.random.PRNGKey(0))
        out = np.asarray(out)
        assert out.shape == tiles.shape
        assert not np.array_equal(out[0], out[1])  # different per-tile draws
