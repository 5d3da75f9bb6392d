"""Extended stain extraction / normalization / augmentation coverage.

Scenario set modeled on the reference's ``tests/test_stainnorm.py`` and
``tests/test_stainaugment.py`` behaviours not yet exercised by
``tests/test_stainnorm.py`` here.
"""

from __future__ import annotations

import numpy as np
import pytest

from tiatoolbox_tpu.data.synth import synthetic_he_patch
from tiatoolbox_tpu.tools.stainaugment import StainAugmentor
from tiatoolbox_tpu.tools.stainextract import (
    CustomExtractor,
    MacenkoExtractor,
    RuifrokExtractor,
    VahadaneExtractor,
    dl_output_for_h_and_e,
)
from tiatoolbox_tpu.tools.stainnorm import (
    CustomNormalizer,
    MacenkoNormalizer,
    ReinhardNormalizer,
    RuifrokNormalizer,
    StainNormalizer,
    VahadaneNormalizer,
    get_normalizer,
)
from tiatoolbox_tpu.utils.transforms import od2rgb, rgb2od


@pytest.fixture(scope="module")
def target():
    return synthetic_he_patch((96, 96), seed=5)


@pytest.fixture(scope="module")
def source():
    return synthetic_he_patch((96, 96), seed=23)


class TestExtractors:
    def test_ruifrok_matrix_values(self) -> None:
        mat = RuifrokExtractor().get_stain_matrix(None)
        assert mat.shape == (2, 3)
        assert np.allclose(mat[0], [0.65, 0.70, 0.29])
        assert np.allclose(mat[1], [0.07, 0.99, 0.11])

    def test_custom_extractor_returns_copy_semantics(self) -> None:
        mat = np.array([[0.6, 0.7, 0.3], [0.1, 0.9, 0.2]])
        ext = CustomExtractor(mat)
        out = ext.get_stain_matrix(np.zeros((4, 4, 3), np.uint8))
        assert np.allclose(out, mat)

    def test_macenko_rows_unit_norm(self, source) -> None:
        mat = MacenkoExtractor().get_stain_matrix(source)
        assert mat.shape == (2, 3)
        assert np.allclose(np.linalg.norm(mat, axis=1), 1.0, atol=1e-6)

    def test_macenko_h_before_e(self, source) -> None:
        mat = MacenkoExtractor().get_stain_matrix(source)
        # H&E ordering convention: first row is haematoxylin (more blue
        # absorption than eosin relative to green): row0[0] > row1[0]
        assert mat[0, 0] > mat[1, 0]

    def test_vahadane_rows_normalized(self, source) -> None:
        mat = VahadaneExtractor().get_stain_matrix(source)
        assert mat.shape == (2, 3)
        assert np.allclose(np.linalg.norm(mat, axis=1), 1.0, atol=1e-5)

    def test_dl_output_ordering(self) -> None:
        d = np.array([[0.2, 0.3, 0.9], [0.8, 0.5, 0.1]])
        out = dl_output_for_h_and_e(d)
        assert out.shape == (2, 3)

    def test_macenko_deterministic(self, source) -> None:
        a = MacenkoExtractor().get_stain_matrix(source)
        b = MacenkoExtractor().get_stain_matrix(source)
        assert np.array_equal(a, b)


class TestNormalizerContract:
    @pytest.mark.parametrize(
        "method", ["ruifrok", "macenko", "vahadane", "reinhard", "custom"]
    )
    def test_factory_types(self, method) -> None:
        kwargs = {}
        if method == "custom":
            kwargs["stain_matrix"] = RuifrokExtractor().get_stain_matrix(None)
        norm = get_normalizer(method, **kwargs)
        expected = {
            "ruifrok": RuifrokNormalizer,
            "macenko": MacenkoNormalizer,
            "vahadane": VahadaneNormalizer,
            "reinhard": ReinhardNormalizer,
            "custom": CustomNormalizer,
        }[method]
        assert isinstance(norm, expected)

    def test_factory_case_insensitive(self) -> None:
        assert isinstance(get_normalizer("Macenko"), MacenkoNormalizer)

    def test_transform_before_fit_raises(self, source) -> None:
        norm = MacenkoNormalizer()
        with pytest.raises((TypeError, AttributeError, ValueError)):
            norm.transform(source)

    def test_output_contract(self, target, source) -> None:
        for method in ("ruifrok", "macenko", "reinhard"):
            norm = get_normalizer(method)
            norm.fit(target)
            out = norm.transform(source)
            assert out.shape == source.shape
            assert out.dtype == np.uint8

    def test_identity_transform_close(self, target) -> None:
        # normalizing the target to itself must be near-identity
        norm = MacenkoNormalizer()
        norm.fit(target)
        out = norm.transform(target)
        assert np.abs(out.astype(int) - target.astype(int)).mean() < 12

    def test_transform_moves_toward_target_stats(self, target, source) -> None:
        norm = ReinhardNormalizer()
        norm.fit(target)
        # darken the source so its LAB stats differ measurably
        source = (source.astype(np.float32) * 0.75).astype(np.uint8)
        out = norm.transform(source)
        # channel means should land nearer the target than the source's
        t_mean = target.reshape(-1, 3).mean(0)
        s_mean = source.reshape(-1, 3).mean(0)
        o_mean = out.reshape(-1, 3).mean(0)
        assert np.linalg.norm(o_mean - t_mean) < np.linalg.norm(s_mean - t_mean)

    def test_get_concentrations_shape(self, source) -> None:
        mat = RuifrokExtractor().get_stain_matrix(None)
        conc = StainNormalizer.get_concentrations(source, mat)
        assert conc.shape == (source.shape[0] * source.shape[1], 2)

    def test_concentrations_reconstruct_od(self, source) -> None:
        mat = MacenkoExtractor().get_stain_matrix(source)
        conc = StainNormalizer.get_concentrations(source, mat)
        od = rgb2od(source).reshape(-1, 3)
        recon = conc @ mat
        # least-squares projection residual is modest for H&E content
        assert np.abs(recon - od).mean() < 0.2

    def test_transform_tiles_matches_single(self, target, source) -> None:
        norm = MacenkoNormalizer()
        norm.fit(target)
        single = norm.transform(source)
        tiles = np.stack([source, source])
        batched = np.asarray(norm.transform_tiles(tiles))
        assert batched.shape == (2, *source.shape)
        assert np.abs(batched[0].astype(int) - single.astype(int)).max() <= 1

    def test_reinhard_transform_tiles(self, target, source) -> None:
        norm = ReinhardNormalizer()
        norm.fit(target)
        tiles = np.stack([source] * 3)
        out = np.asarray(norm.transform_tiles(tiles))
        assert out.shape == (3, *source.shape)
        single = norm.transform(source)
        assert np.abs(out[1].astype(int) - single.astype(int)).max() <= 1

    def test_od_rgb_roundtrip(self, source) -> None:
        od = rgb2od(source)
        back = od2rgb(od)
        assert np.abs(back.astype(int) - source.astype(int)).max() <= 1

    def test_custom_normalizer_uses_given_matrix(self, target, source) -> None:
        mat = RuifrokExtractor().get_stain_matrix(None)
        norm = CustomNormalizer(mat)
        norm.fit(target)
        assert np.allclose(norm.stain_matrix_target, mat)
        out = norm.transform(source)
        assert out.shape == source.shape


class TestStainAugmentor:
    def test_augment_differs_from_input(self, source) -> None:
        aug = StainAugmentor(method="macenko")
        aug.rng = np.random.default_rng(7)
        out = aug.apply(source)
        assert out.shape == source.shape
        assert out.dtype == np.uint8
        assert not np.array_equal(out, source)

    def test_seeded_reproducible(self, source) -> None:
        a = StainAugmentor(method="macenko")
        a.rng = np.random.default_rng(3)
        b = StainAugmentor(method="macenko")
        b.rng = np.random.default_rng(3)
        assert np.array_equal(a.apply(source), b.apply(source))

    def test_call_returns_dict(self, source) -> None:
        aug = StainAugmentor(method="macenko", always_apply=True)
        out = aug(image=source)
        assert "image" in out
        assert out["image"].shape == source.shape

    def test_zero_sigma_near_identity(self, source) -> None:
        aug = StainAugmentor(
            method="macenko", sigma1=0.0, sigma2=0.0, augment_background=True
        )
        out = aug.apply(source)
        # no concentration perturbation: reconstruction error only
        assert np.abs(out.astype(int) - source.astype(int)).mean() < 20

    def test_unknown_method_raises(self) -> None:
        with pytest.raises(ValueError, match="[Uu]nsupported"):
            StainAugmentor(method="pca")

    def test_custom_requires_matrix(self) -> None:
        with pytest.raises(ValueError, match="stain_matrix"):
            StainAugmentor(method="custom")
