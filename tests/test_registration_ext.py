"""Extended DFBR / affine-estimation coverage (reference
``tests/test_wsi_registration.py`` behaviours).
"""

from __future__ import annotations

import numpy as np
import pytest

from tiatoolbox_tpu.data.synth import synthetic_he_patch
from tiatoolbox_tpu.tools.registration.wsi_registration import (
    DFBRegister,
    apply_affine_transformation,
    compute_center_of_mass,
)


class TestAffineEstimation:
    def test_estimate_affine_recovers_known_transform(self) -> None:
        rng = np.random.default_rng(0)
        moving = rng.uniform(0, 100, (20, 2))
        true = np.array([[0.9, -0.1, 5.0], [0.2, 1.1, -3.0], [0, 0, 1]])
        fixed = (true[:2, :2] @ moving.T).T + true[:2, 2]
        est = DFBRegister.estimate_affine(fixed, moving)
        assert np.allclose(est, true, atol=1e-8)

    def test_estimate_affine_transform_alias(self) -> None:
        rng = np.random.default_rng(1)
        a = rng.uniform(0, 10, (8, 2))
        b = rng.uniform(0, 10, (8, 2))
        assert np.allclose(
            DFBRegister.estimate_affine(a, b),
            DFBRegister.estimate_affine_transform(a, b),
        )

    def test_estimate_affine_exact_translation(self) -> None:
        moving = np.array([[0, 0], [10, 0], [0, 10], [10, 10]], float)
        fixed = moving + [3, -2]
        est = DFBRegister.estimate_affine(fixed, moving)
        assert np.allclose(est[:2, :2], np.eye(2), atol=1e-9)
        assert np.allclose(est[:2, 2], [3, -2], atol=1e-9)


class TestMatching:
    def test_finding_match_mutual_nearest(self) -> None:
        dist = np.array(
            [
                [0.1, 0.9, 0.8],
                [0.7, 0.2, 0.9],
                [0.8, 0.9, 0.05],
            ]
        )
        matches, ratio = DFBRegister.finding_match(dist)
        assert matches.tolist() == [[0, 0], [1, 1], [2, 2]]
        # quality ratio = second_min / first_min per row
        assert ratio[0] == pytest.approx(0.8 / 0.1)
        assert ratio[2] == pytest.approx(0.8 / 0.05)

    def test_find_points_inside_boundary(self) -> None:
        mask = np.zeros((20, 20), np.uint8)
        mask[5:15, 5:15] = 1
        pts = np.array([[10, 10], [0, 0], [25, 10], [-3, 7], [14, 14]])
        inside = DFBRegister.find_points_inside_boundary(mask, pts)
        assert inside.tolist() == [True, False, False, False, True]


class TestHelpers:
    def test_center_of_mass(self) -> None:
        mask = np.zeros((10, 10), np.uint8)
        mask[2:4, 6:8] = 1
        com = compute_center_of_mass(mask)
        assert com == pytest.approx((6.5, 2.5))

    def test_apply_affine_identity(self) -> None:
        img = synthetic_he_patch((64, 64), seed=2)
        fixed = synthetic_he_patch((64, 64), seed=3)
        out = apply_affine_transformation(fixed, img, np.eye(3))
        assert out.shape[:2] == (64, 64)
        assert np.abs(out.astype(int) - img.astype(int)).mean() < 2


class TestDFBRegister:
    @pytest.fixture(scope="class")
    def pair(self):
        fixed = synthetic_he_patch((256, 256), seed=9)
        shift = np.array([[1, 0, 12.0], [0, 1, -8.0], [0, 0, 1]])
        import cv2

        moving = cv2.warpAffine(
            fixed,
            np.linalg.inv(shift)[:2],
            (256, 256),
            borderValue=(243, 243, 243),
        )
        return fixed, moving, shift

    def test_register_recovers_translation(self, pair) -> None:
        fixed, moving, shift = pair
        reg = DFBRegister(patch_size=(224, 224))
        transform = reg.register(fixed, moving)
        assert transform.shape == (3, 3)
        # the recovered transform maps moving → fixed; translation
        # should be within a feature-grid cell of the truth
        assert abs(transform[0, 2] - shift[0, 2]) < 16
        assert abs(transform[1, 2] - shift[1, 2]) < 16
        assert np.allclose(transform[:2, :2], np.eye(2), atol=0.2)

    def test_register_with_initializer_composes(self, pair) -> None:
        fixed, moving, shift = pair
        reg = DFBRegister(patch_size=(224, 224))
        # initialize with the true transform: residual should be small
        transform = reg.register(fixed, moving, transform_initializer=shift)
        assert abs(transform[0, 2] - shift[0, 2]) < 16
        assert abs(transform[1, 2] - shift[1, 2]) < 16
