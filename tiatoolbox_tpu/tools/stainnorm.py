"""Stain normalization (reference ``tools/stainnorm.py:20-425``).

Same public API as the reference (``fit``/``transform``/
``get_normalizer``) with a TPU twist: ``transform`` keeps the exact
host float64 numerics for parity, while ``transform_tiles`` applies the
fitted transform to uint8 tile *batches* as a single fused device
program (``tiatoolbox_tpu.ops.stain``) — the form engines use.
"""

from __future__ import annotations

import cv2
import numpy as np

from tiatoolbox_tpu.tools.stainextract import (
    CustomExtractor,
    MacenkoExtractor,
    RuifrokExtractor,
    VahadaneExtractor,
)
from tiatoolbox_tpu.utils.exceptions import MethodNotSupportedError
from tiatoolbox_tpu.utils.misc import load_stain_matrix
from tiatoolbox_tpu.utils.transforms import od2rgb, rgb2od


class StainNormalizer:
    """Map source stain appearance onto a fitted target image.

    Attributes:
        extractor: Stain-matrix extractor instance.
        stain_matrix_target: Target stain matrix (2x3).
        target_concentrations: Target concentration matrix.
        maxC_target: 99th percentile of target concentrations (1x2).
        stain_matrix_target_RGB: Target stains as RGB (visualisation).
    """

    def __init__(self) -> None:
        self.extractor = None
        self.stain_matrix_target: np.ndarray | None = None
        self.target_concentrations: np.ndarray | None = None
        self.maxC_target: np.ndarray | None = None
        self.stain_matrix_target_RGB: np.ndarray | None = None

    @staticmethod
    def get_concentrations(img: np.ndarray, stain_matrix: np.ndarray) -> np.ndarray:
        """Least-squares concentrations of each stain per pixel."""
        od = rgb2od(img).reshape((-1, 3))
        x, _, _, _ = np.linalg.lstsq(stain_matrix.T, od.T, rcond=-1)
        return x.T

    def fit(self, target: np.ndarray) -> None:
        """Fit to a target/reference uint8 RGB image."""
        self.stain_matrix_target = self.extractor.get_stain_matrix(target)
        self.target_concentrations = self.get_concentrations(
            target, self.stain_matrix_target
        )
        self.maxC_target = np.percentile(
            self.target_concentrations, 99, axis=0
        ).reshape((1, 2))
        self.stain_matrix_target_RGB = od2rgb(self.stain_matrix_target)

    def transform(self, img: np.ndarray) -> np.ndarray:
        """Stain-normalize one uint8 RGB image (host, float64 parity path)."""
        stain_matrix_source = self.extractor.get_stain_matrix(img)
        source_concentrations = self.get_concentrations(img, stain_matrix_source)
        max_c_source = np.percentile(source_concentrations, 99, axis=0).reshape((1, 2))
        source_concentrations *= self.maxC_target / max_c_source
        trans = 255 * np.exp(-1 * np.dot(source_concentrations, self.stain_matrix_target))
        trans[trans > 255] = 255
        trans[trans < 0] = 0
        return trans.reshape(img.shape).astype(np.uint8)

    # -- device path ------------------------------------------------------------

    def prepare_tile_transform(self, sample_img: np.ndarray) -> dict:
        """Estimate source stains once; return device-ready constants.

        Args:
            sample_img: A representative source image (e.g. slide
                thumbnail or first tiles) used for source stain-matrix
                estimation and concentration percentile.

        Returns:
            dict with float32 arrays ``conc_proj`` [3,2],
            ``target_stains`` [2,3], ``conc_scale`` [2].
        """
        stain_matrix_source = self.extractor.get_stain_matrix(sample_img)
        source_concentrations = self.get_concentrations(
            sample_img, stain_matrix_source
        )
        max_c_source = np.percentile(source_concentrations, 99, axis=0)
        conc_proj = np.linalg.pinv(stain_matrix_source.T).T  # od @ proj → conc
        conc_scale = (self.maxC_target.reshape(-1) / max_c_source).astype(np.float32)
        return {
            "conc_proj": conc_proj.astype(np.float32),
            "target_stains": self.stain_matrix_target.astype(np.float32),
            "conc_scale": conc_scale,
        }

    def transform_tiles(self, tiles: np.ndarray, constants: dict | None = None):
        """Apply the fitted transform to a uint8 tile batch on device.

        Args:
            tiles: uint8 [N, H, W, 3] (or any [..., 3]) batch.
            constants: Output of :meth:`prepare_tile_transform`; when
                None, estimated from the batch itself.
        """
        from tiatoolbox_tpu.ops.stain import apply_stain_transform

        if constants is None:
            sample = np.asarray(tiles).reshape(-1, 3)
            sample_img = sample.reshape(1, -1, 3)
            constants = self.prepare_tile_transform(sample_img)
        return apply_stain_transform(
            tiles,
            constants["conc_proj"],
            constants["target_stains"],
            constants["conc_scale"],
        )


class CustomNormalizer(StainNormalizer):
    """Normalizer with a user-supplied stain matrix."""

    def __init__(self, stain_matrix: np.ndarray) -> None:
        super().__init__()
        self.extractor = CustomExtractor(stain_matrix)


class RuifrokNormalizer(StainNormalizer):
    """Ruifrok & Johnston color-deconvolution normalizer."""

    def __init__(self) -> None:
        super().__init__()
        self.extractor = RuifrokExtractor()


class MacenkoNormalizer(StainNormalizer):
    """Macenko OD-eigenbasis normalizer."""

    def __init__(self) -> None:
        super().__init__()
        self.extractor = MacenkoExtractor()


class VahadaneNormalizer(StainNormalizer):
    """Vahadane sparse-NMF normalizer."""

    def __init__(self) -> None:
        super().__init__()
        self.extractor = VahadaneExtractor()


class ReinhardNormalizer(StainNormalizer):
    """Reinhard LAB mean/std matching (reference ``stainnorm.py:222-368``)."""

    def __init__(self) -> None:
        super().__init__()
        self.target_means: tuple | None = None
        self.target_stds: tuple | None = None

    def fit(self, target: np.ndarray) -> None:
        means, stds = self.get_mean_std(target)
        self.target_means = means
        self.target_stds = stds

    def transform(self, img: np.ndarray) -> np.ndarray:
        chan1, chan2, chan3 = self.lab_split(img)
        means, stds = self.get_mean_std(img)
        norm1 = ((chan1 - means[0]) * (self.target_stds[0] / stds[0])) + self.target_means[0]
        norm2 = ((chan2 - means[1]) * (self.target_stds[1] / stds[1])) + self.target_means[1]
        norm3 = ((chan3 - means[2]) * (self.target_stds[2] / stds[2])) + self.target_means[2]
        return self.merge_back(norm1, norm2, norm3)

    def transform_tiles(self, tiles: np.ndarray, constants: dict | None = None):  # noqa: ARG002
        """Per-tile Reinhard on host (LAB conversion is cv2-exact)."""
        return np.stack([self.transform(np.asarray(t)) for t in tiles])

    @staticmethod
    def lab_split(img: np.ndarray) -> tuple:
        img = img.astype("uint8")
        img = cv2.cvtColor(img, cv2.COLOR_RGB2LAB)
        img_float = img.astype(np.float32)
        chan1, chan2, chan3 = cv2.split(img_float)
        chan1 /= 2.55
        chan2 -= 128.0
        chan3 -= 128.0
        return chan1, chan2, chan3

    @staticmethod
    def merge_back(chan1, chan2, chan3) -> np.ndarray:
        chan1 *= 2.55
        chan2 += 128.0
        chan3 += 128.0
        img = np.clip(cv2.merge((chan1, chan2, chan3)), 0, 255).astype(np.uint8)
        return cv2.cvtColor(img, cv2.COLOR_LAB2RGB)

    def get_mean_std(self, img: np.ndarray) -> tuple:
        img = img.astype("uint8")
        chan1, chan2, chan3 = self.lab_split(img)
        m1, sd1 = cv2.meanStdDev(chan1)
        m2, sd2 = cv2.meanStdDev(chan2)
        m3, sd3 = cv2.meanStdDev(chan3)
        means = float(m1[0][0]), float(m2[0][0]), float(m3[0][0])
        stds = float(sd1[0][0]), float(sd2[0][0]), float(sd3[0][0])
        return means, stds


def get_normalizer(
    method_name: str,
    stain_matrix: np.ndarray | None = None,
) -> StainNormalizer:
    """Factory for stain normalizers by name.

    Args:
        method_name: "reinhard", "custom", "ruifrok", "macenko" or
            "vahadane".
        stain_matrix: Only for "custom"; ndarray or path to .csv/.npy.
    """
    name = method_name.lower()
    if name not in ("reinhard", "ruifrok", "macenko", "vahadane", "custom"):
        raise MethodNotSupportedError
    if stain_matrix is not None and name != "custom":
        msg = '`stain_matrix` is only defined when using `method_name`="custom".'
        raise ValueError(msg)
    if name == "reinhard":
        return ReinhardNormalizer()
    if name == "ruifrok":
        return RuifrokNormalizer()
    if name == "macenko":
        return MacenkoNormalizer()
    if name == "vahadane":
        return VahadaneNormalizer()
    if stain_matrix is None:
        msg = '`stain_matrix` is None when using `method_name`="custom".'
        raise ValueError(msg)
    return CustomNormalizer(load_stain_matrix(stain_matrix))
