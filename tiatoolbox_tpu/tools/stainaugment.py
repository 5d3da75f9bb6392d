"""Stain augmentation (reference ``tools/stainaugment.py:15-249``).

Perturbs stain concentrations by random factors (sigma1) and offsets
(sigma2) — the reference wraps albumentations; here it is a standalone
transform with the same augmentation math, plus a batched JAX variant
for use inside device input pipelines.
"""

from __future__ import annotations

import copy

import numpy as np

from tiatoolbox_tpu.tools.stainextract import (
    CustomExtractor,
    MacenkoExtractor,
    RuifrokExtractor,
    VahadaneExtractor,
)
from tiatoolbox_tpu.utils.transforms import rgb2od


class StainAugmentor:
    """Augment the staining of an H&E image.

    Args:
        method: "vahadane", "macenko", or "custom" stain extraction.
        stain_matrix: Stain matrix for method="custom".
        sigma1: Multiplicative perturbation range (1 ± sigma1).
        sigma2: Additive perturbation range (± sigma2).
        augment_background: Whether to perturb background pixels too.
        always_apply / p: albumentations-style application probability.
    """

    def __init__(
        self,
        method: str = "vahadane",
        stain_matrix: np.ndarray | None = None,
        sigma1: float = 0.4,
        sigma2: float = 0.2,
        p: float = 0.5,
        *,
        augment_background: bool = False,
        always_apply: bool = False,
    ) -> None:
        self.method = method.lower()
        self.sigma1 = sigma1
        self.sigma2 = sigma2
        self.augment_background = augment_background
        self.p = 1.0 if always_apply else p
        if self.method not in ("macenko", "vahadane", "custom"):
            msg = f"Unsupported stain extractor method {method!r} for StainAugmentor."
            raise ValueError(msg)
        if self.method == "custom" and stain_matrix is None:
            msg = '`stain_matrix` is None when using `method`="custom".'
            raise ValueError(msg)
        if self.method == "macenko":
            self.extractor = MacenkoExtractor()
        elif self.method == "vahadane":
            self.extractor = VahadaneExtractor()
        else:
            self.extractor = CustomExtractor(stain_matrix)
        self.stain_matrix: np.ndarray | None = None
        self.source_concentrations: np.ndarray | None = None
        self.img_shape: tuple | None = None
        self.tissue_mask: np.ndarray | None = None
        self.rng = np.random.default_rng()

    def fit(self, img: np.ndarray, threshold: float = 0.85) -> None:
        """Extract stain matrix and concentrations from the image."""
        from tiatoolbox_tpu.tools.stainnorm import StainNormalizer

        self.stain_matrix = self.extractor.get_stain_matrix(img)
        self.source_concentrations = StainNormalizer.get_concentrations(
            img, self.stain_matrix
        )
        self.n_stains = self.source_concentrations.shape[1]
        grey = img.mean(axis=-1) if img.ndim == 3 else img
        self.tissue_mask = (grey / 255.0) < threshold
        self.img_shape = img.shape

    def augment(self) -> np.ndarray:
        """Return one augmented image from the fitted concentrations."""
        augmented_concentrations = copy.deepcopy(self.source_concentrations)
        mask = self.tissue_mask.reshape(-1)
        for i in range(self.n_stains):
            alpha = self.rng.uniform(1 - self.sigma1, 1 + self.sigma1)
            beta = self.rng.uniform(-self.sigma2, self.sigma2)
            if self.augment_background:
                augmented_concentrations[:, i] *= alpha
                augmented_concentrations[:, i] += beta
            else:
                augmented_concentrations[mask, i] *= alpha
                augmented_concentrations[mask, i] += beta
        img_augmented = 255 * np.exp(
            -1 * np.dot(augmented_concentrations, self.stain_matrix)
        )
        img_augmented = np.clip(img_augmented, 0, 255)
        return img_augmented.reshape(self.img_shape).astype(np.uint8)

    def apply(self, img: np.ndarray, **_kwargs) -> np.ndarray:
        """Fit + augment in one call (albumentations-compatible)."""
        self.fit(img.astype(np.uint8))
        return self.augment()

    def __call__(self, image: np.ndarray, **_kwargs) -> dict:
        """albumentations-style call: maybe-apply by probability p."""
        if self.rng.uniform() < self.p:
            return {"image": self.apply(image)}
        return {"image": image}

    def get_params(self) -> dict:
        """albumentations plugin API (reference ``stainaugment.py:230-235``)."""
        self.alpha = self.rng.uniform(1 - self.sigma1, 1 + self.sigma1)
        self.beta = self.rng.uniform(-self.sigma2, self.sigma2)
        return {}

    def get_params_dependent_on_targets(self, params: dict) -> dict:  # noqa: ARG002
        """albumentations plugin API: no target-dependent params."""
        return {}

    @staticmethod
    def get_transform_init_args_names(**kwargs) -> tuple[str, ...]:  # noqa: ARG004
        """albumentations plugin API: constructor argument names."""
        return ("method", "stain_matrix", "sigma1", "sigma2", "augment_background")


def augment_tiles_jax(tiles, stain_matrix, key, sigma1: float = 0.4, sigma2: float = 0.2):
    """Batched device stain augmentation with per-tile random factors.

    Uses the fixed ``stain_matrix`` for all tiles (estimation stays on
    host); draws one (alpha, beta) pair per tile and stain.
    """
    import jax
    import jax.numpy as jnp

    from tiatoolbox_tpu.ops.colorconv import rgb2od as rgb2od_j

    tiles = jnp.asarray(tiles)
    sm = jnp.asarray(stain_matrix, jnp.float32)  # [S, 3]
    proj = jnp.asarray(np.linalg.pinv(np.asarray(stain_matrix).T).T, jnp.float32)
    n = tiles.shape[0]
    s = sm.shape[0]
    k1, k2 = jax.random.split(key)
    alpha = jax.random.uniform(
        k1, (n, 1, 1, s), minval=1 - sigma1, maxval=1 + sigma1
    )
    beta = jax.random.uniform(k2, (n, 1, 1, s), minval=-sigma2, maxval=sigma2)
    od = rgb2od_j(tiles)
    conc = od @ proj
    conc = conc * alpha + beta
    out = 255.0 * jnp.exp(-(conc @ sm))
    return jnp.clip(out, 0, 255).astype(jnp.uint8)
