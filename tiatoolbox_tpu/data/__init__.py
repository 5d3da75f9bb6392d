"""Data registry: pretrained-model YAML, sample assets, synthetic data.

The reference fetches remote sample assets from HuggingFace
(``tiatoolbox/data/__init__.py:27-93``); this build targets zero-egress
environments, so sample slides/patches are generated synthetically on
first use (``tiatoolbox_tpu.data.synth``) and cached under
``rcParam["TIATOOLBOX_HOME"]``.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from tiatoolbox_tpu import rcParam


def stain_norm_target() -> np.ndarray:
    """The default stain-normalization target image (synthetic H&E)."""
    from tiatoolbox_tpu.data.synth import synthetic_he_patch

    return synthetic_he_patch(size=(224, 224), seed=1234)


def sample_slide_path(name: str = "synthetic") -> Path:
    """Path to a cached synthetic sample slide, generating if needed."""
    from tiatoolbox_tpu.data.synth import make_synthetic_slide

    home = Path(rcParam["TIATOOLBOX_HOME"]) / "samples"
    home.mkdir(parents=True, exist_ok=True)
    path = home / f"{name}.tiff"
    if not path.exists():
        make_synthetic_slide(path)
    return path
