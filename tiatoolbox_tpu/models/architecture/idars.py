"""IDaRS CNNs: molecular pathway / mutation prediction from H&E.

Reference ``models/architecture/idars.py`` (Bilal et al., Lancet
Digital Health 2021): a standard CNN classifier whose ONLY deviation
is the preprocessing — ToTensor ([0, 1] scaling) followed by
``Normalize(mean=0.5, std=0.1)`` per channel, i.e. a much sharper
contrast stretch than the ImageNet recipe. The seven pretrained
registry entries (``resnet18-idars-{braf,cimp,cin,hm,msi,tp53}`` and
``resnet34-idars-msi``) carry ``dataset: idars`` so
``get_pretrained_model`` attaches this preprocessing automatically.
"""

from __future__ import annotations

import numpy as np

from tiatoolbox_tpu.models.architecture.vanilla import CNNModel


def idars_preproc(image: np.ndarray) -> np.ndarray:
    """((x / 255) - 0.5) / 0.1, float32 HWC.

    Matches reference ``idars.py:16-23`` (ToTensor + Normalize(0.5,
    0.1), permuted back to HWC).
    """
    image = np.asarray(image, np.float32) / 255.0
    return (image - 0.5) / 0.1


class IDaRS(CNNModel):
    """CNN classifier with the IDaRS normalization recipe.

    Args:
        backbone: torchvision-style backbone name (e.g. "resnet18").
        num_classes: Number of output classes.
    """

    def __init__(self, backbone: str, num_classes: int = 1, **kwargs) -> None:
        super().__init__(backbone, num_classes=num_classes, **kwargs)

    @staticmethod
    def preproc(image: np.ndarray) -> np.ndarray:
        """IDaRS per-patch normalization (host side)."""
        return idars_preproc(image)
