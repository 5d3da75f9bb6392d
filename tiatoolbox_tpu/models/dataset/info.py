"""Dataset information classes (reference ``models/dataset/info.py:51-133``).

The reference downloads Kather100k from its public source; this build
is zero-egress, so ``KatherPatchDataset`` loads from a local directory
when given (same on-disk layout: one subdirectory per class of .tif
patches) and otherwise generates a small synthetic stand-in with the
same 9-class label semantics for pipeline testing.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from pathlib import Path

import numpy as np

from tiatoolbox_tpu import logger, rcParam
from tiatoolbox_tpu.models.dataset.dataset_abc import PatchDatasetABC

# Training label order of the kather100k pretrained zoo (reference
# ``models/dataset/info.py:85-96``): class id i == KATHER_CLASSES[i] in
# the models' output logits. NOT alphabetical.
KATHER_CLASSES = [
    "BACK",
    "NORM",
    "DEB",
    "TUM",
    "ADI",
    "MUC",
    "MUS",
    "STR",
    "LYM",
]


class DatasetInfoABC(ABC):
    """Base for dataset info providers: inputs, labels, label names."""

    @abstractmethod
    def __init__(self) -> None:
        raise NotImplementedError


class KatherPatchDataset(PatchDatasetABC):
    """Kather100k validation patches.

    Args:
        save_dir_path: Directory holding the extracted dataset
            (``<dir>/<CLASS>/*.tif``). When None, looks under
            ``$TIATOOLBOX_TPU_HOME/dataset/kather100k`` and falls back
            to a deterministic synthetic stand-in (128 patches,
            9 classes) for offline pipeline testing.
    """

    def __init__(self, save_dir_path: str | Path | None = None) -> None:
        super().__init__()
        self.label_names = KATHER_CLASSES
        if save_dir_path is None:
            save_dir_path = (
                Path(rcParam["TIATOOLBOX_HOME"]) / "dataset" / "kather100k"
            )
        save_dir_path = Path(save_dir_path)
        if save_dir_path.exists():
            inputs, labels = [], []
            for label_idx, name in enumerate(KATHER_CLASSES):
                class_dir = save_dir_path / name
                if not class_dir.exists():
                    continue
                for img_path in sorted(class_dir.glob("*.tif")):
                    inputs.append(img_path)
                    labels.append(label_idx)
            if not inputs:
                msg = f"No Kather100k patches found under {save_dir_path}."
                raise ValueError(msg)
            self.inputs = inputs
            self.labels = labels
        else:
            logger.warning(
                "Kather100k not found at %s; using a synthetic stand-in "
                "(offline build). Place the extracted dataset there for "
                "real validation.",
                save_dir_path,
            )
            from tiatoolbox_tpu.data.synth import synthetic_he_patch

            rng = np.random.default_rng(0)
            self.inputs = np.stack(
                [synthetic_he_patch((224, 224), seed=int(s)) for s in range(128)]
            )
            self.labels = rng.integers(0, 9, size=128).tolist()

    def __getitem__(self, idx: int) -> dict:
        from tiatoolbox_tpu.utils import misc

        patch = self.inputs[idx]
        if isinstance(patch, (str, Path)):
            patch = misc.imread(patch)
        patch = self._preproc(np.asarray(patch))
        return {"image": patch, "label": self.labels[idx]}
