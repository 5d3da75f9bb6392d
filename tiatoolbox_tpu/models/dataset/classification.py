"""Dataset-keyed preprocessing (reference ``models/dataset/classification.py``).

The reference's predefined preprocs are torchvision transform stacks;
for kather100k and pcam they amount to uint8 passthrough (scaling to
[0, 1] happens inside ``infer_batch`` on device).
"""

from __future__ import annotations

import numpy as np


def predefined_preproc_func(dataset_name: str):
    """Per-dataset patch preprocessing function.

    Known datasets: "kather100k", "pcam" (both identity on uint8 —
    the device program handles scaling) and "idars" (the sharper
    Normalize(0.5, 0.1) recipe from Bilal et al.; reference
    ``idars.py:16-23`` — used by the seven ``dataset: idars`` registry
    entries).
    """
    from tiatoolbox_tpu.models.architecture.idars import idars_preproc

    preproc_dict = {
        "kather100k": lambda x: np.asarray(x),
        "pcam": lambda x: np.asarray(x),
        "idars": idars_preproc,
    }
    if dataset_name not in preproc_dict:
        msg = f"Predefined preprocessing for dataset `{dataset_name}` does not exist."
        raise ValueError(msg)
    return preproc_dict[dataset_name]
