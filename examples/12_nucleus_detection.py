"""Nucleus detection with MapDe peak maps (reference: nucleus-detection
engine, tiatoolbox/models/engine/nucleus_detector.py).

The model emits a centroid probability map; peaks are found with an
on-device local-max + threshold and deduplicated with KD-tree NMS.
With network access, use the registry weights instead:
``NucleusDetector(model="mapde-conic", batch_size=8)``.
"""

import numpy as np

from tiatoolbox_tpu.data.synth import synthetic_he_patch
from tiatoolbox_tpu.models.architecture.mapde import MapDe
from tiatoolbox_tpu.models.engine.nucleus_detector import NucleusDetector

model = MapDe(num_classes=1, min_distance=4, threshold_abs=0.25)
model.init()

detector = NucleusDetector(model, batch_size=2, verbose=False)
patches = np.stack([synthetic_he_patch(size=(252, 252), seed=i) for i in range(4)])
out = detector.run(patches, patch_mode=True)

for i, det in enumerate(out["detections"]):
    coords = det["coordinates"]  # (n, 2) x/y in patch space
    print(f"patch {i}: {len(coords)} detections")

# Per-run overrides (same knobs as the CLI --min-distance etc.):
out = detector.run(patches, patch_mode=True, min_distance=8, threshold_abs=0.5)
print("stricter threshold:", [len(d["coordinates"]) for d in out["detections"]])
