"""Stain normalization (reference: stain-norm notebook / CLI).

All four extractors (ruifrok/macenko/vahadane/custom) are numerically
matched to the reference; the TPU path fuses OD conversion + stain
transform over uint8 tile batches in one device program.
"""

import numpy as np

from tiatoolbox_tpu.data.synth import synthetic_he_patch
from tiatoolbox_tpu.tools.stainnorm import get_normalizer

target = synthetic_he_patch((512, 512), seed=1)
source = synthetic_he_patch((512, 512), seed=7)

for method in ("reinhard", "ruifrok", "macenko"):
    norm = get_normalizer(method)
    norm.fit(target)
    out = norm.transform(source.copy())
    print(f"{method}: out {out.shape} mean shift "
          f"{abs(out.astype(float).mean() - source.mean()):.2f}")

# device batch path: one fused program over a tile stack
norm = get_normalizer("macenko")
norm.fit(target)
consts = norm.prepare_tile_transform(source)
tiles = np.stack([source] * 16)
normalized = np.asarray(norm.transform_tiles(tiles, consts))
print("batched:", normalized.shape)
