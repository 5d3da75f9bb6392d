"""Tissue masking + sliding-window patch extraction.

Mirrors the reference's tissue-mask / patch-extraction notebooks
(reference: tiatoolbox/tools/tissuemask.py, tools/patchextraction.py):
mask at thumbnail resolution with Otsu + morphology, then extract only
the patches whose footprint is mostly tissue.
"""

import numpy as np

from tiatoolbox_tpu.data.synth import make_synthetic_slide
from tiatoolbox_tpu.tools.patchextraction import get_patch_extractor
from tiatoolbox_tpu.tools.tissuemask import MorphologicalMasker, OtsuTissueMasker
from tiatoolbox_tpu.wsicore.wsireader import WSIReader

slide_path = "/tmp/example_slide.tiff"
make_synthetic_slide(slide_path, size=(3072, 2048), mpp=0.5, objective_power=20)
wsi = WSIReader.open(slide_path)

# 1) Standalone maskers operate on thumbnail-resolution images.
thumb = wsi.slide_thumbnail(resolution=4.0, units="mpp")
otsu = OtsuTissueMasker().fit_transform(thumb[np.newaxis])[0]
morph = MorphologicalMasker(mpp=4.0).fit_transform(thumb[np.newaxis])[0]
print("otsu tissue fraction:", otsu.mean().round(3))
print("morphological tissue fraction:", morph.mean().round(3))

# 2) Or let the reader drive it (same path the engines use).
mask_reader = wsi.tissue_mask(method="morphological", resolution=4.0, units="mpp")

# 3) Sliding-window extraction, filtered by the mask.
extractor = get_patch_extractor(
    "slidingwindow",
    input_img=wsi,
    input_mask=mask_reader,
    patch_size=(224, 224),
    stride=(224, 224),
    resolution=0.5,
    units="mpp",
    min_mask_ratio=0.5,
)
coords = extractor.coordinate_list
print("patches kept after mask filtering:", len(coords))
patch = extractor[0]  # lazily reads through WSIReader.read_rect
print("first patch:", patch.shape, patch.dtype)
