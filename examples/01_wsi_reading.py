"""Reading whole-slide images (reference: examples/01-wsi-reading.ipynb).

Runs on synthetic data — no downloads. Every reader shares one API:
``WSIReader.open`` sniffs the format and returns a concrete reader.
"""

import numpy as np

from tiatoolbox_tpu.data.synth import make_synthetic_slide
from tiatoolbox_tpu.wsicore.wsireader import WSIReader

slide_path = "/tmp/example_slide.tiff"
make_synthetic_slide(slide_path, size=(4096, 3072), mpp=0.5, objective_power=20)

wsi = WSIReader.open(slide_path)
print("dimensions:", wsi.info.slide_dimensions)
print("mpp:", wsi.info.mpp, "objective:", wsi.info.objective_power)
print("levels:", wsi.info.level_dimensions)

# read_rect: location at baseline, size at the requested resolution
region = wsi.read_rect((1024, 1024), (512, 512), resolution=1.0, units="mpp")
print("read_rect:", region.shape, region.dtype)

# read_bounds: fixed field of view, output size follows resolution
bounds_region = wsi.read_bounds((0, 0, 2048, 2048), resolution=2.0, units="mpp")
print("read_bounds:", bounds_region.shape)

thumb = wsi.slide_thumbnail(resolution=8.0, units="mpp")
print("thumbnail:", thumb.shape)

mask = wsi.tissue_mask(method="otsu", resolution=8.0, units="mpp")
print("tissue mask coverage:", float(np.mean(mask.img)))
