"""Whole-slide semantic segmentation with probability-map merge
(reference: semantic-segmentation notebook)."""

import jax.numpy as jnp
import numpy as np

from tiatoolbox_tpu.data.synth import make_synthetic_slide
from tiatoolbox_tpu.models.architecture.unet import UNetModel
from tiatoolbox_tpu.models.engine.io_config import IOSegmentorConfig
from tiatoolbox_tpu.models.engine.semantic_segmentor import SemanticSegmentor

slide_path = "/tmp/example_seg_slide.tiff"
make_synthetic_slide(slide_path, size=(1024, 768), mpp=0.5, objective_power=20)

model = UNetModel(num_input_channels=3, num_output_channels=2, encoder="unet",
                  compute_dtype=jnp.bfloat16)
model.init(input_shape=(1, 128, 128, 3))
seg = SemanticSegmentor(model, batch_size=8, num_loader_workers=0)
ioconfig = IOSegmentorConfig(
    input_resolutions=[{"units": "mpp", "resolution": 1.0}],
    output_resolutions=[{"units": "mpp", "resolution": 1.0}],
    patch_input_shape=(128, 128), patch_output_shape=(128, 128),
    stride_shape=(96, 96),
    save_resolution={"units": "mpp", "resolution": 1.0},
)
out = seg.run([slide_path], patch_mode=False, ioconfig=ioconfig,
              auto_get_mask=False, verbose=False)
result = next(iter(out.values()))
probs = np.asarray(result["probabilities"])
print("probability map:", probs.shape, "sums to 1:",
      bool(np.allclose(probs.sum(-1), 1, atol=1e-3)))
