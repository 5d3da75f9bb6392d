"""Whole-slide patch classification (reference: patch-prediction notebook).

The engine streams fixed-shape uint8 batches from the host tiler
through concurrent transfer threads into a fused device program
(normalize -> forward -> softmax); outputs come back coordinate-keyed.
"""

import jax.numpy as jnp
import numpy as np

from tiatoolbox_tpu.data.synth import make_synthetic_slide
from tiatoolbox_tpu.models.architecture.vanilla import CNNModel
from tiatoolbox_tpu.models.engine.io_config import IOPatchPredictorConfig
from tiatoolbox_tpu.models.engine.patch_predictor import PatchPredictor

slide_path = "/tmp/example_slide.tiff"
make_synthetic_slide(slide_path, size=(2048, 1536), mpp=0.5, objective_power=20)

# registry model (downloads weights when network is available):
#   predictor = PatchPredictor(model="resnet18-kather100k", batch_size=32)
model = CNNModel("resnet18", num_classes=9, compute_dtype=jnp.bfloat16)
model.init(input_shape=(1, 224, 224, 3))
model.optimize_for_inference()       # bf16 weights + space-to-depth stem
model.wire_format = "yuv420"         # half the host->HBM bytes per patch

predictor = PatchPredictor(model, batch_size=32, num_loader_workers=0)
ioconfig = IOPatchPredictorConfig(
    input_resolutions=[{"units": "mpp", "resolution": 0.5}],
    patch_input_shape=(224, 224),
    stride_shape=(224, 224),
)
out = predictor.run(
    [slide_path], patch_mode=False, ioconfig=ioconfig,
    auto_get_mask=False, verbose=False,
)
result = next(iter(out.values()))
print("patches:", len(result["predictions"]))
print("class histogram:", np.bincount(result["predictions"], minlength=9))
