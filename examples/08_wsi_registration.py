"""WSI registration: prealignment + DFBR + transformed reads
(reference: wsi-registration notebook / ``tools/registration``)."""

import numpy as np

from tiatoolbox_tpu.data.synth import synthetic_he_patch
from tiatoolbox_tpu.tools.registration.wsi_registration import (
    AffineWSITransformer,
    apply_affine_transformation,
    prealignment,
)
from tiatoolbox_tpu.wsicore.wsireader import VirtualWSIReader

# synthetic pair: the "moving" image is the fixed image rotated 30 deg
fixed = synthetic_he_patch((256, 256), seed=11)
angle = np.deg2rad(30)
c, s = np.cos(angle), np.sin(angle)
center = 128.0
rot = np.array(
    [
        [c, -s, center - c * center + s * center],
        [s, c, center - s * center - c * center],
        [0, 0, 1],
    ]
)
moving = apply_affine_transformation(fixed, fixed, np.linalg.inv(rot))
mask = np.ones(fixed.shape[:2], np.uint8)

transform, warped, _warped_mask, dice = prealignment(
    fixed, moving, mask, mask, rotation_step=10
)
print(f"prealignment dice={dice:.3f}")
err = np.abs(
    warped[64:192, 64:192].astype(float) - fixed[64:192, 64:192].astype(float)
).mean()
print(f"central mean abs error after rigid alignment: {err:.1f} (uint8)")

# read the moving slide *through* the recovered transform
reader = VirtualWSIReader(moving, mpp=(0.5, 0.5))
transformer = AffineWSITransformer(reader, transform)
patch = transformer.read_rect((96, 96), (64, 64), resolution=0, units="level")
print("transformed read:", patch.shape, patch.dtype)
