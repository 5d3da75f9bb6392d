"""Utility subpackage: host-plane helpers shared by all layers."""

from tiatoolbox_tpu.utils import (  # noqa: F401
    env_detection,
    exceptions,
    image,
    magic,
    metrics,
    misc,
    transforms,
)

imread = misc.imread
imwrite = misc.imwrite
imresize = transforms.imresize
