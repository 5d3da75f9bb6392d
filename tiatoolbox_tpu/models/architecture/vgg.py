"""Flax VGG16 feature extractor (torchvision topology).

The reference's DFBR registration hooks VGG16 ImageNet features after
pools 3/4/5 (``tools/registration/wsi_registration.py:329-412``,
torchvision layer ids 16/23/30). This module reproduces that graph in
NHWC flax; ``torch_vgg_to_flax`` (weight_converter.py) maps the
sequential ``features.N`` checkpoint naming 1:1.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

# torchvision vgg16 "D" configuration: conv channel per block
VGG16_BLOCKS = ((64, 64), (128, 128), (256, 256, 256),
                (512, 512, 512), (512, 512, 512))
# sequential indices of the conv layers in torchvision vgg16.features
VGG16_CONV_IDS = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class VGG16Features(nn.Module):
    """VGG16 convolutional trunk returning the block3/4/5 pool outputs.

    Input: float NHWC in [0, 1]; ImageNet normalization is applied
    inside (matching the reference's torchvision transform).
    """

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
        std = jnp.asarray(IMAGENET_STD, x.dtype)
        x = (x - mean) / std
        outputs = []
        conv_idx = iter(VGG16_CONV_IDS)
        for block_i, widths in enumerate(VGG16_BLOCKS):
            for width in widths:
                x = nn.Conv(
                    width, (3, 3), padding=[(1, 1), (1, 1)],
                    name=f"conv{next(conv_idx)}",
                )(x)
                x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            if block_i >= 2:  # block3_pool, block4_pool, block5_pool
                outputs.append(x)
        return outputs
