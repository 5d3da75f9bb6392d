"""Backbone feature embeddings for downstream analysis
(reference: DeepFeatureExtractor / feature-extraction notebook)."""

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from tiatoolbox_tpu.data.synth import synthetic_he_patch
from tiatoolbox_tpu.models.architecture.vanilla import CNNBackbone
from tiatoolbox_tpu.models.engine.deep_feature_extractor import (
    DeepFeatureExtractor,
)

# patch mode: embed a stack of patches with a ResNet18 backbone
patches = np.stack(
    [synthetic_he_patch((96, 96), seed=s) for s in range(8)]
)
model = CNNBackbone("resnet18")
extractor = DeepFeatureExtractor(model=model, batch_size=4, verbose=False)
out = extractor.run(patches, patch_mode=True)
features = np.asarray(out["features"])
print("embeddings:", features.shape)  # (8, 512) for resnet18

# cosine similarity between the first patch and the rest — inputs from
# different seeds should not be identical embeddings
f = features / np.linalg.norm(features, axis=1, keepdims=True)
sims = f[0] @ f[1:].T
print("cosine similarity to patch 0:", np.round(sims, 3))
