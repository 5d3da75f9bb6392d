"""Shared pytest fixtures.

JAX is forced onto CPU with 8 virtual devices so sharding/pjit paths
are exercised without TPU hardware (the driver separately dry-runs the
multi-chip path; benches run on the real chip).
"""

from __future__ import annotations

import os

# Must be set before the first jax backend initialisation.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon sitecustomize force-sets jax_platforms="axon,cpu"; override it
# so tests run on the virtual 8-device CPU mesh (fast + deterministic).
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng() -> np.random.Generator:
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def sample_patch(rng) -> np.ndarray:
    """A synthetic H&E-like uint8 RGB patch (224x224)."""
    from tiatoolbox_tpu.data.synth import synthetic_he_patch

    return synthetic_he_patch(size=(224, 224), seed=7)


@pytest.fixture(scope="session")
def sample_svs(tmp_path_factory) -> str:
    """A small synthetic pyramidal tiled-TIFF slide on disk."""
    from tiatoolbox_tpu.data.synth import make_synthetic_slide

    path = tmp_path_factory.mktemp("slides") / "synthetic.svs.tiff"
    make_synthetic_slide(path, size=(2048, 1536), mpp=0.5, objective_power=20)
    return str(path)


@pytest.fixture(scope="session")
def sample_wsi_array(rng) -> np.ndarray:
    """An in-memory synthetic slide image array (H=768, W=1024)."""
    from tiatoolbox_tpu.data.synth import synthetic_he_patch

    return synthetic_he_patch(size=(1024, 768), seed=3)
