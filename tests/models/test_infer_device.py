"""infer_batch_device must agree with infer_batch for every
architecture following the ``_jitted_infer`` convention (engines fetch
device outputs themselves, at their chosen wire dtype)."""

from __future__ import annotations

import numpy as np
import pytest


def _models():
    from tiatoolbox_tpu.models.architecture.grandqc import GrandQCModel
    from tiatoolbox_tpu.models.architecture.hovernet import HoVerNet
    from tiatoolbox_tpu.models.architecture.mapde import MapDe
    from tiatoolbox_tpu.models.architecture.unet import UNetModel

    specs = [
        ("mapde", lambda: MapDe(num_input_channels=3), (1, 252, 252, 3)),
        (
            "unet",
            lambda: UNetModel(
                num_input_channels=3, num_output_channels=2, encoder="unet"
            ),
            (1, 128, 128, 3),
        ),
        (
            "hovernet",
            lambda: HoVerNet(num_types=None, mode="fast"),
            (1, 256, 256, 3),
        ),
        ("grandqc", lambda: GrandQCModel(num_output_channels=2), (1, 128, 128, 3)),
    ]
    return specs


@pytest.mark.parametrize(("name", "factory", "shape"), _models(),
                         ids=lambda v: v if isinstance(v, str) else "")
def test_device_matches_sync(name, factory, shape) -> None:
    model = factory()
    model.init(input_shape=shape)
    batch = np.random.default_rng(0).integers(
        0, 255, (2, *shape[1:]), np.uint8
    )
    sync = model.infer_batch(model, batch)
    dev = model.infer_batch_device(model, batch)
    if not isinstance(sync, (tuple, list)):
        sync = (sync,)
    if not isinstance(dev, (tuple, list)):
        dev = (dev,)
    assert len(sync) == len(dev)
    for s, d in zip(sync, dev):
        assert np.allclose(np.asarray(s), np.asarray(d), atol=1e-6)
