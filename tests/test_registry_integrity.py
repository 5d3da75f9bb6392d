"""Every pretrained-registry entry must be fully constructible.

The `dataset: idars` entries shipped for two rounds raising in
`predefined_preproc_func` — nothing exercised the registry beyond a
handful of names. This walks ALL entries through the same resolution
steps `get_pretrained_model` performs (architecture class + kwargs,
dataset preproc recipe, ioconfig class + kwargs) WITHOUT weight
initialisation, which is the expensive part and not where breakage
has occurred.
"""

from __future__ import annotations

import numpy as np
import pytest

from tiatoolbox_tpu.models.architecture import (
    _get_pretrained_info,
    _locate_arch_class,
)

INFO = _get_pretrained_info()


@pytest.mark.parametrize("name", sorted(INFO))
def test_registry_entry_resolves(name) -> None:
    from tiatoolbox_tpu.models.dataset.classification import (
        predefined_preproc_func,
    )
    from tiatoolbox_tpu.models.engine import io_config as ioc

    cfg = INFO[name]

    arch_cfg = cfg["architecture"]
    arch_cls = _locate_arch_class(arch_cfg["class"])
    model = arch_cls(**arch_cfg.get("kwargs", {}))
    assert model.module is not None

    if "dataset" in cfg:
        preproc = predefined_preproc_func(cfg["dataset"])
        out = preproc(np.zeros((4, 4, 3), np.uint8))
        assert out.shape[:2] == (4, 4)

    io_cfg = cfg["ioconfig"]
    io_cls = getattr(ioc, io_cfg["class"].rsplit(".", 1)[-1])
    ioconfig = io_cls(**io_cfg.get("kwargs", {}))
    assert ioconfig.input_resolutions
    assert ioconfig.patch_input_shape is not None


def test_registry_superset_of_reference() -> None:
    """Entry keys are a strict superset of the reference registry."""
    import pathlib

    import yaml

    ref_path = pathlib.Path("/root/reference/tiatoolbox/data/pretrained_model.yaml")
    if not ref_path.exists():
        pytest.skip("reference registry not available")
    ref = yaml.safe_load(ref_path.read_text())
    missing = set(ref) - set(INFO)
    assert not missing, f"registry missing reference entries: {sorted(missing)}"
