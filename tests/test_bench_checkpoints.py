"""Functional bench checkpoint: a hand-constructed HoVerNet that works.

scripts/make_bench_checkpoints.py implants weights into the real
hovernet_fast architecture making the full graph a nucleus segmenter
(density stem → shortcut passthrough → Sobel-ramp hv heads). These
tests pin the properties the bench relies on: it finds real instances
on synthetic H&E, types them, and is bit-deterministic.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))


@pytest.fixture(scope="module")
def functional_model():
    from make_bench_checkpoints import build_functional_hovernet_variables

    from tiatoolbox_tpu.models.architecture.hovernet import HoVerNet

    model = HoVerNet(num_types=6, mode="fast")
    model.load_weights(build_functional_hovernet_variables(model))
    return model


def test_segments_synthetic_nuclei(functional_model) -> None:
    from tiatoolbox_tpu.data.synth import synthetic_he_patch
    from tiatoolbox_tpu.models.architecture.hovernet import HoVerNet

    patch = synthetic_he_patch((256, 256), seed=3)
    np_p, hv, tp = HoVerNet.infer_batch(functional_model, patch[None])
    np_p = np.asarray(np_p)[0]
    # foreground is sparse and present (nuclei, not background/eosin)
    frac = float((np_p > 0.5).mean())
    assert 0.01 < frac < 0.4, frac
    inst = HoVerNet._proc_np_hv(np_p, np.asarray(hv)[0])
    assert inst.max() >= 10, int(inst.max())
    # watershed split: more instances than connected components alone
    # would be ideal; at minimum every instance is a compact blob
    info = HoVerNet.get_instance_info(inst, np.asarray(tp)[0])
    assert len(info) >= 10
    types = {v["type"] for v in info.values()}
    assert types <= {0, 1}
    assert 1 in types  # tp head marks nuclei as type 1


def test_full_postproc_pipeline(functional_model) -> None:
    from tiatoolbox_tpu.data.synth import synthetic_he_patch
    from tiatoolbox_tpu.models.architecture.hovernet import HoVerNet

    patch = synthetic_he_patch((256, 256), seed=7)
    np_p, hv, tp = HoVerNet.infer_batch(functional_model, patch[None])
    results = functional_model.postproc(
        [np.asarray(np_p)[0], np.asarray(hv)[0], np.asarray(tp)[0]]
    )
    (nuclei,) = results
    assert nuclei["seg_type"] == "instance"
    assert len(nuclei["info_dict"]["centroid"]) >= 10
    # stage attribution populated by postproc
    assert functional_model.last_postproc_seconds["watershed"] > 0


def test_deterministic_build(functional_model) -> None:
    from make_bench_checkpoints import build_functional_hovernet_variables

    from tiatoolbox_tpu.models.architecture.hovernet import HoVerNet

    import jax

    again = build_functional_hovernet_variables(HoVerNet(num_types=6, mode="fast"))
    for (pa, a), (_pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(functional_model.variables),
        jax.tree_util.tree_leaves_with_path(again),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(pa))


def test_checkpoint_loads_via_registry(tmp_path, functional_model) -> None:
    """get_pretrained_model must pick the cached npz up with NO
    random-init warning (the r02 bench defect)."""
    import logging

    from make_bench_checkpoints import ensure_hovernet_bench_checkpoint

    from tiatoolbox_tpu import logger, rcParam
    from tiatoolbox_tpu.models.architecture import get_pretrained_model

    old_home = rcParam["TIATOOLBOX_HOME"]
    rcParam["TIATOOLBOX_HOME"] = str(tmp_path)
    try:
        path = ensure_hovernet_bench_checkpoint()
        assert path.exists()
        records: list[logging.LogRecord] = []

        class Catcher(logging.Handler):
            def emit(self, record):
                records.append(record)

        handler = Catcher()
        logger.addHandler(handler)
        try:
            model, ioconfig = get_pretrained_model("hovernet_fast-pannuke")
        finally:
            logger.removeHandler(handler)
        assert not any("random initialisation" in r.getMessage() for r in records)
        assert model.variables is not None
        # loaded weights == built weights
        built = functional_model.variables["params"]["conv0"]["kernel"]
        loaded = model.variables["params"]["conv0"]["kernel"]
        np.testing.assert_allclose(np.asarray(loaded), np.asarray(built))
    finally:
        rcParam["TIATOOLBOX_HOME"] = old_home
