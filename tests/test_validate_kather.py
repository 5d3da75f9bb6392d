"""Dry-run of the Kather100k accuracy-validation plumbing (runbook).

Zero-egress stand-in for docs/RUNBOOK_accuracy.md step 3: a synthetic
Kather-layout dataset + a locally-built .npz checkpoint run through
``validate_kather.evaluate`` — dataset walker, batch reads, registry
weight load, and per-class accounting all execute for real; only the
weights/data are synthetic.
"""

from __future__ import annotations

import sys
from pathlib import Path

import cv2
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

from validate_kather import KATHER_CLASSES, evaluate, iter_dataset

from tiatoolbox_tpu.data.synth import synthetic_he_patch


@pytest.fixture(scope="module")
def synth_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("kather")
    for i, name in enumerate(KATHER_CLASSES):
        class_dir = root / name
        class_dir.mkdir()
        for j in range(3):
            patch = synthetic_he_patch((224, 224), seed=i * 10 + j)
            cv2.imwrite(
                str(class_dir / f"p{j}.tif"),
                cv2.cvtColor(patch, cv2.COLOR_RGB2BGR),
            )
    return root


@pytest.fixture(scope="module")
def synth_weights(tmp_path_factory):
    import jax.numpy as jnp

    from tiatoolbox_tpu.models.architecture.vanilla import CNNModel
    from tiatoolbox_tpu.models.architecture.weight_converter import (
        save_flax_npz,
    )

    model = CNNModel("resnet18", num_classes=9)
    model.init(input_shape=(1, 224, 224, 3))
    path = tmp_path_factory.mktemp("w") / "resnet18-kather100k.npz"
    save_flax_npz(model.variables, path)
    return path


def test_dataset_walker_layout(synth_dataset) -> None:
    samples = list(iter_dataset(synth_dataset, None))
    assert len(samples) == 27
    labels = {lab for _, lab in samples}
    assert labels == set(range(9))
    assert list(iter_dataset(synth_dataset, 5))[:5] == samples[:5]


def test_evaluate_end_to_end(synth_dataset, synth_weights) -> None:
    result = evaluate(synth_weights, synth_dataset, batch_size=8)
    assert result["n"] == 27
    assert 0.0 <= result["accuracy"] <= 1.0
    assert result["confusion"].sum() == 27
    assert result["patches_per_sec"] > 0
    # random weights: no accuracy claim, but the accounting must close
    assert sum(
        int(result["confusion"][i].sum()) for i in range(9)
    ) == 27


def test_evaluate_empty_dir_raises(tmp_path, synth_weights) -> None:
    with pytest.raises(ValueError, match="layout"):
        evaluate(synth_weights, tmp_path)


def test_evaluate_yuv420_wire(synth_dataset, synth_weights) -> None:
    """--wire yuv420 certifies the headline transport end to end."""
    rgb = evaluate(synth_weights, synth_dataset, batch_size=8, wire="rgb")
    yuv = evaluate(synth_weights, synth_dataset, batch_size=8, wire="yuv420")
    assert yuv["wire"] == "yuv420"
    assert yuv["n"] == rgb["n"] == 27
    # same patches, near-identical confusion: the lossy wire may flip
    # borderline labels but the accounting must close either way
    assert yuv["confusion"].sum() == 27
    with pytest.raises(ValueError, match="wire"):
        evaluate(synth_weights, synth_dataset, wire="bgr")


def test_fetch_status_no_network(monkeypatch) -> None:
    """Failure provenance (VERDICT r4 item 7): offline reads no-network."""
    import validate_kather

    import tiatoolbox_tpu.utils.env_detection as env

    monkeypatch.setattr(env, "has_network", lambda timeout=5.0: False)
    result, status = validate_kather.fetch_and_evaluate_with_status()
    assert result is None
    assert status == "no-network"


def test_fetch_status_weights_failed(monkeypatch) -> None:
    """Connected-but-broken fetch is distinguishable from offline."""
    import validate_kather

    import tiatoolbox_tpu.models.architecture as arch
    import tiatoolbox_tpu.utils.env_detection as env

    monkeypatch.setattr(env, "has_network", lambda timeout=5.0: True)

    def boom(name):
        msg = "simulated 403"
        raise RuntimeError(msg)

    monkeypatch.setattr(arch, "fetch_pretrained_weights", boom)
    result, status = validate_kather.fetch_and_evaluate_with_status()
    assert result is None
    assert status.startswith("weights-fetch-failed: RuntimeError")
    monkeypatch.setattr(arch, "fetch_pretrained_weights", lambda name: None)
    result, status = validate_kather.fetch_and_evaluate_with_status()
    assert result is None
    assert status == "weights-fetch-failed"
