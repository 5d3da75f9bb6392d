"""Multi-head device-canvas stitching vs host merge (MultiTaskSegmentor).

All HoVerNet heads share the output patch geometry, so the engine
stacks np+hv+tp into one HBM canvas scattered on device and fetched
once. These tests pin equivalence with the host merge using the
functional bench checkpoint (a real nucleus segmenter — see
scripts/make_bench_checkpoints.py).
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent / "scripts"))

from tiatoolbox_tpu.data.synth import make_synthetic_slide
from tiatoolbox_tpu.models.engine.multi_task_segmentor import MultiTaskSegmentor


@pytest.fixture(scope="module")
def slide_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("mhc") / "s.tiff"
    # not a multiple of the 164 stride -> edge cells overrun the canvas
    make_synthetic_slide(path, size=(700, 500), mpp=0.25, objective_power=40)
    return str(path)


@pytest.fixture(scope="module")
def hovernet():
    from make_bench_checkpoints import build_functional_hovernet_variables

    from tiatoolbox_tpu.models.architecture.hovernet import HoVerNet

    model = HoVerNet(num_types=6, mode="fast")
    model.load_weights(build_functional_hovernet_variables(model))
    return model


@pytest.fixture(scope="module")
def ioconfig():
    from tiatoolbox_tpu.models.engine.io_config import IOInstanceSegmentorConfig

    return IOInstanceSegmentorConfig(
        input_resolutions=[{"units": "mpp", "resolution": 0.25}],
        output_resolutions=[{"units": "mpp", "resolution": 0.25}],
        patch_input_shape=(256, 256),
        patch_output_shape=(164, 164),
        stride_shape=(164, 164),
        margin=64,
        tile_shape=(2048, 2048),
        save_resolution={"units": "mpp", "resolution": 0.25},
    )


def _run(model, ioconfig, slide_path, *, force_host: bool):
    seg = MultiTaskSegmentor(model, batch_size=4, num_loader_workers=0,
                             verbose=False)
    if force_host:
        seg._can_use_multihead_device_canvas = lambda *a, **k: False
    out = seg.run(
        [slide_path], patch_mode=False, ioconfig=ioconfig,
        auto_get_mask=False,
    )
    return next(iter(out.values())), seg


class TestMultiheadDeviceCanvas:
    def test_device_path_engages_and_matches_host(
        self, hovernet, ioconfig, slide_path
    ) -> None:
        dev_out, seg_dev = _run(hovernet, ioconfig, slide_path, force_host=False)
        assert seg_dev.last_stage_summary["path"].startswith(
            "multitask-device-canvas"
        )
        host_out, seg_host = _run(hovernet, ioconfig, slide_path, force_host=True)
        assert seg_host.last_stage_summary["path"] == "multitask-host-stitch"
        # identical instance segmentation from both stitch paths
        assert len(dev_out["instances"]) == len(host_out["instances"])
        dev_cents = sorted(
            tuple(np.round(np.asarray(v["centroid"], float), 2))
            for v in dev_out["instances"].values()
        )
        host_cents = sorted(
            tuple(np.round(np.asarray(v["centroid"], float), 2))
            for v in host_out["instances"].values()
        )
        assert dev_cents == host_cents

    def test_region_feed_engages_for_overlapping_grid(
        self, hovernet, slide_path
    ) -> None:
        """stride < patch -> bands + on-device patchify engage."""
        from tiatoolbox_tpu.models.engine.io_config import (
            IOInstanceSegmentorConfig,
        )

        ioconfig = IOInstanceSegmentorConfig(
            input_resolutions=[{"units": "mpp", "resolution": 0.25}],
            output_resolutions=[{"units": "mpp", "resolution": 0.25}],
            patch_input_shape=(256, 256),
            patch_output_shape=(164, 164),
            stride_shape=(128, 128),
            margin=64,
            tile_shape=(2048, 2048),
            save_resolution={"units": "mpp", "resolution": 0.25},
        )
        out, seg = _run(hovernet, ioconfig, slide_path, force_host=False)
        assert seg.last_stage_summary["path"].startswith(
            "multitask-device-canvas+region-feed"
        )
        assert len(out["instances"]) > 10
        for key in ("decode", "wire", "dispatch-wall", "fetch"):
            assert key in seg.last_stage_summary

    def test_device_energy_front_end_engages_and_matches_raw_hv(
        self, hovernet, ioconfig, slide_path
    ) -> None:
        """The HBM Sobel-energy transform (ops/hv_energy.py) yields the
        same instances as fetching raw hv + the host cv2 front-end."""
        out_energy, seg = _run(hovernet, ioconfig, slide_path, force_host=False)
        assert seg.last_stage_summary["path"].endswith("+device-energy")
        # disable BOTH device front-ends (full-canvas energy transform
        # and the banded narrow fetch): raw hv fetch + host front-end
        seg2 = MultiTaskSegmentor(hovernet, batch_size=4,
                                  num_loader_workers=0, verbose=False)
        hook = hovernet.transform_canvas_for_postproc
        hovernet.transform_canvas_for_postproc = lambda *a, **k: None
        hovernet.banded_fetch_spec = lambda *a, **k: None
        try:
            out_raw = seg2.run(
                [slide_path], patch_mode=False, ioconfig=ioconfig,
                auto_get_mask=False,
            )
        finally:
            hovernet.transform_canvas_for_postproc = hook
            del hovernet.banded_fetch_spec  # restore the class hook
        out_raw = next(iter(out_raw.values()))
        assert not seg2.last_stage_summary["path"].endswith("+device-energy")
        assert len(out_energy["instances"]) == len(out_raw["instances"])
        cents_a = sorted(
            tuple(np.round(np.asarray(v["centroid"], float), 2))
            for v in out_energy["instances"].values()
        )
        cents_b = sorted(
            tuple(np.round(np.asarray(v["centroid"], float), 2))
            for v in out_raw["instances"].values()
        )
        assert cents_a == cents_b

    def test_finds_synthetic_nuclei(self, hovernet, ioconfig, slide_path) -> None:
        out, _ = _run(hovernet, ioconfig, slide_path, force_host=False)
        # the slide generator drew ~tissue/600 nuclei; the functional
        # checkpoint should find a substantial number of them
        assert len(out["instances"]) > 30
        types = {v["type"] for v in out["instances"].values()}
        assert types <= {0, 1}


class TestBandedNarrowFetch:
    def test_banded_path_engages_and_matches_unbanded(
        self, hovernet, slide_path
    ) -> None:
        """The banded u8 drain (fg/tp thresholds computed on device per
        row-block while later bands scatter) must yield exactly the
        instances of the non-banded device-energy path."""
        from tiatoolbox_tpu.models.engine.io_config import (
            IOInstanceSegmentorConfig,
        )

        ioconfig = IOInstanceSegmentorConfig(
            input_resolutions=[{"units": "mpp", "resolution": 0.25}],
            output_resolutions=[{"units": "mpp", "resolution": 0.25}],
            patch_input_shape=(256, 256),
            patch_output_shape=(164, 164),
            stride_shape=(128, 128),
            margin=64,
            tile_shape=(2048, 2048),
            save_resolution={"units": "mpp", "resolution": 0.25},
        )
        banded, seg_b = _run(hovernet, ioconfig, slide_path, force_host=False)
        assert seg_b.last_stage_summary["path"].endswith(
            "+banded-u8+device-energy"
        )
        assert "fetch-banded" in seg_b.last_stage_summary
        hovernet.banded_fetch_spec = lambda *a, **k: None
        try:
            plain, seg_p = _run(
                hovernet, ioconfig, slide_path, force_host=False
            )
        finally:
            del hovernet.banded_fetch_spec
        assert seg_p.last_stage_summary["path"].endswith("+device-energy")
        assert "banded" not in seg_p.last_stage_summary["path"]
        assert len(banded["instances"]) == len(plain["instances"])
        cents_a = sorted(
            tuple(np.round(np.asarray(v["centroid"], float), 2))
            for v in banded["instances"].values()
        )
        cents_b = sorted(
            tuple(np.round(np.asarray(v["centroid"], float), 2))
            for v in plain["instances"].values()
        )
        assert cents_a == cents_b
        types_a = sorted(
            int(v["type"]) for v in banded["instances"].values()
        )
        types_b = sorted(int(v["type"]) for v in plain["instances"].values())
        assert types_a == types_b
