"""Device-canvas vs host-canvas stitching equivalence.

The device path scatters fixed-shape probability patches into a padded
HBM canvas (edge patches overrun the slide boundary; the pad is cropped
on device before the fetch). It must agree with the host/NumPy merge on
slides whose dimensions are NOT multiples of the stride (clipped edge
cells) — the case that previously forced the host path.
"""

from __future__ import annotations

import numpy as np
import pytest

from tiatoolbox_tpu.data.synth import make_synthetic_slide
from tiatoolbox_tpu.models.architecture.unet import UNetModel
from tiatoolbox_tpu.models.engine.io_config import IOSegmentorConfig
from tiatoolbox_tpu.models.engine.semantic_segmentor import SemanticSegmentor


@pytest.fixture(scope="module")
def slide_path(tmp_path_factory):
    # 769x515: not a multiple of stride 96 nor patch 128 -> edge cells
    path = tmp_path_factory.mktemp("cvp") / "s.tiff"
    make_synthetic_slide(path, size=(769, 515), mpp=0.5, objective_power=20)
    return str(path)


@pytest.fixture(scope="module")
def setup(slide_path):
    model = UNetModel(num_input_channels=3, num_output_channels=2, encoder="unet")
    model.init(input_shape=(1, 128, 128, 3))
    # UNet's fused program emits probabilities at HALF the input
    # resolution (reference unet.py:421-469) — the reference-style
    # ioconfig declares that, making every output cell equal the model's
    # output patch (the device-canvas eligibility condition).
    ioconfig = IOSegmentorConfig(
        input_resolutions=[{"units": "mpp", "resolution": 0.5}],
        output_resolutions=[{"units": "mpp", "resolution": 1.0}],
        patch_input_shape=(128, 128),
        patch_output_shape=(128, 128),
        stride_shape=(96, 96),
        save_resolution={"units": "mpp", "resolution": 1.0},
    )
    return model, ioconfig


def _run(model, ioconfig, slide_path, *, force_host: bool, **kwargs):
    seg = SemanticSegmentor(model, batch_size=8, num_loader_workers=0,
                            verbose=False)
    if force_host:
        seg._can_use_device_canvas = lambda *a, **k: False
    out = seg.run(
        [slide_path], patch_mode=False, ioconfig=ioconfig,
        auto_get_mask=False, **kwargs,
    )
    return np.asarray(next(iter(out.values()))["probabilities"]), seg


class TestCanvasPaths:
    def test_device_canvas_engages_with_edge_cells(self, setup, slide_path) -> None:
        model, ioconfig = setup
        probs, seg = _run(model, ioconfig, slide_path, force_host=False)
        # the run must have taken the device path (uniform interior grid
        # + boundary-clipped edge cells are eligible now)
        dataloader = seg.get_dataloader(slide_path, patch_mode=False,
                                        ioconfig=ioconfig)
        dataset = dataloader.dataset
        canvas_wh = dataset.reader.slide_dimensions(1.0, "mpp")
        read_wh = np.array(
            dataset.reader.slide_dimensions(dataset.resolution, dataset.units),
            dtype=float,
        )
        scale = np.array(canvas_wh, dtype=float) / read_wh
        assert seg._can_use_device_canvas(dataset, canvas_wh, 2, scale)
        assert probs.shape == (canvas_wh[1], canvas_wh[0], 2)

    def test_device_matches_host_canvas(self, setup, slide_path) -> None:
        model, ioconfig = setup
        dev, _ = _run(model, ioconfig, slide_path, force_host=False)
        host, _ = _run(model, ioconfig, slide_path, force_host=True)
        assert dev.shape == host.shape
        assert np.abs(dev - host).max() < 1e-4

    def test_f16_wire_close_to_f32(self, setup, slide_path) -> None:
        model, ioconfig = setup
        f32, _ = _run(model, ioconfig, slide_path, force_host=False)
        f16, _ = _run(model, ioconfig, slide_path, force_host=False,
                      canvas_wire_dtype="float16")
        assert f16.dtype == np.float32
        assert np.abs(f32 - f16).max() < 2e-3
        assert np.abs(f32 - f16).max() > 0  # the cast actually happened

    def test_f16_wire_host_path(self, setup, slide_path) -> None:
        model, ioconfig = setup
        f32, _ = _run(model, ioconfig, slide_path, force_host=True)
        f16, _ = _run(model, ioconfig, slide_path, force_host=True,
                      canvas_wire_dtype="float16")
        assert np.abs(f32 - f16).max() < 2e-3


from tiatoolbox_tpu.models.models_abc import ModelABC


class _HalfResGradient(ModelABC):
    """Stub model: returns the input patch's grey content at half
    resolution — a deterministic 'segmentation' whose stitched canvas
    must reproduce the slide's grey content."""

    def __init__(self) -> None:
        super().__init__(module=None)
        self.variables = {}  # engine skips auto-init

    def stage_batch(self, batch):
        return batch

    @staticmethod
    def infer_batch(model, batch_data, device=None):  # noqa: ARG004
        import cv2

        arr = np.asarray(batch_data).astype(np.float32) / 255.0
        grey = arr.mean(-1)
        half = np.stack(
            [
                cv2.resize(
                    g, (g.shape[1] // 2, g.shape[0] // 2),
                    interpolation=cv2.INTER_AREA,
                )
                for g in grey
            ]
        )
        return half[..., None]

    @classmethod
    def infer_batch_device(cls, model, batch_data, device=None):
        return cls.infer_batch(model, batch_data, device)


class TestScaledOutputEdgeCells:
    def test_host_merge_resizes_then_crops_edges(self, tmp_path) -> None:
        """When the model's output scale differs from the canvas grid,
        boundary-clipped cells must be resized to the FULL cell size
        and then cropped — not squashed, not pasted at native scale.

        The outermost 2 px of each edge strip are excluded: the stub's
        half-res downsample blends real content with the padded read
        there (inherent to any half-res model at slide edges).
        """
        from tiatoolbox_tpu.models.engine.semantic_segmentor import (
            SemanticSegmentor,
        )
        from tiatoolbox_tpu.wsicore.wsireader import WSIReader

        # 800x520: 32px-wide right edge cells, 8px bottom edge cells
        slide_path = str(tmp_path / "edge.tiff")
        make_synthetic_slide(
            slide_path, size=(800, 520), mpp=0.5, objective_power=20
        )

        # output declared at INPUT resolution: cells are 128px while the
        # stub emits 64px patches -> the resize path runs everywhere.
        ioconfig = IOSegmentorConfig(
            input_resolutions=[{"units": "mpp", "resolution": 0.5}],
            output_resolutions=[{"units": "mpp", "resolution": 0.5}],
            patch_input_shape=(128, 128),
            patch_output_shape=(128, 128),
            stride_shape=(128, 128),
            save_resolution={"units": "mpp", "resolution": 0.5},
        )
        engine = SemanticSegmentor(
            _HalfResGradient(), batch_size=8, num_loader_workers=0,
            verbose=False,
        )
        engine._can_use_device_canvas = lambda *a, **k: False
        out = engine.run(
            [slide_path], patch_mode=False, ioconfig=ioconfig,
            auto_get_mask=False,
        )
        probs = np.asarray(next(iter(out.values()))["probabilities"])[..., 0]
        reader = WSIReader.open(slide_path)
        expected = (
            reader.read_bounds(
                (0, 0, 800, 520), resolution=0, units="level"
            ).astype(np.float32)
            / 255.0
        ).mean(-1)
        assert probs.shape == expected.shape
        # interior AND the clipped right/bottom edge strips agree
        assert np.abs(probs[:512, :768] - expected[:512, :768]).mean() < 0.05
        assert np.abs(probs[:, 768:798] - expected[:, 768:798]).mean() < 0.08
        assert np.abs(probs[512:518, :] - expected[512:518, :]).mean() < 0.08
