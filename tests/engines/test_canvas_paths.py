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


class TestRegionFeed:
    """Region-once wire transfer (bands + on-device patchify)."""

    def test_band_plan_covers_grid_exactly(self) -> None:
        from tiatoolbox_tpu.ops.region import BandPlan
        from tiatoolbox_tpu.tools.patchextraction import PatchExtractor

        inputs = PatchExtractor.get_coordinates(
            image_shape=(769, 515), patch_input_shape=(128, 128),
            stride_shape=(96, 96),
        )
        plan = BandPlan.build(inputs, (128, 128), (96, 96),
                              max_band_bytes=2 * 1024 * 1024)
        assert plan is not None
        seen = np.concatenate([b.ds_indices for b in plan.bands])
        assert sorted(seen) == list(range(len(inputs)))
        # every local start maps back to the exact grid coordinate
        for band in plan.bands:
            for ds_idx, (ly, lx) in zip(band.ds_indices, band.starts_local):
                assert band.read_y + ly == inputs[ds_idx][1]
                assert band.read_x + lx == inputs[ds_idx][0]
            assert band.starts_local.min() >= 0
            assert band.starts_local[:, 0].max() + 128 <= band.band_h
            assert band.starts_local[:, 1].max() + 128 <= band.band_w
        # banding ships fewer pixels than the per-patch feed
        assert plan.wire_pixels < len(inputs) * 128 * 128

    def test_band_plan_rejects_non_overlapping_and_holey_grids(self) -> None:
        from tiatoolbox_tpu.ops.region import BandPlan
        from tiatoolbox_tpu.tools.patchextraction import PatchExtractor

        full = PatchExtractor.get_coordinates(
            image_shape=(512, 512), patch_input_shape=(128, 128),
            stride_shape=(128, 128),
        )
        assert BandPlan.build(full, (128, 128), (128, 128)) is None  # no overlap
        overlapped = PatchExtractor.get_coordinates(
            image_shape=(512, 512), patch_input_shape=(128, 128),
            stride_shape=(96, 96),
        )
        holey = overlapped[[0, 1, 3, 4, 5]]
        assert BandPlan.build(holey, (128, 128), (96, 96)) is None

    def test_band_plan_rejects_gappy_one_axis_overlap(self) -> None:
        """x-gaps + y-overlap: bands would ship the gap pixels too and
        exceed the per-patch wire bytes — build must return None."""
        from tiatoolbox_tpu.ops.region import BandPlan
        from tiatoolbox_tpu.tools.patchextraction import PatchExtractor

        grid = PatchExtractor.get_coordinates(
            image_shape=(1024, 1024), patch_input_shape=(128, 128),
            stride_shape=(256, 96),  # stride_w > patch_w, stride_h < patch_h
        )
        sizes = grid[:, 2:] - grid[:, :2]
        assert np.all(sizes == (128, 128))
        plan = BandPlan.build(grid, (128, 128), (256, 96))
        if plan is not None:  # only acceptable if it actually saves bytes
            assert plan.wire_pixels < len(grid) * 128 * 128

    def test_extract_patches_matches_numpy(self) -> None:
        from tiatoolbox_tpu.ops.region import extract_patches

        rng = np.random.default_rng(0)
        band = rng.integers(0, 255, (64, 96, 3), np.uint8)
        starts = np.array([[0, 0], [16, 32], [32, 64], [48, 0]], np.int32)
        got = np.asarray(extract_patches(band, starts, (16, 32)))
        for k, (y, x) in enumerate(starts):
            np.testing.assert_array_equal(got[k], band[y:y + 16, x:x + 32])

    def test_region_feed_matches_patch_feed(self, setup, slide_path) -> None:
        model, ioconfig = setup
        region, seg_r = _run(model, ioconfig, slide_path, force_host=False)
        assert seg_r.last_stage_summary["path"].startswith(
            "device-canvas+region-feed")
        patch, seg_p = _run(model, ioconfig, slide_path, force_host=False,
                            region_feed=False)
        assert seg_p.last_stage_summary["path"] == "device-canvas"
        assert region.shape == patch.shape
        assert np.abs(region - patch).max() < 1e-4
        # region feed ships fewer pixels than the per-patch feed
        assert (seg_r.last_stage_summary["wire_pixels"]
                < seg_p.last_stage_summary["wire_pixels"])
        for key in ("decode", "wire", "dispatch-wall", "fetch"):
            assert key in seg_r.last_stage_summary

    def test_yuv420_band_wire_close_to_rgb(self, setup, slide_path) -> None:
        """Packed band wire (1.5 B/px) must agree with raw RGB bands to
        within the chroma-subsample tolerance, on the same path."""
        model, ioconfig = setup
        rgb, seg_rgb = _run(model, ioconfig, slide_path, force_host=False)
        yuv, seg_yuv = _run(model, ioconfig, slide_path, force_host=False,
                            band_wire="yuv420")
        assert seg_yuv.last_stage_summary["path"].startswith(
            "device-canvas+region-feed")
        assert "pack" in seg_yuv.last_stage_summary  # the packed path ran
        assert "pack" not in seg_rgb.last_stage_summary
        # wire bytes halve: stage items count bytes on the link
        assert (seg_yuv.last_stage_summary["wire"]["items"]
                < 0.6 * seg_rgb.last_stage_summary["wire"]["items"])
        assert yuv.shape == rgb.shape
        delta = np.abs(yuv - rgb)
        assert delta.max() < 0.05  # probabilities; ≤2 LSB input error
        assert delta.max() > 0  # lossy wire actually engaged

    def test_masked_grid_falls_back_to_patch_feed(self, setup, slide_path) -> None:
        model, ioconfig = setup
        seg = SemanticSegmentor(model, batch_size=8, num_loader_workers=0,
                                verbose=False)
        mask = np.zeros((515, 769), np.uint8)
        mask[:256, :256] = 1
        out = seg.run(
            [slide_path], masks=[mask], patch_mode=False, ioconfig=ioconfig,
            auto_get_mask=False,
        )
        assert not seg.last_stage_summary["path"].startswith(
            "device-canvas+region-feed")
        assert np.asarray(next(iter(out.values()))["probabilities"]).ndim == 3
