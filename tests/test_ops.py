"""Tests for device ops: color conversion, stain kernel, canvas."""

from __future__ import annotations

import numpy as np
import pytest


class TestColorConv:
    def test_rgb2od_matches_host(self) -> None:
        from tiatoolbox_tpu.ops.colorconv import od2rgb as od2rgb_j
        from tiatoolbox_tpu.ops.colorconv import rgb2od as rgb2od_j
        from tiatoolbox_tpu.utils.transforms import rgb2od

        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
        host = rgb2od(img.copy())
        dev = np.asarray(rgb2od_j(img))
        assert np.allclose(host, dev, atol=1e-5)
        back = np.asarray(od2rgb_j(dev))
        assert np.abs(back.astype(int) - img.astype(int)).max() <= 1


class TestStainOps:
    def test_jnp_vs_pallas_interpret(self) -> None:
        import jax

        from tiatoolbox_tpu.ops.stain import stain_transform

        rng = np.random.default_rng(1)
        tiles = rng.integers(0, 255, (2, 32, 32, 3), dtype=np.uint8)
        proj = rng.random((3, 2)).astype(np.float32)
        stains = rng.random((2, 3)).astype(np.float32)
        scale = np.array([1.1, 0.9], np.float32)
        out = np.asarray(
            stain_transform(
                jax.numpy.asarray(tiles),
                jax.numpy.asarray(proj),
                jax.numpy.asarray(stains),
                jax.numpy.asarray(scale),
            )
        )
        assert out.shape == tiles.shape
        assert out.dtype == np.uint8


class TestDeviceCanvas:
    def test_scatter_and_normalize(self) -> None:
        from tiatoolbox_tpu.ops.canvas import DeviceCanvas

        canvas = DeviceCanvas((64, 64), n_channels=2)
        patches = np.ones((3, 16, 16, 2), np.float32)
        patches[1] *= 3.0
        positions = np.array([[0, 0], [8, 8], [48, 48]])
        canvas.add(patches, positions)
        probs = np.asarray(canvas.normalized())
        # non-overlap region of patch 0
        assert np.allclose(probs[0:8, 0:8], 1.0)
        # overlap of patches 0 and 1 averages (1 + 3) / 2
        assert np.allclose(probs[8:16, 8:16], 2.0)
        # untouched region stays zero
        assert np.allclose(probs[32:40, 0:8], 0.0)

    def test_invalid_and_out_of_range(self) -> None:
        from tiatoolbox_tpu.ops.canvas import DeviceCanvas

        canvas = DeviceCanvas((32, 32), n_channels=1)
        patches = np.ones((2, 16, 16, 1), np.float32)
        positions = np.array([[0, 0], [30, 30]])  # second exceeds bounds
        canvas.add(patches, positions)
        count = np.asarray(canvas.count)
        assert count.max() == 1.0
        assert count[31, 31, 0] == 0.0  # out-of-range patch skipped

    def test_predictions(self) -> None:
        from tiatoolbox_tpu.ops.canvas import DeviceCanvas

        canvas = DeviceCanvas((8, 8), n_channels=3)
        patch = np.zeros((1, 8, 8, 3), np.float32)
        patch[..., 2] = 1.0
        canvas.add(patch, np.array([[0, 0]]))
        preds = np.asarray(canvas.predictions())
        assert np.all(preds == 2)


class TestEngineEquivalence:
    def test_patch_vs_wsi_mode(self, tmp_path) -> None:
        """WSI-mode probabilities equal patch-mode on the same patches."""
        from tiatoolbox_tpu.data.synth import make_synthetic_slide
        from tiatoolbox_tpu.models.architecture.vanilla import CNNModel
        from tiatoolbox_tpu.models.engine.io_config import IOPatchPredictorConfig
        from tiatoolbox_tpu.models.engine.patch_predictor import PatchPredictor
        from tiatoolbox_tpu.wsicore.wsireader import WSIReader

        slide = tmp_path / "s.tiff"
        make_synthetic_slide(slide, size=(512, 384), mpp=0.5)
        model = CNNModel("resnet18", num_classes=3)
        model.init(input_shape=(1, 64, 64, 3))
        ioconfig = IOPatchPredictorConfig(
            input_resolutions=[{"units": "mpp", "resolution": 0.5}],
            patch_input_shape=(64, 64),
        )
        predictor = PatchPredictor(model, batch_size=8, num_loader_workers=0)
        wsi_out = predictor.run(
            [str(slide)], patch_mode=False, ioconfig=ioconfig, auto_get_mask=False
        )[str(slide)]

        reader = WSIReader.open(slide)
        patches = np.stack(
            [
                reader.read_rect(
                    (int(c[0]), int(c[1])), (64, 64), resolution=0.5, units="mpp",
                    coord_space="resolution",
                )
                for c in wsi_out["coordinates"]
            ]
        )
        patch_out = predictor.run(patches, patch_mode=True)
        assert np.allclose(
            wsi_out["probabilities"], patch_out["probabilities"], atol=1e-5
        )

    def test_semantic_segmentor_zarr_spill(self, tmp_path, monkeypatch) -> None:
        """Force the zarr canvas path and check results match RAM path."""
        from tiatoolbox_tpu.data.synth import make_synthetic_slide
        from tiatoolbox_tpu.models.architecture.unet import UNetModel
        from tiatoolbox_tpu.models.engine.io_config import IOSegmentorConfig
        from tiatoolbox_tpu.models.engine.semantic_segmentor import SemanticSegmentor

        slide = tmp_path / "s.tiff"
        make_synthetic_slide(slide, size=(512, 384), mpp=0.5)
        model = UNetModel(
            num_input_channels=3, num_output_channels=2, encoder="unet",
            encoder_levels=[8, 16],
        )
        model.init(input_shape=(1, 32, 32, 3))
        ioconfig = IOSegmentorConfig(
            input_resolutions=[{"units": "mpp", "resolution": 2.0}],
            output_resolutions=[{"units": "mpp", "resolution": 2.0}],
            patch_input_shape=(32, 32),
            patch_output_shape=(16, 16),
            stride_shape=(16, 16),
        )

        def run(spill: bool):
            seg = SemanticSegmentor(model, batch_size=8, num_loader_workers=0)
            if spill:
                import tiatoolbox_tpu.utils.zarrlite as zarrlite

                # force the host/zarr canvas path (device canvas off)
                seg.DEVICE_CANVAS_MAX_PIXELS = 0
                monkeypatch.setattr(zarrlite, "free_ram_bytes", lambda: 1)
            out = seg.run(
                [str(slide)],
                patch_mode=False,
                ioconfig=ioconfig,
                output_type="zarr" if spill else "dict",
                save_dir=tmp_path / ("spill" if spill else "ram"),
                overwrite=True,
                auto_get_mask=False,
            )
            return out[str(slide)]

        ram_out = run(spill=False)
        spill_path = run(spill=True)
        monkeypatch.undo()
        from tiatoolbox_tpu.utils.zarrlite import open_zarr

        spill_group = open_zarr(spill_path)
        assert np.allclose(
            np.asarray(ram_out["probabilities"]),
            np.asarray(spill_group["probabilities"]),
            atol=1e-5,
        )


def test_native_watershed_matches_python() -> None:
    """C++ priority-flood watershed is bit-identical to the Python flood."""
    import os

    from tiatoolbox_tpu import native
    from tiatoolbox_tpu.models.architecture import hovernet

    rng = np.random.default_rng(3)
    img = rng.random((200, 200)).astype(np.float32)
    mask = np.zeros((200, 200), bool)
    markers = np.zeros((200, 200), np.int32)
    k = 0
    for _ in range(60):
        y, x = rng.integers(10, 190, 2)
        mask[y - 6 : y + 6, x - 6 : x + 6] = True
        k += 1
        markers[y, x] = k

    out_native = native.watershed(img, markers, mask)
    if out_native is None:
        import pytest

        pytest.skip("native toolchain unavailable")
    os.environ["TIATOOLBOX_TPU_NO_NATIVE"] = "1"
    try:
        import importlib

        importlib.reload(native)
        out_py = hovernet._watershed(img, markers, mask)
    finally:
        del os.environ["TIATOOLBOX_TPU_NO_NATIVE"]
        importlib.reload(native)
    assert np.array_equal(out_native, out_py)
    # labels only inside mask; every marker survives
    assert (out_native[~mask] == 0).all()
    assert set(np.unique(out_native)) == set(range(k + 1))
