"""Tests for mesh sharding, the batch loader, and dp engine runs."""

from __future__ import annotations

import numpy as np
import pytest

from tiatoolbox_tpu.parallel import (
    BatchLoader,
    get_data_mesh,
    pad_to_multiple,
    shard_batch,
)


class TestMesh:
    def test_mesh_over_8_virtual_devices(self) -> None:
        mesh = get_data_mesh()
        assert mesh.size == 8
        assert mesh.axis_names == ("data",)

    def test_pad_to_multiple(self) -> None:
        batch = np.arange(10)[:, None]
        padded, n_valid = pad_to_multiple(batch, 8)
        assert padded.shape[0] == 16
        assert n_valid == 10
        already, n = pad_to_multiple(np.zeros((8, 2)), 8)
        assert already.shape[0] == 8

    def test_shard_batch_layout(self) -> None:
        mesh = get_data_mesh()
        batch = np.random.default_rng(0).random((16, 4)).astype(np.float32)
        sharded = shard_batch(batch, mesh)
        assert np.allclose(np.asarray(sharded), batch)
        # axis 0 split over 8 devices → 2 rows per shard
        shard_shapes = {s.data.shape for s in sharded.addressable_shards}
        assert shard_shapes == {(2, 4)}


class TestBatchLoader:
    class _DS:
        def __init__(self, n):
            self.n = n

        def __len__(self):
            return self.n

        def __getitem__(self, i):
            return {"image": np.full((4, 4, 3), i, np.uint8), "idx": i}

    def test_fixed_shapes_and_tail_padding(self) -> None:
        loader = BatchLoader(self._DS(10), batch_size=4, num_workers=0)
        batches = list(loader)
        assert len(batches) == 3
        assert all(b["image"].shape == (4, 4, 4, 3) for b in batches)
        assert batches[-1]["n_valid"] == 2

    def test_threaded_matches_sync(self) -> None:
        sync = list(BatchLoader(self._DS(20), batch_size=8, num_workers=0))
        threaded = list(BatchLoader(self._DS(20), batch_size=8, num_workers=4))
        for a, b in zip(sync, threaded):
            assert np.array_equal(a["image"], b["image"])


class TestDataParallelEngine:
    def test_dp_forward_matches_single(self) -> None:
        import jax.numpy as jnp

        from tiatoolbox_tpu.models.architecture.vanilla import CNNModel

        model = CNNModel("resnet18", num_classes=4)
        model.init(input_shape=(1, 32, 32, 3))
        batch = np.random.default_rng(0).integers(
            0, 255, (16, 32, 32, 3), np.uint8
        )
        single = CNNModel.infer_batch(model, batch)
        model.enable_data_parallel()
        assert model.mesh is not None
        dp = CNNModel.infer_batch(model, batch)
        assert np.allclose(single, dp[: len(single)], atol=1e-5)

    def test_dp_wsi_run(self, tmp_path) -> None:
        from tiatoolbox_tpu.data.synth import make_synthetic_slide
        from tiatoolbox_tpu.models.architecture.vanilla import CNNModel
        from tiatoolbox_tpu.models.engine.io_config import IOPatchPredictorConfig
        from tiatoolbox_tpu.models.engine.patch_predictor import PatchPredictor

        slide = tmp_path / "s.tiff"
        make_synthetic_slide(slide, size=(512, 384), mpp=0.5)
        model = CNNModel("resnet18", num_classes=3)
        model.init(input_shape=(1, 32, 32, 3))
        model.enable_data_parallel()
        ioconfig = IOPatchPredictorConfig(
            input_resolutions=[{"units": "mpp", "resolution": 2.0}],
            patch_input_shape=(32, 32),
        )
        predictor = PatchPredictor(model, batch_size=8, num_loader_workers=0)
        out = predictor.run(
            [str(slide)], patch_mode=False, ioconfig=ioconfig, auto_get_mask=False
        )
        result = out[str(slide)]
        # 512x384 at 2mpp (0.5 base) → 128x96 → 4x3 grid
        assert result["probabilities"].shape == (12, 3)
