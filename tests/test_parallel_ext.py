"""Extended parallel-plane coverage: staged iteration, uneven shards,
sub-meshes, dp engines beyond the classifier."""

from __future__ import annotations

import numpy as np
import pytest

from tiatoolbox_tpu.parallel import (
    BatchLoader,
    get_data_mesh,
    pad_to_multiple,
    shard_batch,
)


class _DS:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"image": np.full((4, 4, 3), i % 251, np.uint8), "idx": i}


class TestStagedIteration:
    def test_iter_staged_preserves_order_and_stages(self) -> None:
        loader = BatchLoader(_DS(20), batch_size=4, num_workers=0)
        staged_flags = []

        def stage(batch):
            staged_flags.append(batch[0, 0, 0, 0])
            return batch.astype(np.int32) + 1000

        batches = list(loader.iter_staged(stage, 2))
        assert len(batches) == 5
        for bi, b in enumerate(batches):
            # staged transform applied
            assert b["image"].dtype == np.int32
            assert b["image"][0, 0, 0, 0] == 1000 + bi * 4
        # every batch passed through the stage fn exactly once
        assert sorted(staged_flags) == [0, 4, 8, 12, 16]

    def test_iter_staged_single_thread(self) -> None:
        loader = BatchLoader(_DS(8), batch_size=4, num_workers=0)
        plain = [b["image"].copy() for b in loader]
        staged = [b["image"] for b in loader.iter_staged(lambda x: x, 1)]
        for a, b in zip(plain, staged):
            assert np.array_equal(a, b)

    def test_iter_staged_error_propagates(self) -> None:
        loader = BatchLoader(_DS(8), batch_size=4, num_workers=0)

        def bad(batch):
            msg = "stage failed"
            raise RuntimeError(msg)

        with pytest.raises(RuntimeError, match="stage failed"):
            list(loader.iter_staged(bad, 2))


class TestShardingEdgeCases:
    def test_uneven_batch_pads(self) -> None:
        mesh = get_data_mesh()
        batch = np.random.default_rng(1).random((10, 4)).astype(np.float32)
        padded, n_valid = pad_to_multiple(batch, mesh.size)
        sharded = shard_batch(padded, mesh)
        assert np.allclose(np.asarray(sharded)[:n_valid], batch)
        assert sharded.shape[0] == 16

    def test_submesh(self) -> None:
        mesh = get_data_mesh(4)
        assert mesh.size == 4
        batch = np.zeros((8, 3), np.float32)
        sharded = shard_batch(batch, mesh)
        assert {s.data.shape for s in sharded.addressable_shards} == {(2, 3)}

    def test_dp_yuv_wire(self) -> None:
        from tiatoolbox_tpu.models.architecture.vanilla import CNNModel

        model = CNNModel("resnet18", num_classes=3)
        model.init(input_shape=(1, 32, 32, 3))
        batch = np.random.default_rng(2).integers(
            0, 255, (16, 32, 32, 3), np.uint8
        )
        single = CNNModel.infer_batch(model, batch)
        model.enable_data_parallel()
        model.wire_format = "yuv420"
        staged = model.stage_batch(batch)
        assert staged.ndim == 3  # packed planes
        dp = CNNModel.infer_batch(model, staged)
        # yuv420 wire is lossy in chroma: close, not equal
        assert np.abs(np.asarray(dp)[: len(single)] - single).max() < 0.15


class TestMultiHost:
    """Single-process checks of the multi-host (DCN) plumbing; on one
    host every function must collapse to its local equivalent."""

    def test_initialize_noop_single_process(self) -> None:
        from tiatoolbox_tpu.parallel import initialize_multihost

        assert initialize_multihost() is False

    def test_hybrid_mesh_equals_local_mesh(self) -> None:
        from tiatoolbox_tpu.parallel import get_hybrid_data_mesh

        mesh = get_hybrid_data_mesh()
        assert mesh.axis_names == ("data",)
        assert mesh.size == get_data_mesh().size

    def test_shard_batch_multihost_single_process(self) -> None:
        from tiatoolbox_tpu.parallel import shard_batch_multihost

        batch = np.random.default_rng(3).random((16, 4)).astype(np.float32)
        arr = shard_batch_multihost(batch)
        assert np.allclose(np.asarray(arr), batch)
        shapes = {s.data.shape for s in arr.addressable_shards}
        assert shapes == {(16 // get_data_mesh().size, 4)}


class TestDataParallelSegmentor:
    def test_dp_semantic_segmentor(self, tmp_path) -> None:
        from tiatoolbox_tpu.data.synth import make_synthetic_slide
        from tiatoolbox_tpu.models.architecture.unet import UNetModel
        from tiatoolbox_tpu.models.engine.io_config import IOSegmentorConfig
        from tiatoolbox_tpu.models.engine.semantic_segmentor import (
            SemanticSegmentor,
        )

        slide = tmp_path / "s.tiff"
        make_synthetic_slide(slide, size=(512, 384), mpp=0.5)
        model = UNetModel(
            num_input_channels=3, num_output_channels=2, encoder="unet"
        )
        model.init(input_shape=(1, 128, 128, 3))
        ioconfig = IOSegmentorConfig(
            input_resolutions=[{"units": "mpp", "resolution": 0.5}],
            output_resolutions=[{"units": "mpp", "resolution": 1.0}],
            patch_input_shape=(128, 128),
            patch_output_shape=(128, 128),
            stride_shape=(128, 128),
            save_resolution={"units": "mpp", "resolution": 1.0},
        )
        seg = SemanticSegmentor(
            model, batch_size=8, num_loader_workers=0, verbose=False
        )
        base = seg.run(
            [str(slide)], patch_mode=False, ioconfig=ioconfig,
            auto_get_mask=False,
        )
        base_probs = np.asarray(next(iter(base.values()))["probabilities"])

        model.enable_data_parallel()
        seg_dp = SemanticSegmentor(
            model, batch_size=8, num_loader_workers=0, verbose=False
        )
        out = seg_dp.run(
            [str(slide)], patch_mode=False, ioconfig=ioconfig,
            auto_get_mask=False,
        )
        dp_probs = np.asarray(next(iter(out.values()))["probabilities"])
        assert dp_probs.shape == base_probs.shape
        assert np.abs(dp_probs - base_probs).max() < 1e-4

    def test_dp_multitask_segmentor(self, tmp_path) -> None:
        """MultiTaskSegmentor under data parallelism: identical
        instances to the single-device run (VERDICT r3 item 7)."""
        import sys
        from pathlib import Path as _Path

        sys.path.insert(
            0, str(_Path(__file__).resolve().parent.parent / "scripts")
        )
        from make_bench_checkpoints import build_functional_hovernet_variables

        from tiatoolbox_tpu.data.synth import make_synthetic_slide
        from tiatoolbox_tpu.models.architecture.hovernet import HoVerNet
        from tiatoolbox_tpu.models.engine.io_config import (
            IOInstanceSegmentorConfig,
        )
        from tiatoolbox_tpu.models.engine.multi_task_segmentor import (
            MultiTaskSegmentor,
        )

        slide = tmp_path / "s.tiff"
        make_synthetic_slide(slide, size=(600, 440), mpp=0.25,
                             objective_power=40)
        model = HoVerNet(num_types=6, mode="fast")
        model.load_weights(build_functional_hovernet_variables(model))
        ioconfig = IOInstanceSegmentorConfig(
            input_resolutions=[{"units": "mpp", "resolution": 0.25}],
            output_resolutions=[{"units": "mpp", "resolution": 0.25}],
            patch_input_shape=(256, 256),
            patch_output_shape=(164, 164),
            stride_shape=(164, 164),
            margin=64,
            tile_shape=(2048, 2048),
            save_resolution={"units": "mpp", "resolution": 0.25},
        )

        def centroids(result):
            return sorted(
                tuple(np.round(np.asarray(v["centroid"], float), 2))
                for v in result["instances"].values()
            )

        seg = MultiTaskSegmentor(model, batch_size=8, num_loader_workers=0,
                                 verbose=False)
        base = next(iter(seg.run(
            [str(slide)], patch_mode=False, ioconfig=ioconfig,
            auto_get_mask=False,
        ).values()))
        assert len(base["instances"]) > 5

        model.enable_data_parallel()
        try:
            seg_dp = MultiTaskSegmentor(
                model, batch_size=8, num_loader_workers=0, verbose=False
            )
            out = next(iter(seg_dp.run(
                [str(slide)], patch_mode=False, ioconfig=ioconfig,
                auto_get_mask=False,
            ).values()))
        finally:
            model.mesh = None  # restore single-device state
        assert len(out["instances"]) == len(base["instances"])
        assert centroids(out) == centroids(base)
