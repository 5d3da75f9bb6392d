"""Tests for SemanticSegmentor, MultiTaskSegmentor, NucleusDetector."""

from __future__ import annotations

import numpy as np
import pytest

from tiatoolbox_tpu.data.synth import make_synthetic_slide
from tiatoolbox_tpu.models.architecture.unet import UNetModel
from tiatoolbox_tpu.models.engine.io_config import (
    IOInstanceSegmentorConfig,
    IOSegmentorConfig,
)
from tiatoolbox_tpu.models.engine.semantic_segmentor import SemanticSegmentor


@pytest.fixture(scope="module")
def slide_path(tmp_path_factory) -> str:
    path = tmp_path_factory.mktemp("seg") / "s.tiff"
    make_synthetic_slide(path, size=(1024, 768), mpp=0.5, objective_power=20)
    return str(path)


@pytest.fixture(scope="module")
def tiny_unet() -> UNetModel:
    model = UNetModel(
        num_input_channels=3,
        num_output_channels=2,
        encoder="unet",
        encoder_levels=[8, 16, 32],
    )
    model.init(input_shape=(1, 64, 64, 3))
    return model


@pytest.fixture(scope="module")
def seg_ioconfig() -> IOSegmentorConfig:
    return IOSegmentorConfig(
        input_resolutions=[{"units": "mpp", "resolution": 2.0}],
        output_resolutions=[{"units": "mpp", "resolution": 2.0}],
        patch_input_shape=(64, 64),
        patch_output_shape=(32, 32),
        stride_shape=(32, 32),
    )


class TestSemanticSegmentor:
    def test_wsi_canvas(self, tiny_unet, slide_path, seg_ioconfig) -> None:
        seg = SemanticSegmentor(tiny_unet, batch_size=8, num_loader_workers=2)
        out = seg.run(
            [slide_path],
            patch_mode=False,
            ioconfig=seg_ioconfig,
            auto_get_mask=False,
        )
        w = out[slide_path]
        probs = np.asarray(w["probabilities"])
        # 1024x768 at 2mpp (0.5 mpp base) → 256x192
        assert probs.shape == (192, 256, 2)
        assert w["predictions"].shape == (192, 256)
        total = probs.sum(-1)
        assert (np.abs(total - 1) < 1e-3).mean() == 1.0  # full coverage

    def test_zarr_output(self, tiny_unet, slide_path, seg_ioconfig, tmp_path) -> None:
        seg = SemanticSegmentor(tiny_unet, batch_size=8, num_loader_workers=0)
        out = seg.run(
            [slide_path],
            patch_mode=False,
            ioconfig=seg_ioconfig,
            output_type="zarr",
            save_dir=tmp_path / "o",
            auto_get_mask=False,
        )
        from tiatoolbox_tpu.utils.zarrlite import open_zarr

        group = open_zarr(next(iter(out.values())))
        assert np.asarray(group["predictions"]).shape == (192, 256)

    def test_annotationstore_output(
        self, tiny_unet, slide_path, seg_ioconfig, tmp_path
    ) -> None:
        seg = SemanticSegmentor(tiny_unet, batch_size=8, num_loader_workers=0)
        out = seg.run(
            [slide_path],
            patch_mode=False,
            ioconfig=seg_ioconfig,
            output_type="annotationstore",
            save_dir=tmp_path / "o",
            auto_get_mask=False,
        )
        from tiatoolbox_tpu.annotation.storage import SQLiteStore

        path = next(iter(out.values()))
        store = SQLiteStore(path)
        assert len(store) >= 0  # random weights may give empty/any contours


class TestNucleusDetector:
    def test_patch_mode_detection(self) -> None:
        from tiatoolbox_tpu.models.architecture.mapde import MapDe
        from tiatoolbox_tpu.models.engine.nucleus_detector import NucleusDetector

        model = MapDe(num_classes=1)
        model.init()
        det = NucleusDetector(model, batch_size=1, num_loader_workers=0)
        patches = np.random.randint(0, 255, (1, 252, 252, 3), np.uint8)
        out = det.run(patches, patch_mode=True)
        assert "detections" in out
        assert isinstance(out["detections"][0]["coordinates"], np.ndarray)

    def test_detect_peaks_synthetic(self) -> None:
        from tiatoolbox_tpu.models.architecture.mapde import MapDe
        from tiatoolbox_tpu.models.engine.nucleus_detector import NucleusDetector

        model = MapDe(num_classes=1, threshold_abs=0.5, min_distance=4)
        det = NucleusDetector.__new__(NucleusDetector)
        det.model = model
        prob_map = np.zeros((64, 64, 1), np.float32)
        prob_map[10, 10] = 1.0
        prob_map[40, 44] = 0.9
        result = det._detect(prob_map)
        assert len(result["coordinates"]) == 2
        assert result["coordinates"][0].tolist() == [10, 10]  # (x, y)

    def test_run_param_overrides_reach_detect(self) -> None:
        """min_distance / threshold_abs / threshold_rel run params take
        precedence over model attributes (CLI --min-distance etc.)."""
        from tiatoolbox_tpu.models.architecture.mapde import MapDe
        from tiatoolbox_tpu.models.engine.nucleus_detector import NucleusDetector

        model = MapDe(num_classes=1, threshold_abs=0.5, min_distance=4)
        model.init()
        det = NucleusDetector(model, batch_size=1, num_loader_workers=0)
        prob_map = np.zeros((64, 64, 1), np.float32)
        prob_map[10, 10] = 1.0
        prob_map[10, 16] = 0.6  # 6 px away, below the 0.7 abs override
        # defaults (model attrs): both peaks found (dist 6 >= 4, both > 0.5)
        base = det._detect(prob_map)
        assert len(base["coordinates"]) == 2
        det._update_run_params(min_distance=8, threshold_abs=0.7)
        tuned = det._detect(prob_map)
        assert len(tuned["coordinates"]) == 1
        det._update_run_params(min_distance=4, threshold_abs=0.1,
                               threshold_rel=0.8)
        rel = det._detect(prob_map)  # rel 0.8*1.0 suppresses the 0.6 peak
        assert len(rel["coordinates"]) == 1


class TestDeepFeatureExtractor:
    def test_features(self) -> None:
        from tiatoolbox_tpu.models.architecture.vanilla import CNNBackbone
        from tiatoolbox_tpu.models.engine.deep_feature_extractor import (
            DeepFeatureExtractor,
        )

        model = CNNBackbone("resnet18")
        model.init(input_shape=(1, 32, 32, 3))
        extractor = DeepFeatureExtractor(model, batch_size=4, num_loader_workers=0)
        patches = np.random.randint(0, 255, (4, 32, 32, 3), np.uint8)
        out = extractor.run(patches, patch_mode=True)
        assert out["features"].shape == (4, 512)


class TestRegistry:
    def test_all_entries_construct(self) -> None:
        from tiatoolbox_tpu import _get_pretrained_info
        from tiatoolbox_tpu.models.architecture import _locate_arch_class
        from tiatoolbox_tpu.models.engine import io_config as ioc

        info = _get_pretrained_info()
        assert len(info) >= 30
        for name, cfg in info.items():
            cls = _locate_arch_class(cfg["architecture"]["class"])
            model = cls(**cfg["architecture"].get("kwargs", {}))
            io_cls = getattr(ioc, cfg["ioconfig"]["class"].rsplit(".", 1)[-1])
            io_cfg = io_cls(**cfg["ioconfig"].get("kwargs", {}))
            assert model is not None, name
            assert io_cfg.patch_input_shape is not None, name


class TestMultiTaskTileMode:
    """Reference 4-pass tile postproc (grid/strips/cross) invariants."""

    @staticmethod
    def _blob_model():
        """Fake model whose postproc labels connected blobs."""
        from scipy import ndimage

        class BlobModel:
            @staticmethod
            def postproc_func(maps):
                binary = np.asarray(maps[0])[..., 0] > 0.5
                labelled, n = ndimage.label(binary)
                boxes, centroids, contours, probs, types = [], [], [], [], []
                for i in range(1, n + 1):
                    ys, xs = np.nonzero(labelled == i)
                    boxes.append([xs.min(), ys.min(), xs.max() + 1, ys.max() + 1])
                    centroids.append([xs.mean(), ys.mean()])
                    contours.append(
                        np.array([[xs.min(), ys.min()], [xs.max(), ys.max()]])
                    )
                    probs.append(1.0)
                    types.append(1)
                info = {
                    "box": np.array(boxes, dtype=object),
                    "centroid": np.array(centroids, dtype=object),
                    "contours": np.array(contours, dtype=object),
                    "prob": np.array(probs, dtype=object),
                    "type": np.array(types, dtype=object),
                }
                return (
                    {
                        "task_type": "nuclei",
                        "info_dict": info,
                        "seg_type": "instance",
                    },
                )

        return BlobModel()

    @staticmethod
    def _disk_map(w: int, h: int, seed: int = 0):  # noqa: ARG004
        """Binary map of small disks on a 40-px lattice + boundary blobs.

        Deterministic placements avoid the reference scheme's known
        measure-zero losses (nuclei whose extent ends exactly at a
        strip's outer pixel are disowned by both grid and strip passes
        in the reference too); boundary-straddling blobs at the 256-px
        tile lines and corners exercise the dedup passes.
        """
        import cv2

        img = np.zeros((h, w, 1), np.float32)
        for x in range(20, w - 6, 40):
            for y in range(20, h - 6, 40):
                cv2.circle(img[..., 0], (x, y), 4, 1.0, -1)
        # blobs straddling tile boundaries and the corner cross-section
        for x, y in [(256, 100), (512, 100), (256, 440), (100, 256), (600, 256),
                     (256, 256), (512, 256)]:
            cv2.circle(img[..., 0], (x, y), 4, 1.0, -1)
        return img

    def test_tile_mode_matches_full(self) -> None:
        from tiatoolbox_tpu.models.engine.multi_task_segmentor import (
            MultiTaskSegmentor,
        )

        seg = MultiTaskSegmentor.__new__(MultiTaskSegmentor)
        seg.model = self._blob_model()
        seg.tile_shape = (256, 256)
        seg.margin = 32
        w, h = 700, 520
        head_map = self._disk_map(w, h)

        full = seg._results_to_instance_dict(
            seg.model.postproc_func([head_map]), offset=(0, 0)
        )
        tiled, _ = seg._process_tile_mode([head_map], (w, h))

        assert len(tiled) == len(full)
        full_centroids = np.array(
            sorted(tuple(np.asarray(i["centroid"], float)) for i in full.values())
        )
        tiled_centroids = np.array(
            sorted(tuple(np.asarray(i["centroid"], float)) for i in tiled.values())
        )
        assert np.allclose(full_centroids, tiled_centroids, atol=1e-6)

    def test_tile_info_structure(self) -> None:
        from tiatoolbox_tpu.models.engine.multi_task_segmentor import (
            MultiTaskSegmentor,
        )

        seg = MultiTaskSegmentor.__new__(MultiTaskSegmentor)
        seg.tile_shape = (256, 256)
        seg.margin = 32
        sets = seg._get_tile_info((700, 520))
        assert len(sets) == 4
        grid_boxes, grid_flags = sets[0]
        # 3x2 grid (700x520 at 256 tiles → ceil grid plus boundary clamp)
        assert grid_boxes.shape[1] == 4
        # boundary sides never flagged for removal
        top_row = grid_boxes[:, 1] == 0
        assert not grid_flags[top_row, 0].any()
        left_col = grid_boxes[:, 0] == 0
        assert not grid_flags[left_col, 2].any()
        # vertical strips are 2*margin wide; horizontal 2*margin tall
        v_boxes, v_flags = sets[1]
        assert np.all(v_boxes[:, 2] - v_boxes[:, 0] == 64)
        assert np.all(v_flags[:, [2, 3]] == 0)
        h_boxes, h_flags = sets[2]
        assert np.all(h_boxes[:, 3] - h_boxes[:, 1] == 64)
        assert np.all(h_flags[:, [0, 1]] == 0)
        x_boxes, x_flags = sets[3]
        assert np.all(x_boxes[:, 2] - x_boxes[:, 0] == 128)
        assert np.all(x_flags == 1)
        # a tile fitting fully → single set, no removal
        small = seg._get_tile_info((100, 100))
        assert len(small) == 1
        assert not small[0][1].any()

    def test_small_image_single_tile(self) -> None:
        from tiatoolbox_tpu.models.engine.multi_task_segmentor import (
            MultiTaskSegmentor,
        )

        seg = MultiTaskSegmentor.__new__(MultiTaskSegmentor)
        seg.model = self._blob_model()
        seg.tile_shape = (1024, 1024)
        seg.margin = 32
        head_map = self._disk_map(300, 200, seed=3)
        full = seg._results_to_instance_dict(
            seg.model.postproc_func([head_map]), offset=(0, 0)
        )
        tiled, _ = seg._process_tile_mode([head_map], (300, 200))
        assert len(tiled) == len(full)


class TestPromptSegmentor:
    """PromptSegmentor orchestration with a stub SAM model."""

    class _StubSAM:
        def infer_batch(self, images, point_coords=None, box_coords=None):
            masks = []
            for i, img in enumerate(np.asarray(images)):
                h, w = img.shape[:2]
                mask = np.zeros((1, 3, h, w), bool)
                if point_coords is not None:
                    x, y = (int(v) for v in np.asarray(point_coords[i])[0])
                    mask[0, 0, max(y - 5, 0) : y + 5, max(x - 5, 0) : x + 5] = True
                if box_coords is not None:
                    x0, y0, x1, y1 = (int(v) for v in np.asarray(box_coords[i])[0])
                    mask[0, 1, y0:y1, x0:x1] = True
                masks.append(mask)
            return masks

    def test_run_saves_stores(self, tmp_path) -> None:
        from tiatoolbox_tpu.annotation.storage import SQLiteStore
        from tiatoolbox_tpu.models.engine.prompt_segmentor import PromptSegmentor

        seg = PromptSegmentor(model=self._StubSAM())
        images = [np.zeros((64, 64, 3), np.uint8)] * 2
        points = np.array([[[20, 20]], [[40, 40]]])
        paths = seg.run(images, point_coords=points, save_dir=tmp_path / "p")
        assert len(paths) == 2
        store = SQLiteStore(paths[0])
        anns = list(store.values())
        assert len(anns) == 1
        x0, y0, x1, y1 = anns[0].geometry.bounds
        assert 14 <= x0 <= 16 and 14 <= y0 <= 16  # around the point prompt

    def test_offset_and_scale(self, tmp_path) -> None:
        from tiatoolbox_tpu.annotation.storage import SQLiteStore
        from tiatoolbox_tpu.models.engine.prompt_segmentor import PromptSegmentor

        seg = PromptSegmentor(model=self._StubSAM())
        mpp, scale = seg.calc_mpp((3000, 1500), base_mpp=0.5)
        assert scale == 2.0 and mpp == 1.0
        seg.offset = np.array([100, 200])
        images = [np.zeros((64, 64, 3), np.uint8)]
        boxes = np.array([[[10, 10, 30, 30]]])
        paths = seg.run(images, box_coords=boxes, save_dir=tmp_path / "q")
        store = SQLiteStore(paths[0])
        x0, y0, _, _ = next(iter(store.values())).geometry.bounds
        # scaled by 2 then offset by (100, 200)
        assert x0 == 120 and y0 == 220

    def test_requires_prompts(self, tmp_path) -> None:
        import pytest

        from tiatoolbox_tpu.models.engine.prompt_segmentor import PromptSegmentor

        seg = PromptSegmentor(model=self._StubSAM())
        with pytest.raises(ValueError, match="point_coords or box_coords"):
            seg.run([np.zeros((8, 8, 3), np.uint8)], save_dir=tmp_path)


class TestMultiTaskPatchMode:
    """Multi-head (tuple-output) models through patch-mode run()."""

    @staticmethod
    def _two_head_model():
        import flax.linen as nn
        import jax.numpy as jnp

        from tiatoolbox_tpu.models.models_abc import ModelABC

        class TwoHead(nn.Module):
            @nn.compact
            def __call__(self, x):
                base = nn.Conv(4, (3, 3), padding="SAME")(x)
                return (
                    nn.Conv(1, (1, 1))(base),
                    nn.Conv(2, (1, 1))(base),
                )

        class TwoHeadModel(ModelABC):
            def __init__(self):
                super().__init__(TwoHead())

            @staticmethod
            def infer_batch(model, batch_data, device=None):
                out = model(jnp.asarray(batch_data, jnp.float32))
                return tuple(np.asarray(h) for h in out)

            @staticmethod
            def postproc(maps):
                binary = np.asarray(maps[0])[..., 0] > 0
                info = {
                    "box": np.array([[0, 0, 2, 2]], dtype=object),
                    "centroid": np.array([[1.0, 1.0]], dtype=object),
                    "contours": np.array(
                        [np.array([[0, 0], [2, 2]])], dtype=object
                    ),
                    "prob": np.array([1.0], dtype=object),
                    "type": np.array([1], dtype=object),
                }
                return (
                    {
                        "task_type": "t",
                        "info_dict": info if binary.any() else {},
                        "seg_type": "instance",
                    },
                )

        model = TwoHeadModel()
        model.init(input_shape=(1, 32, 32, 3))
        return model

    def test_patch_mode_multi_head(self) -> None:
        from tiatoolbox_tpu.models.engine.multi_task_segmentor import (
            MultiTaskSegmentor,
        )

        model = self._two_head_model()
        seg = MultiTaskSegmentor(model=model, batch_size=2, num_loader_workers=0,
                                 verbose=False)
        patches = np.random.default_rng(0).integers(
            0, 255, (3, 32, 32, 3), np.uint8
        )
        out = seg.run(patches, patch_mode=True)
        assert len(out["probabilities"]) == 2  # one array per head
        assert out["probabilities"][0].shape == (3, 32, 32, 1)
        assert out["probabilities"][1].shape == (3, 32, 32, 2)
        assert len(out["instances"]) == 3
        with pytest.raises(ValueError, match="dict"):
            seg.save_predictions(out, "annotationstore", save_dir="/tmp")


class TestDeviceCanvasEdgeCases:
    def test_partial_final_batch(self, tiny_unet, slide_path, seg_ioconfig) -> None:
        """Tail batches (n_valid < batch_size) scatter correctly."""
        seg = SemanticSegmentor(tiny_unet, batch_size=7, num_loader_workers=0)
        # 48 cells / 7 per batch -> final batch has 6 real + 1 padded
        out = seg.run(
            [slide_path], patch_mode=False, ioconfig=seg_ioconfig,
            auto_get_mask=False,
        )
        probs = np.asarray(out[slide_path]["probabilities"])
        assert probs.shape == (192, 256, 2)
        assert (np.abs(probs.sum(-1) - 1) < 1e-3).mean() == 1.0

    def test_patch_larger_than_canvas_falls_back(self, slide_path) -> None:
        """Output patches bigger than the canvas use the host stitcher."""
        model = UNetModel(
            num_input_channels=3, num_output_channels=2,
            encoder="unet", encoder_levels=[8, 16, 32],
        )
        model.init(input_shape=(1, 64, 64, 3))
        ioconfig = IOSegmentorConfig(
            input_resolutions=[{"units": "mpp", "resolution": 8.0}],
            output_resolutions=[{"units": "mpp", "resolution": 8.0}],
            patch_input_shape=(128, 128),
            patch_output_shape=(128, 128),
            stride_shape=(128, 128),
        )
        seg = SemanticSegmentor(model, batch_size=2, num_loader_workers=0)
        # slide at 8mpp = 64x48 -> single 128px patch covers (exceeds) it
        out = seg.run(
            [slide_path], patch_mode=False, ioconfig=ioconfig,
            auto_get_mask=False,
        )
        probs = np.asarray(out[slide_path]["probabilities"])
        assert probs.shape == (48, 64, 2)


class TestMultiTaskSemanticCanvas:
    """Semantic-task predictions assemble across tiles (HoVerNetPlus-style)."""

    def test_tile_mode_semantic_canvas(self, tmp_path) -> None:
        from tiatoolbox_tpu.models.engine.multi_task_segmentor import (
            MultiTaskSegmentor,
        )

        class LayerModel:
            @staticmethod
            def postproc_func(maps):
                m = np.asarray(maps[0])[..., 0]
                return (
                    {
                        "task_type": "layers",
                        "predictions": (m > 0.5).astype(np.uint8),
                        "info_dict": {},
                        "seg_type": "semantic",
                    },
                )

        seg = MultiTaskSegmentor.__new__(MultiTaskSegmentor)
        seg.model = LayerModel()
        seg.tile_shape = (128, 128)
        seg.margin = 16
        seg.cache_dir = tmp_path
        seg.memory_threshold = 0.5
        w, h = 300, 260
        head = np.zeros((h, w, 1), np.float32)
        head[40:220, 30:280] = 1.0
        instances, semantic = seg._process_tile_mode([head], (w, h))
        assert instances == {}
        canvas = np.asarray(semantic["layers"])
        assert canvas.shape == (h, w)
        assert np.array_equal(canvas, (head[..., 0] > 0.5).astype(np.uint8))
