"""Forward shape tests across the remaining architecture zoo."""

from __future__ import annotations

import numpy as np
import pytest


class TestHoVerNet:
    def test_fast_mode_shapes(self) -> None:
        from tiatoolbox_tpu.models.architecture.hovernet import HoVerNet

        model = HoVerNet(num_types=6, mode="fast")
        model.init()
        out = HoVerNet.infer_batch(model, np.zeros((1, 256, 256, 3), np.uint8))
        assert [o.shape for o in out] == [
            (1, 164, 164, 1),
            (1, 164, 164, 2),
            (1, 164, 164, 1),
        ]

    def test_proc_np_hv_separates_instances(self) -> None:
        from tiatoolbox_tpu.models.architecture.hovernet import HoVerNet

        np_map = np.zeros((96, 96, 1), np.float32)
        hv = np.zeros((96, 96, 2), np.float32)
        yy, xx = np.mgrid[0:96, 0:96]
        for cx, cy in [(25, 25), (70, 70)]:
            blob = (np.hypot(xx - cx, yy - cy) < 12)
            np_map[..., 0][blob] = 0.9
            hv[..., 0][blob] = ((xx - cx) / 12.0)[blob]
            hv[..., 1][blob] = ((yy - cy) / 12.0)[blob]
        inst = HoVerNet._proc_np_hv(np_map, hv)
        assert len(np.unique(inst)) - 1 == 2

    def test_instance_info_with_types(self) -> None:
        from tiatoolbox_tpu.models.architecture.hovernet import HoVerNet

        inst = np.zeros((64, 64), np.int32)
        inst[10:30, 10:30] = 1
        types = np.full((64, 64, 1), 2, np.uint8)
        info = HoVerNet.get_instance_info(inst, types, offset=(100, 200))
        assert info[1]["type"] == 2
        assert info[1]["box"][0] >= 100  # offset applied

    def test_invalid_mode(self) -> None:
        from tiatoolbox_tpu.models.architecture.hovernet import HoVerNet

        with pytest.raises(ValueError, match="mode"):
            HoVerNet(mode="bogus")


class TestDetectionModels:
    def test_sccnn_shapes(self) -> None:
        from tiatoolbox_tpu.models.architecture.sccnn import SCCNN

        model = SCCNN()
        model.init()
        out = SCCNN.infer_batch(
            model, SCCNN.preproc(np.zeros((2, 31, 31, 3), np.uint8))
        )
        assert out.shape == (2, 13, 13, 1)
        assert (out >= 0).all() and (out <= 1).all()

    def test_mapde_dist_filter(self) -> None:
        from tiatoolbox_tpu.models.architecture.mapde import _dist_filter_11

        filt = _dist_filter_11()
        assert filt.shape == (11, 11)
        assert filt[5, 5] == 1.0
        assert filt[5, 6] == pytest.approx(0.8)
        assert filt[0, 0] == 0.0

    def test_kongnet_heads(self) -> None:
        from tiatoolbox_tpu.models.architecture.kongnet import KongNet

        model = KongNet(
            num_heads=2,
            num_channels_per_head=[3, 3],
            target_channels=[1, 4],
            min_distance=5,
            threshold_abs=0.5,
            variant="efficientnet_b0",
        )
        model.init()
        out = KongNet.infer_batch(
            model, KongNet.preproc(np.zeros((64, 64, 3), np.uint8))[None]
        )
        assert out.shape == (1, 64, 64, 2)

    def test_kongnet_head_mismatch(self) -> None:
        from tiatoolbox_tpu.models.architecture.kongnet import KongNet

        with pytest.raises(ValueError, match="must match"):
            KongNet(3, [3, 3], [0], 5, 0.5)


class TestSegModels:
    def test_grandqc(self) -> None:
        from tiatoolbox_tpu.models.architecture.grandqc import GrandQCModel

        model = GrandQCModel()
        model.init()
        batch = GrandQCModel.preproc(np.zeros((64, 64, 3), np.uint8))[None]
        out = GrandQCModel.infer_batch(model, batch)
        assert out.shape == (1, 64, 64, 2)
        assert np.allclose(out.sum(-1), 1.0, atol=1e-4)
        assert GrandQCModel.postproc(out).shape == (1, 64, 64)

    def test_efficientunet(self) -> None:
        from tiatoolbox_tpu.models.architecture.efficientunet_tissue_mask_model import (
            EfficientUNetTissueMaskModel,
        )

        model = EfficientUNetTissueMaskModel()
        model.init()
        out = EfficientUNetTissueMaskModel.infer_batch(
            model, np.zeros((1, 64, 64, 3), np.float32)
        )
        assert out.shape == (1, 64, 64, 1)
        mask = model.postproc(out)
        assert mask.dtype == np.uint8

    def test_nuclick(self) -> None:
        from tiatoolbox_tpu.models.architecture.nuclick import NuClick

        model = NuClick(5, 1)
        model.init(input_shape=(1, 64, 64, 5))
        out = NuClick.infer_batch(model, np.zeros((1, 64, 64, 5), np.float32))
        assert out.shape == (1, 64, 64)
        masks = NuClick.postproc(out)
        assert masks.dtype == bool

    def test_hovernetplus_postproc(self) -> None:
        from tiatoolbox_tpu.models.architecture.hovernetplus import HoVerNetPlus

        ls_map = np.zeros((128, 128), np.float32)
        ls_map[20:120, 20:120] = 2
        cleaned = HoVerNetPlus._proc_ls(ls_map[None, ..., None])
        assert cleaned.shape == (128, 128)
        info = HoVerNetPlus._get_layer_info(cleaned)
        assert isinstance(info, dict)


class TestViT:
    def test_vit_cls_embedding(self) -> None:
        from tiatoolbox_tpu.models.architecture.vit import TimmBackbone

        model = TimmBackbone("H0-mini")
        model.init(input_shape=(1, 56, 56, 3))
        out = TimmBackbone.infer_batch(model, np.zeros((2, 56, 56, 3), np.uint8))
        assert out.shape == (2, 768)

    def test_unknown_backbone(self) -> None:
        from tiatoolbox_tpu.models.architecture.vit import TimmBackbone

        with pytest.raises(ValueError, match="not supported"):
            TimmBackbone("bogus")


class TestEfficientNet:
    def test_encoder_stages(self) -> None:
        import jax

        from tiatoolbox_tpu.models.architecture.efficientnet import (
            EfficientNetEncoder,
        )

        module = EfficientNetEncoder(variant="efficientnet_b0")
        variables = module.init(jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3)))
        feats = module.apply(variables, np.zeros((1, 64, 64, 3), np.float32))
        assert [f.shape[1] for f in feats] == [32, 16, 8, 4, 2]
        assert [f.shape[-1] for f in feats] == [32, 24, 40, 112, 320]
